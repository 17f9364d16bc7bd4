from .economics import EconomicsETL

__all__ = ["EconomicsETL"]
