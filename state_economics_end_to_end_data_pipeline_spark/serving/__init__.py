from .http_api import DataServer
from .service import DataService

__all__ = ["DataServer", "DataService"]
