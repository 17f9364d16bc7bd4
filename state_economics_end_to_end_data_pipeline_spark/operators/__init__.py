from .reshape import surrogate_key, unpivot_wide_years
from .quality import check_primary_key, duplicate_keys

__all__ = [
    "check_primary_key",
    "duplicate_keys",
    "surrogate_key",
    "unpivot_wide_years",
]
