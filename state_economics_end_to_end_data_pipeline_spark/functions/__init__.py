from .cleaning import (
    coalesce_first,
    currency_to_double,
    lenient_double,
    normalize_column_names,
    safe_div,
    strip_chars,
    zero_pad_fips,
)

__all__ = [
    "coalesce_first",
    "currency_to_double",
    "lenient_double",
    "normalize_column_names",
    "safe_div",
    "strip_chars",
    "zero_pad_fips",
]
