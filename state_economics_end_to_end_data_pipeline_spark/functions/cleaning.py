"""Scalar cleaning functions (SURVEY.md section 2.4, F1-F10).

Each mirrors a pandas idiom in the reference ETL
(`final project cleaning & upload dag 1.py`, cited per-function) but is
expressed as a built-in Spark SQL expression: JVM-side, codegen-friendly,
no Python UDFs anywhere. All functions take/return ``Column`` so they
compose inside ``select``/``withColumn`` and stay inside whole-stage
codegen at any scale.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def currency_to_double(c: Column | str) -> Column:
    """F1 -- parse `"$53,990"` -> 53990.0.

    Reference: strip ``$``/``,`` then ``pd.to_numeric`` (DAG1:88,103).
    Uncastable leftovers become null (same as ``errors='coerce'``).
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(c, r"[$,]", "").try_cast("double")


def lenient_double(c: Column | str) -> Column:
    """F2 -- lenient numeric cast: sentinels like ``(D)``/``(L)``/``(NA)``
    and blanks become null (DAG1:103,118). ``try_cast`` yields null for
    uncastable strings under ANSI mode (Spark 4 default), matching
    ``pd.to_numeric(errors='coerce')`` and DuckDB ``TRY_CAST``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return c.try_cast("double")


def strip_chars(c: Column | str, chars: str = '"*') -> Column:
    """F3/F4/F5 -- trim whitespace and strip literal characters (quote
    marks on GeoFIPS at DAG1:98, ``*`` markers on GeoName at DAG1:117).
    """
    c = F.col(c) if isinstance(c, str) else c
    if chars:
        c = F.regexp_replace(c, "[" + re.escape(chars) + "]", "")
    return F.trim(c)


def zero_pad_fips(c: Column | str, width: int = 5) -> Column:
    """F6 -- display form of a FIPS code, `1000 -> '01000'` (DAG1:39-40).

    Canonical storage is int (SURVEY.md section 1.3); this is presentation.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.lpad(c.cast("bigint").cast("string"), width, "0")


def coalesce_first(*cols: Column | str) -> Column:
    """F10 -- first non-null across columns (``GeoName.fillna(Name)`` after
    the full-outer location join, DAG1:113)."""
    return F.coalesce(*[F.col(c) if isinstance(c, str) else c for c in cols])


def safe_div(num: Column | str, den: Column | str) -> Column:
    """F8 -- division that yields null (not Inf/NaN) on zero/null
    denominator. The reference lets ``x / 0`` propagate ``inf`` (DAG1:153);
    we normalize to null (documented deviation, BASELINE.md note 3).
    """
    num = F.col(num) if isinstance(num, str) else num
    den = F.col(den) if isinstance(den, str) else den
    return F.when(den.isNull() | (den == 0), F.lit(None)).otherwise(num / den)


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P3 -- strip whitespace from names, replace ``' '`` and ``'.'`` with
    ``'_'`` (DAG1:83,97,132,152,247-248). Pure metadata op: free at any scale.
    """
    return df.toDF(*[re.sub(r"[ .]", "_", c.strip()) for c in df.columns])
