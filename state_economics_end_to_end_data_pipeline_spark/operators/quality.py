"""Data-quality / constraint-validation operators (SURVEY.md section 2.7).

The reference's entire runtime test strategy is ``check_primary_key``
(`final project cleaning & upload dag 1.py:71-79`): raise if any key column
contains nulls or any key combination repeats. We reproduce those semantics
(including message shape) as distributed aggregates -- two short jobs, no
collect of data rows, scale-safe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """A3 -- key combinations that appear more than once, with their
    multiplicity (reference counts via ``df.duplicated(subset).sum()``,
    DAG1:74). Partial aggregation (map-side combine) keeps the shuffle
    proportional to the number of *distinct* keys, not rows.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def null_key_count(df: DataFrame, key_cols: Sequence[str]) -> int:
    """Rows where any key column is null (reference: ``isnull().sum()``,
    DAG1:72-75). Single aggregate job."""
    any_null = None
    for c in key_cols:
        cond = F.col(c).isNull()
        any_null = cond if any_null is None else (any_null | cond)
    row = df.filter(any_null).select(F.count(F.lit(1)).alias("n")).first()
    return int(row["n"])


def check_primary_key(df: DataFrame, key_cols: Sequence[str], table: str = "") -> None:
    """Q1 -- raise ``ValueError`` if ``key_cols`` is not a valid primary key
    (nulls or duplicates), mirroring reference behavior (DAG1:71-79)."""
    n_null = null_key_count(df, key_cols)
    if n_null:
        raise ValueError(
            f"Primary key violation in {table or '<df>'}: "
            f"{n_null} rows with null in key columns {list(key_cols)}"
        )
    n_dup = duplicate_keys(df, key_cols).limit(1).count()
    if n_dup:
        raise ValueError(
            f"Primary key violation in {table or '<df>'}: "
            f"duplicate values for key columns {list(key_cols)}"
        )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity check: child rows whose foreign key has no
    parent (NULL FKs are not orphans -- SQL FK semantics). A left-anti
    equi-join, so at scale it is one hash join keyed on the FK; when the
    parent key set is dimension-sized Spark broadcasts it and the check
    is a single narrow pass over the child."""
    from pyspark.sql import functions as F

    return (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
    )
