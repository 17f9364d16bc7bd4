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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Diff two snapshots of a table by primary key: one row per changed
    key with change_type in {inserted, deleted, updated}. Unchanged keys
    are dropped.

    The shape is ONE full-outer hash join on the PK -- the same physical
    cost as the SCD upserts -- so diffing two 100 TB snapshots shuffles
    each side once by key and nothing else; comparisons are null-safe
    (eqNullSafe), so a value moving to/from NULL counts as an update.
    This is the validation half of CDC: publish v(N), diff against
    v(N-1), and alarm when the change profile is wrong (e.g. deletes in
    an append-only table) before consumers read it."""
    from pyspark.sql import functions as F

    o = old.select(*keys, *compare_cols).alias("o")
    n = new.select(*keys, *compare_cols).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    differs = None
    for c in compare_cols:
        d = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(~in_old, F.lit("inserted"))
        .when(~in_new, F.lit("deleted"))
        .when(differs, F.lit("updated"))
    )
    return (
        joined.select(
            *[F.coalesce(f"o.{k}", f"n.{k}").alias(k) for k in keys],
            change.alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )
