"""Reshape operators (SURVEY.md section 2.3).

R1 melt/unpivot -- the workhorse of the reference ETL: both the
unemployment sheet (9 year columns, DAG1:82) and the GDP table (24 year
columns, DAG1:96) are wide-by-year and get melted to long form.

R2 surrogate keys -- the reference uses ``reset_index()`` positional ids
(DAG1:135); positional identity does not exist in a distributed engine, so
we derive keys deterministically with ``row_number`` over an explicit
ordering (stable across runs and partitionings, unlike
``monotonically_increasing_id``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def unpivot_wide_years(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "Year",
    value_name: str = "value",
    var_type: str = "int",
) -> DataFrame:
    """R1 -- wide->long unpivot via the native ``DataFrame.unpivot``
    (Spark >= 3.4; Catalyst ``Expand`` node: one pass, no shuffle, scales
    linearly -- each input row fans out to ``len(value_cols)`` rows inside
    the same task).

    Values are unified to string before unpivoting (the raw year columns mix
    numeric and sentinel-string cells); cast downstream with
    ``lenient_double``. ``var_name`` (the former column label, e.g. '1997')
    is cast to ``var_type``.
    """
    stringly = df.select(
        *[F.col(c) for c in id_cols],
        *[F.col(c).cast("string").alias(c) for c in value_cols],
    )
    out = stringly.unpivot(list(id_cols), list(value_cols), var_name, value_name)
    if var_type:
        out = out.withColumn(var_name, F.col(var_name).cast(var_type))
    return out


def surrogate_key(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
    start: int = 0,
) -> DataFrame:
    """R2 -- deterministic dense surrogate key for the distinct
    combinations of ``key_cols`` (reference: ``reset_index()`` over the 8
    distinct school-expense-type combos, DAG1:135).

    Uses ``row_number`` over a single-partition window on the *deduplicated
    dimension*, which is safe because surrogate-keyed dimensions are by
    definition small (distinct combos), never the fact table. The fact side
    then joins back by broadcast. Returns the keyed dimension.
    """
    dim = df.select(*key_cols).dropDuplicates()
    w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in key_cols])
    return dim.withColumn(id_col, (F.row_number().over(w) - 1 + start).cast("int"))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Gaps-and-islands sessionization: adds a ``session_no`` column (1-based
    per key) where a new session starts whenever the gap since the previous
    event exceeds ``gap_seconds``. ``tiebreak_cols`` make the ordering total
    so the labeling is deterministic at any parallelism.

    One hash exchange on ``key_col`` serves the lag, the running sum, and
    any downstream per-session aggregate -- Spark reuses the partitioning,
    so this is a single shuffle regardless of input size (asserted in
    tests/test_plans.py)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull()
        | (F.unix_timestamp(ts_col) - F.unix_timestamp(prev) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_no",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
