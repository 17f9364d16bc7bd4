"""Table profiling as Spark aggregates (SURVEY.md section 2.9).

The reference runs ydata-profiling's ``ProfileReport`` per table
(`finalprojectpandasprofiling.py:50`) -- an eager pandas pass that cannot
scale past driver memory. Here a profile is a handful of distributed
aggregate jobs; everything is a built-in function, so one profile pass at
100 TB is a few shuffles of O(columns x groups), never O(rows) to the
driver.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.aggregates import exact_avg

_NUMERIC_TYPES = (
    T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.DecimalType,
)


def numeric_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC_TYPES)]


def numeric_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Long-format numeric stats: one row per column with
    count / nulls / distinct / min / max / mean (decimal-exact mean, so the
    profile is reproducible across partitionings).

    ONE scan for all columns: every aggregate goes into a single agg()
    (a per-column agg + union would scan the table len(cols) times --
    the difference between 1 and 20 passes over 100 TB), then the single
    wide row is exploded to the long format."""
    cols = list(cols) if cols is not None else numeric_columns(df)
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__n_null"),
            F.countDistinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            exact_avg(c).alias(f"{c}__mean"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__n_null").alias("n_null"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
                F.col(f"{c}__mean").alias("mean_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("s")).select("s.*")


def frequent_values(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Top-k most frequent values of a column (deterministic tie-break)."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col(col).asc_nulls_last())
        .limit(k)
    )


def histogram(df: DataFrame, col: str, n_buckets: int = 20) -> DataFrame:
    """Equi-width histogram as a single aggregate pass (min/max first, then
    one groupBy on the bucket index)."""
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    if lo is None or hi is None or lo == hi:
        return df.groupBy(F.lit(0).alias("bucket")).agg(F.count(F.lit(1)).alias("n"))
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(n_buckets - 1),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


def profile_report(df: DataFrame, table_name: str, quantiles=(0.25, 0.5, 0.75)) -> dict:
    """Full profile dict for one table (the ProfileReport analog): row
    count, per-column stats, approximate quantiles, string cardinalities.
    Driver collects only the aggregate results (O(columns), never O(rows)).
    """
    num_cols = numeric_columns(df)
    out: dict = {
        "table": table_name,
        "n_rows": df.count(),
        "n_columns": len(df.columns),
        "columns": {},
    }
    if num_cols:
        stats = {r["column_name"]: r.asDict() for r in numeric_profile(df, num_cols).collect()}
        qs = df.stat.approxQuantile(num_cols, list(quantiles), 0.01)
        for c, q in zip(num_cols, qs):
            stats[c]["quantiles"] = dict(zip(map(str, quantiles), q))
            out["columns"][c] = stats[c]
    str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    if str_cols:
        aggs = []
        for c in str_cols:
            aggs += [
                F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            ]
        row = df.agg(*aggs).first().asDict()
        for c in str_cols:
            out["columns"][c] = {
                "n_distinct": row[f"{c}__distinct"],
                "n_null": row[f"{c}__nulls"],
            }
    return out


def write_profile_json(profile: dict, path: str) -> None:
    """Render the profile to a JSON report file (the HTML-report analog,
    DAG2:52-54; JSON keeps it machine-checkable)."""
    with open(path, "w") as f:
        json.dump(profile, f, indent=2, default=str)


def write_profile_html(profile: dict, path: str) -> None:
    """Render the profile dict to a standalone HTML report -- direct parity
    with the reference's per-table ProfileReport HTML files (DAG2:50-54,
    ``<table>_report.html``). Pure driver-side string rendering over the
    already-aggregated dict; no extra Spark work and no template deps."""
    import html as _html

    def esc(v) -> str:
        return _html.escape(f"{v:.6g}" if isinstance(v, float) else str(v))

    cols = profile.get("columns", {})
    stat_keys: list[str] = []
    for stats in cols.values():
        for k in stats:
            if k not in stat_keys and k not in ("column_name", "quantiles"):
                stat_keys.append(k)
    rows = []
    for name, stats in cols.items():
        cells = "".join(f"<td>{esc(stats.get(k, ''))}</td>" for k in stat_keys)
        q = stats.get("quantiles", {})
        qtxt = ", ".join(f"p{float(k) * 100:g}={esc(v)}" for k, v in q.items())
        rows.append(f"<tr><th>{esc(name)}</th>{cells}<td>{qtxt}</td></tr>")
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{esc(profile['table'])} profile</title>"
        "<style>body{font-family:sans-serif;margin:2em}"
        "table{border-collapse:collapse}td,th{border:1px solid #999;"
        "padding:4px 8px;text-align:right}th{text-align:left}</style></head>"
        f"<body><h1>{esc(profile['table'])}</h1>"
        f"<p>{esc(profile['n_rows'])} rows &times; "
        f"{esc(profile['n_columns'])} columns</p>"
        "<table><tr><th>column</th>"
        + "".join(f"<th>{esc(k)}</th>" for k in stat_keys)
        + "<th>quantiles</th></tr>"
        + "".join(rows)
        + "</table></body></html>"
    )
    with open(path, "w") as f:
        f.write(doc)
