"""Robust statistics / data-quality diagnostics.

Extends the reference's profiling surface (finalprojectpandasprofiling.py
:41-55 renders per-table stats for human review) with the operational
checks a pipeline runs automatically at scale: per-group outlier
detection, hot-key skew reporting (the thing that kills shuffles at
100 TB), and winsorized aggregates. Variance goes through decimal-exact
sufficient statistics (sum, sum-of-squares) so every number is
partition-order-independent and matches the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.readers import read_parquet_table as t
from . import register

# ------------------------------------------------------------- outliers


@register(
    "outlier_zscore_per_group",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag,
             COUNT(l_extendedprice) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                  AS HUGEINT) AS s1i,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000
                  AS HUGEINT) AS s2i
      FROM lineitem GROUP BY l_returnflag
    ),
    split AS (
      SELECT l_returnflag, n,
             (CAST(s1i // 16777216 AS DOUBLE) * CAST(16777216 AS DOUBLE)
              + CAST(s1i % 16777216 AS DOUBLE)) / CAST(100 AS DOUBLE) AS s1,
             (CAST(s2i // 16777216 AS DOUBLE) * CAST(16777216 AS DOUBLE)
              + CAST(s2i % 16777216 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS s2
      FROM stats
    ),
    bounds AS (
      SELECT l_returnflag, n, s1 / n AS mean,
             sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std
      FROM split
    )
    SELECT b.l_returnflag, b.n, b.mean, b.std,
           COUNT(CASE WHEN abs(l.l_extendedprice - b.mean) > 3 * b.std
                 THEN 1 END) AS n_outliers
    FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
    GROUP BY b.l_returnflag, b.n, b.mean, b.std
    """,
)
def outlier_zscore_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 3-sigma outlier count. Mean/std come from decimal-exact
    sufficient statistics (one aggregate pass), broadcast back onto the
    fact for the flagging pass -- two scans, zero fact-sized shuffles,
    and the output is O(groups) regardless of input size.

    The sums are carried as exact integers (cent / cent-squared grid) and
    converted to double via a hi/lo split at 2^24: a squared sum exceeds
    2^53, and a direct int128->double cast is correctly rounded on the
    JVM but double-rounded in some engines (observed 1-ulp divergence).
    Each split half converts exactly; the reconstruction is the same
    three correctly-rounded IEEE ops everywhere -- bit-identical inputs
    to the downstream mean/std arithmetic."""
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    # prices sit exactly on the cent grid: DECIMAL(18,2) is a lossless
    # lift, so the square and both sums are computed fully in decimal --
    # no double->decimal rounding anywhere (that rounding is
    # engine-dependent: Java shortest-repr vs exact binary expansion).
    xd = x.cast("decimal(18,2)")
    stats = li.groupBy("l_returnflag").agg(
        F.count("l_extendedprice").alias("n"),
        (F.sum(xd) * 100).cast("decimal(38,0)").alias("s1i"),
        (F.sum(xd * xd) * 10000).cast("decimal(38,0)").alias("s2i"),
    )
    split = stats.selectExpr(
        "l_returnflag",
        "n",
        "(CAST(s1i div 16777216 AS DOUBLE) * CAST(16777216 AS DOUBLE)"
        " + CAST(s1i % 16777216 AS DOUBLE)) / CAST(100 AS DOUBLE) AS s1",
        "(CAST(s2i div 16777216 AS DOUBLE) * CAST(16777216 AS DOUBLE)"
        " + CAST(s2i % 16777216 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS s2",
    )
    bounds = split.select(
        "l_returnflag",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag", "n", "mean", "std")
        .agg(
            F.count(
                F.when(
                    F.abs(F.col("l_extendedprice") - F.col("mean"))
                    > 3 * F.col("std"),
                    F.lit(1),
                )
            ).alias("n_outliers")
        )
    )


# ------------------------------------------------------------ key skew


@register(
    "key_skew_report",
    oracle="""
    WITH counts AS (
      SELECT o_custkey, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    total AS (SELECT COUNT(*) AS n_total FROM orders)
    SELECT o_custkey, n_orders,
           CAST(n_orders AS DOUBLE) / n_total AS share
    FROM counts, total
    ORDER BY n_orders DESC, o_custkey ASC
    LIMIT 20
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnosis: top-20 join/shuffle keys by row count with
    share-of-total -- the report that decides whether a key needs
    salting or AQE skew-join before a run at full scale. Deterministic
    top-k (count desc, key asc tie-break) via TakeOrdered, no global
    sort; the total rides a one-row broadcast."""
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    total = o.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "o_custkey",
            "n_orders",
            (F.col("n_orders").cast("double") / F.col("n_total")).alias("share"),
        )
        .orderBy(F.desc("n_orders"), F.asc("o_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------- winsorizing


@register(
    "winsorized_mean_per_group",
    oracle="""
    WITH cuts AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.01) AS p01,
             quantile_cont(l_extendedprice, 0.99) AS p99
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(CASE WHEN l_extendedprice < p01 THEN 1 END) AS n_low,
           COUNT(CASE WHEN l_extendedprice > p99 THEN 1 END) AS n_high,
           CAST(SUM(CAST(
             CASE WHEN l_extendedprice < p01 THEN p01
                  WHEN l_extendedprice > p99 THEN p99
                  ELSE l_extendedprice END AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(l_extendedprice) AS winsorized_mean
    FROM lineitem l JOIN cuts c ON l.l_returnflag = c.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def winsorized_mean_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-PARITY VARIANT: winsorized mean with exact p01/p99 cuts.
    Exact percentile buffers all group values in executor memory -- the
    classic OOM at 100 TB -- so this entry exists only for the bit-exact
    cross-engine check. The production default is
    winsorized_mean_per_group_approx (sketch cuts, bounded memory),
    bounds-checked against this one both in its own oracle and in
    tests/test_robust_stats.py."""
    li = t(spark, sf_dir, "lineitem")
    cuts = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.01)).alias("p01"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("p99"),
    )
    x = F.col("l_extendedprice")
    clamped = (
        F.when(x < F.col("p01"), F.col("p01"))
        .when(x > F.col("p99"), F.col("p99"))
        .otherwise(x)
    )
    return (
        li.join(F.broadcast(cuts), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(x < F.col("p01"), F.lit(1))).alias("n_low"),
            F.count(F.when(x > F.col("p99"), F.lit(1))).alias("n_high"),
            (
                F.sum(clamped.cast("decimal(38,6)")).cast("double")
                / F.count("l_extendedprice")
            ).alias("winsorized_mean"),
        )
    )


@register(
    "winsorized_mean_per_group_approx",
    oracle="""
    SELECT l_returnflag, COUNT(l_extendedprice) AS n,
           TRUE AS wmean_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def winsorized_mean_per_group_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION winsorized mean: clamp tails at percentile_approx
    p01/p99 (Greenwald-Khanna sketch, bounded executor memory -- the
    shape that survives 100 TB, unlike the exact-percentile parity
    variant). Sketch cuts are engine-specific, so the cross-engine check
    is a BOUNDS check like sketch_distinct_approx: the query also runs
    the exact path and emits a boolean asserting the approx mean landed
    within 1% of it; the oracle states the group count and TRUE. (The
    exact branch exists only to judge the sketch -- production runs the
    approx branch alone.)"""
    li = t(spark, sf_dir, "lineitem")
    cuts = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.01), F.lit(10000)).alias("a01"),
        F.percentile_approx("l_extendedprice", F.lit(0.99), F.lit(10000)).alias("a99"),
        F.percentile("l_extendedprice", F.lit(0.01)).alias("p01"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("p99"),
    )
    x = F.col("l_extendedprice")

    def wmean(lo: str, hi: str):
        clamped = (
            F.when(x < F.col(lo), F.col(lo))
            .when(x > F.col(hi), F.col(hi))
            .otherwise(x)
        )
        return F.sum(clamped.cast("decimal(38,6)")).cast("double") / F.count(
            "l_extendedprice"
        )

    agg = (
        li.join(F.broadcast(cuts), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("l_extendedprice").alias("n"),
            wmean("a01", "a99").alias("approx_wmean"),
            wmean("p01", "p99").alias("exact_wmean"),
        )
    )
    return agg.select(
        "l_returnflag",
        "n",
        (
            F.abs(F.col("approx_wmean") - F.col("exact_wmean"))
            <= 0.01 * F.abs(F.col("exact_wmean"))
        ).alias("wmean_within_1pct"),
    )


@register(
    "mad_per_group",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS m
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag, m AS median_qty,
           quantile_cont(abs(l.l_quantity - m), 0.5) AS mad_qty
    FROM lineitem l JOIN med USING (l_returnflag)
    GROUP BY l.l_returnflag, m
    """,
)
def mad_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group -- the robust spread measure
    (insensitive to the outliers a std inflates on). Two percentile
    passes: the O(groups) medians broadcast back onto the fact for the
    deviation pass. ORACLE-PARITY exact percentiles; the production path
    at 100 TB swaps both for percentile_approx exactly as
    winsorized_mean_per_group_approx does."""
    li = t(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag", "median_qty")
        .agg(
            F.percentile(
                F.abs(F.col("l_quantity") - F.col("median_qty")), F.lit(0.5)
            ).alias("mad_qty")
        )
    )


@register(
    "mode_per_group",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_count
    FROM (
      SELECT l_returnflag, l_quantity, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_quantity ASC) AS rk
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ) WHERE rk = 1
    """,
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode per group: value-count aggregate then a
    row_number pick with an explicit value tie-break (the built-in
    mode() aggregate is tie-nondeterministic -- never publish it). Two
    shuffles, both O(distinct values), map-side combined."""
    li = t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
    )
