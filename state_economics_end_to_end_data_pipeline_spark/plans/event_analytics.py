"""Event-analytics workloads over the `events` stream table (batch side).

The reference has no event data at all -- its closest surface is the
profiling DAG's per-table stats (finalprojectpandasprofiling.py:41-55).
These queries add the canonical product-analytics shapes every
large-scale event pipeline needs: cohort retention, strict ordered
funnels, and market-basket co-occurrence -- each expressed so the heavy
shuffles key on `user_id` / `l_orderkey` (the natural partitioning) and
each checked against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.readers import read_parquet_table as t
from . import register

# ------------------------------------------------------------------ cohorts


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(FLOOR(date_diff('day', cohort_day, CAST(ts AS DATE)) / 7)
                AS INT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen day, activity
    counted per week offset. The first-seen aggregate and the join back
    both hash on user_id -- one partitioning reused across stages; the
    cohort matrix output is O(days x weeks), never O(events). The cohort
    day is published as a yyyy-MM-dd string: Spark dates surface in
    pandas as object cells while DuckDB dates arrive as datetime64, and
    the harness hashes those differently even when equal."""
    e = t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    return (
        e.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cohort_day")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "week_offset",
            "active_users",
        )
    )


# ------------------------------------------------------------------ funnels


@register(
    "funnel_strict_order",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT 'step1_view' AS step, COUNT(*) AS users FROM v
    UNION ALL SELECT 'step2_click', COUNT(*) FROM c
    UNION ALL SELECT 'step3_purchase', COUNT(*) FROM p
    """,
)
def funnel_strict_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel (view -> click AFTER the first view ->
    purchase AFTER that click). Each step is a conditional-min aggregate
    joined back on user_id: three stages sharing one hash partitioning,
    no window over the full event stream, no per-user collect."""
    e = t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    count_of = lambda df, label: df.agg(  # noqa: E731
        F.lit(label).alias("step"), F.count(F.lit(1)).alias("users")
    )
    return (
        count_of(v, "step1_view")
        .unionByName(count_of(c, "step2_click"))
        .unionByName(count_of(p, "step3_purchase"))
    )


# ------------------------------------------------------------- market basket


# Pair fan-out per order is C(basket_size, 2): one 10k-part basket would
# emit 50M pairs from a single join key -- a skew bomb at 100 TB. Baskets
# larger than this cap are dropped BEFORE the self-join (standard market-
# basket practice: pathological baskets are crawler/bot noise, not signal).
MAX_BASKET_SIZE = 500


@register(
    "market_basket_pairs",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    capped AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS basket_n
        FROM basket
      ) WHERE basket_n <= {MAX_BASKET_SIZE}
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def market_basket_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_basket: int = MAX_BASKET_SIZE,
    min_orders: int = 3,
) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in >=3
    orders, with the basket-size cap ENFORCED in-plan.

    Single-pass shape, no self-join: one groupBy(l_orderkey) builds each
    order's sorted distinct-part array (collect_set partial-aggregates
    map-side, so the shuffle is O(distinct basket entries)); the size
    filter drops pathological baskets (> ``max_basket``) BEFORE any pair
    is produced; pairs are then generated inside the array (slice past
    each element -- the sorted order gives a<b for free) and exploded
    into the final count. Two shuffles total: orderkey grouping + pair
    counting. The earlier self-join formulation cost three (distinct,
    join, count) and put the skew bomb INTO a join key: one 10k-part
    basket = 50M rows from a single key. Here the bomb costs one 10k
    array in an aggregation buffer and is filtered before expansion --
    per-key fan-out is bounded at C(max_basket, 2) regardless of input
    skew. TPC-H baskets are <=7 lines, so the cap is invisible at test
    SFs (oracle applies the identical cap)."""
    baskets = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts").between(2, max_basket))
    )
    pair_structs = F.flatten(
        F.transform(
            "parts",
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + F.lit(2), F.size("parts")),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= min_orders)
    )


@register(
    "copurchase_triangles",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    capped AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS basket_n
        FROM basket
      ) WHERE basket_n <= {MAX_BASKET_SIZE}
    ),
    e AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM capped a JOIN capped b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    )
    SELECT ab.pa AS part_a, ab.pb AS part_b, bc.pb AS part_c
    FROM e ab
    JOIN e bc ON bc.pa = ab.pb
    JOIN e ac ON ac.pa = ab.pa AND ac.pb = bc.pb
    """,
)
def copurchase_triangles(
    spark: SparkSession, sf_dir: str, orientation: str = "degree"
) -> DataFrame:
    """Triangle enumeration in the co-purchase graph (edges = part pairs
    bought together in >= 2 orders): the canonical multi-way graph join,
    DEGREE-ORIENTED so wedge fan-out is bounded by arboricity.

    Each undirected edge is pointed lower-rank -> higher-rank where rank
    is the lexicographic pair (degree, id) -- a total order, so every
    triangle carries exactly one directed wedge (two out-edges from its
    lowest-rank vertex) and one closing directed edge. The wedge
    self-join keys on the wedge SOURCE, whose out-degree under this
    orientation is O(sqrt(edges)) regardless of how big a hub's total
    degree is (a hub's edges almost all point INTO it); per-key join
    work is out-degree^2, so a 100k-degree hub costs ~sqrt(m)^2 = O(m)
    total instead of 10^10 rows from one key under id orientation. Same
    two hash joins as the naive plan, one extra degree aggregation +
    broadcast-sized rank attach; output rows are identical (the triple
    is re-sorted by id to a<b<c, matching the oracle). ``orientation=
    "id"`` keeps the naive plan selectable for the skew probe
    (tools/scaleup_probe.py) to measure the difference.

    The basket-size cap upstream bounds edges per ORDER; orientation
    bounds wedges per PART -- the two independent skew axes."""
    e = market_basket_pairs(spark, sf_dir, min_orders=2).select(
        "part_a", "part_b"
    )
    if orientation == "id":
        ab = e.select(F.col("part_a").alias("a"), F.col("part_b").alias("b"))
        bc = e.select(F.col("part_a").alias("b2"), F.col("part_b").alias("c"))
        ac = e.select(F.col("part_a").alias("a2"), F.col("part_b").alias("c2"))
        return (
            ab.join(bc, F.col("b") == F.col("b2"))
            .join(ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
            .select(
                F.col("a").alias("part_a"),
                F.col("b").alias("part_b"),
                F.col("c").alias("part_c"),
            )
        )

    deg = (
        e.select(F.explode(F.array("part_a", "part_b")).alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ranked = (
        e.join(deg.select(F.col("p").alias("part_a"), F.col("deg").alias("deg_a")),
               "part_a")
        .join(deg.select(F.col("p").alias("part_b"), F.col("deg").alias("deg_b")),
              "part_b")
    )
    rank_a = F.struct(F.col("deg_a").alias("deg"), F.col("part_a").alias("id"))
    rank_b = F.struct(F.col("deg_b").alias("deg"), F.col("part_b").alias("id"))
    a_first = rank_a < rank_b  # total order: ids break degree ties
    directed = ranked.select(
        F.when(a_first, F.col("part_a")).otherwise(F.col("part_b")).alias("u"),
        F.when(a_first, F.col("part_b")).otherwise(F.col("part_a")).alias("v"),
        F.when(a_first, rank_b).otherwise(rank_a).alias("rank_v"),
    )
    lo = directed.select(
        F.col("u"), F.col("v").alias("w1"), F.col("rank_v").alias("rk1")
    )
    hi = directed.select(
        F.col("u"), F.col("v").alias("w2"), F.col("rank_v").alias("rk2")
    )
    wedges = lo.join(hi, "u").filter(F.col("rk1") < F.col("rk2"))
    closing = directed.select(
        F.col("u").alias("w1"), F.col("v").alias("w2")
    )
    tri = wedges.join(closing, ["w1", "w2"]).select(
        F.array_sort(F.array("u", "w1", "w2")).alias("t")
    )
    return tri.select(
        F.element_at("t", 1).alias("part_a"),
        F.element_at("t", 2).alias("part_b"),
        F.element_at("t", 3).alias("part_c"),
    )


# ------------------------------------------------------------- gap filling


@register(
    "timeseries_gapfill_ffill",
    oracle="""
    WITH bounds AS (
      SELECT min(date_trunc('hour', ts)) AS h0,
             max(date_trunc('hour', ts)) AS h1
      FROM events
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds, (SELECT DISTINCT event_type FROM events)
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
      FROM events WHERE value > 30 GROUP BY 1, 2
    )
    SELECT s.event_type,
           strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           h.total IS NULL AS was_gap,
           last_value(h.total IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_ffill
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hour = h.hour
    """,
)
def timeseries_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly calendar spine per series
    (sequence + explode -- generated distributed, never driver-side),
    left-joined to the hourly aggregate, missing hours forward-filled
    with last(ignorenulls). The spine is O(series x hours) and the fill
    window partitions by series -- no global sort, no driver loop."""
    e = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = (
        e.select("event_type").distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    hourly = (
        e.filter(F.col("value") > 30)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour"], "left_outer")
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("total").isNull().alias("was_gap"),
            F.last("total", ignorenulls=True).over(w).alias("total_ffill"),
        )
    )


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH keyed AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, value,
             (epoch_us(ts) - epoch_us(date_trunc('hour', ts)))
               * 2147483648 + event_id AS k
      FROM events
    )
    SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           arg_min(value, k) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, k) AS close,
           COUNT(*) AS n_events
    FROM keyed GROUP BY event_type, hour
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling per (event_type, hour) -- the hypertable-rollup
    / financial-bars pattern: open = value at the earliest event in the
    bucket, close = at the latest, plus high/low/count. One hash
    aggregation with min_by/max_by -- NO window, NO sort: at 100 TB a
    row_number-per-bucket formulation would shuffle and sort every
    event, while min_by keeps it a map-side-combinable agg, so each
    partition contributes one candidate per bucket and only bucket
    cardinality crosses the wire.

    Determinism: events can share a timestamp, so the selection key is
    (micros within the hour bucket) * 2^31 + event_id -- a single
    BIGINT (micros-in-hour < 2^32, times 2^31 stays under 2^63; needs
    event_id < 2^31, true by construction of the fixtures -- pmod the
    id at larger scales). A BIGINT key, not a padded string or a
    struct: a non-mutable buffer type (string/struct) silently demotes
    the whole aggregation to SortAggregate + per-partition sorts, while
    the BIGINT buffer keeps it a HashAggregate. Integer micros, not
    epoch-seconds-as-double: the fixtures carry sub-second timestamps,
    and a fractional-double key would truncate differently per engine.
    """
    ev = t(spark, sf_dir, "events")
    keyed = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
        (
            (F.unix_micros("ts") - F.unix_micros(F.date_trunc("hour", "ts")))
            * F.lit(2147483648).cast("long")
            + F.col("event_id")
        ).alias("k"),
    )
    return (
        keyed.groupBy("event_type", "hour")
        .agg(
            F.min_by("value", "k").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "k").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "open", "high", "low", "close", "n_events",
        )
    )


@register(
    "trend_slope_per_group",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             (epoch_us(ts) - 1704067200000000) // 1000000 AS x,
             CAST(round(value * 1000000) AS BIGINT) AS y
      FROM events
    ), sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           CAST(CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE) AS slope_uunits_per_s
    FROM sums
    """,
)
def trend_slope_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend: slope of value vs event
    time for each event_type, in micro-units per second. The single-pass
    sums formulation (n, Sx, Sy, Sxy, Sxx -> slope = (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2)) is ONE map-side-combinable aggregation -- the shape
    that replaces a per-group sort/window regression at 100 TB.

    Not Spark's regr_slope: that folds doubles in partition order, so
    the result is run-to-run nondeterministic under repartitioning.
    Here x is integer seconds since 2024-01-01 (integer `div`, exact in
    any engine) and y integer micro-units, all four sums in
    DECIMAL(38,0) -- exact, order-independent, overflow-safe by sizing
    (x ~ 1e8, x^2 sums ~ 1e20 x group size) -- with ONE double division
    at the end, bit-identical across engines."""
    ev = t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr("(unix_micros(ts) - 1704067200000000) div 1000000").alias("x"),
        F.round(F.col("value") * 1000000).cast("bigint").alias("y"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * d("y")).alias("sxy"),
        F.sum(d("x") * d("x")).alias("sxx"),
    )
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("slope_uunits_per_s"),
    )


# ------------------------------------------------------------------ EMA

_EMA_ALPHA = "CAST(0.25 AS DOUBLE)"
_EMA_KEEP = 16  # trailing events folded per user


@register(
    "ema_trailing_per_user",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    recent AS (SELECT * FROM ranked WHERE rn <= {_EMA_KEEP})
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_recent,
           list_reduce(list(value ORDER BY ts ASC, event_id ASC),
                       (acc, x) -> {_EMA_ALPHA} * x
                                   + (CAST(1 AS DOUBLE) - {_EMA_ALPHA}) * acc)
             AS ema
    FROM recent GROUP BY user_id
    """,
)
def ema_trailing_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponential moving average (alpha=0.25) of `value` per
    user over each user's 16 most-recent events -- the standard decayed
    signal (engagement score, spend velocity) behind freshness-weighted
    features.

    Scale shape: the recency filter (row_number <= 16 per user) runs
    BEFORE any list is built, so the aggregation buffer is bounded at 16
    rows per user no matter how long a user's history is -- at 100 TB the
    window sort shuffles on user_id (the natural key) and everything
    after is narrow. The fold is left-to-right over a deterministically
    ordered array ((ts, event_id) is unique), the same IEEE op sequence
    DuckDB's list_reduce runs (DETERMINISM.md rule 6) -- alpha 0.25/0.75
    are exactly representable, so results match bit-for-bit with no
    rounding. Spark's aggregate() needs an explicit init: element 1
    seeds the accumulator and the fold runs over elements 2..n,
    matching list_reduce's first-element seeding.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _EMA_KEEP)
    )
    per_user = recent.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_recent"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s.getField("value"),
        ).alias("vals"),
    )
    fold = (
        f"aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)), "
        f"element_at(vals, 1), "
        f"(acc, x) -> {_EMA_ALPHA} * x + (CAST(1 AS DOUBLE) - {_EMA_ALPHA}) * acc)"
    )
    return per_user.select("user_id", "n_recent", F.expr(fold).alias("ema"))


# --------------------------------------------------------- item-item cosine


@register(
    "item_item_cosine_topk",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    capped AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS basket_n
        FROM basket
      ) WHERE basket_n <= {MAX_BASKET_SIZE}
    ),
    pc AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM capped a JOIN capped b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS (
      SELECT part_a AS part, part_b AS other, n_ab FROM pc
      UNION ALL
      SELECT part_b AS part, part_a AS other, n_ab FROM pc
    ),
    deg AS (SELECT l_partkey AS part, COUNT(*) AS n FROM capped GROUP BY 1),
    scored AS (
      SELECT s.part, s.other, CAST(s.n_ab AS BIGINT) AS n_ab,
             CAST(s.n_ab AS DOUBLE)
               / sqrt(CAST(da.n AS DOUBLE) * CAST(db.n AS DOUBLE)) AS cosine
      FROM sym s
      JOIN deg da ON da.part = s.part
      JOIN deg db ON db.part = s.other
    )
    SELECT part, other, n_ab, cosine, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY part ORDER BY cosine DESC, other ASC) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def item_item_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-3 neighbors per part by
    co-occurrence cosine n_ab / sqrt(n_a * n_b) over order baskets --
    the classic "customers who bought X also bought Y" scorer, and the
    memory-based recsys baseline a training pipeline mines for
    retrieval-augmentation candidates.

    Scale shape: reuses market_basket_pairs' join-free capped in-array
    expansion for the co-occurrence counts (per-key fan-out bounded at
    C(cap,2)); part degrees are one narrow groupBy; the per-part top-3
    is a window over each part's neighbor list, which the >=2 support
    floor keeps orders of magnitude smaller than the raw pair space.
    Cross-engine exactness needs NO rounding: IEEE sqrt and division are
    correctly rounded in both engines, and n_ab * degrees stay under
    2^53 as doubles."""
    from pyspark.sql import Window

    baskets = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts").between(1, MAX_BASKET_SIZE))
    )
    pair_structs = F.flatten(
        F.transform(
            "parts",
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + F.lit(2), F.size("parts")),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pc = (
        baskets.filter(F.size("parts") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    sym = pc.select(
        F.col("part_a").alias("part"), F.col("part_b").alias("other"), "n_ab"
    ).unionByName(
        pc.select(
            F.col("part_b").alias("part"), F.col("part_a").alias("other"), "n_ab"
        )
    )
    deg = baskets.select(F.explode("parts").alias("part")).groupBy("part").agg(
        F.count(F.lit(1)).alias("n")
    )
    da = deg.select(F.col("part"), F.col("n").alias("n_part"))
    db = deg.select(F.col("part").alias("other"), F.col("n").alias("n_other"))
    scored = (
        sym.join(da, "part")
        .join(db, "other")
        .select(
            "part",
            "other",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            (
                F.col("n_ab").cast("double")
                / F.sqrt(F.col("n_part").cast("double") * F.col("n_other").cast("double"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("part").orderBy(F.col("cosine").desc(), F.col("other").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
    )


# -------------------------------------------------- graph/funnel analytics


@register(
    "clustering_coefficient_parts",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    capped AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS basket_n
        FROM basket
      ) WHERE basket_n <= {MAX_BASKET_SIZE}
    ),
    e AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM capped a JOIN capped b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    tri AS (
      SELECT ab.pa AS part_a, ab.pb AS part_b, bc.pb AS part_c
      FROM e ab
      JOIN e bc ON bc.pa = ab.pb
      JOIN e ac ON ac.pa = ab.pa AND ac.pb = bc.pb
    ),
    deg AS (
      SELECT p, COUNT(*) AS d FROM (
        SELECT pa AS p FROM e UNION ALL SELECT pb AS p FROM e
      ) GROUP BY p
    ),
    tv AS (
      SELECT p, COUNT(*) AS ntri FROM (
        SELECT part_a AS p FROM tri
        UNION ALL SELECT part_b AS p FROM tri
        UNION ALL SELECT part_c AS p FROM tri
      ) GROUP BY p
    )
    SELECT deg.p AS part, CAST(d AS BIGINT) AS degree,
           CAST(COALESCE(ntri, 0) AS BIGINT) AS n_triangles,
           CAST(2 * COALESCE(ntri, 0) AS DOUBLE)
             / CAST(d * (d - 1) AS DOUBLE) AS cc
    FROM deg LEFT JOIN tv ON tv.p = deg.p
    WHERE d >= 2
    """,
)
def clustering_coefficient_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per part: cc = 2T / (d(d-1)) over the
    co-purchase graph -- how tightly each product's neighborhood closes
    into cliques (bundle detection; also the homophily feature graph ML
    pipelines attach per node).

    Reuses the degree-oriented triangle enumeration (copurchase_triangles
    -- wedge fan-out bounded by arboricity) and the market-basket capped
    edge build; on top of those, this adds only two O(nodes) aggregates
    and a left join (nodes in no triangle keep cc = 0). The division is
    exact-int over double (DETERMINISM.md rule 19): no rounding."""
    e = market_basket_pairs(spark, sf_dir, min_orders=2).select("part_a", "part_b")
    deg = (
        e.select(F.explode(F.array("part_a", "part_b")).alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") >= 2)
    )
    tri = copurchase_triangles(spark, sf_dir)
    tv = (
        tri.select(F.explode(F.array("part_a", "part_b", "part_c")).alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("ntri"))
    )
    return deg.join(tv, "p", "left").select(
        F.col("p").alias("part"),
        F.col("d").cast("bigint").alias("degree"),
        F.coalesce(F.col("ntri"), F.lit(0)).cast("bigint").alias("n_triangles"),
        (
            (F.lit(2) * F.coalesce(F.col("ntri"), F.lit(0))).cast("double")
            / (F.col("d") * (F.col("d") - 1)).cast("double")
        ).alias("cc"),
    )


@register(
    "funnel_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS c_ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT user_id, epoch_us(p_ts) - epoch_us(c_ts) AS delta_us
      FROM firsts WHERE c_ts IS NOT NULL AND p_ts IS NOT NULL AND p_ts > c_ts
    ),
    ranked AS (
      SELECT delta_us,
             ROW_NUMBER() OVER (ORDER BY delta_us, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM conv
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN delta_us END) AS BIGINT)
             AS p50_us,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN delta_us END) AS BIGINT)
             AS p90_us
    FROM ranked
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, first click -> first
    purchase latency; reported as EXACT median and p90 order statistics
    (index = ceil(q*n), integer-computed, so both engines select the
    same row -- approx-percentile sketches would need a bounds oracle,
    rule 14).

    Scale shape: the funnel collapses to one conditional-MIN aggregate
    per user (shuffle on user_id, the natural key); the global order
    statistics run over the CONVERTED-USERS vector only, orders of
    magnitude smaller than the event stream. The single-partition window
    states the semantics; at 100 TB the same selection is a
    range-repartition + offset prefix counts, or approx-percentile with
    a rank-guarantee oracle (quantiles_grouped_approx shows that
    pattern)."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p_ts"),
    )
    conv = firsts.filter(
        F.col("c_ts").isNotNull()
        & F.col("p_ts").isNotNull()
        & (F.col("p_ts") > F.col("c_ts"))
    ).select(
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("delta_us"),
    )
    w = Window.orderBy("delta_us", "user_id")
    ranked = conv.select(
        "delta_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("delta_us")))
        .cast("bigint")
        .alias("p50_us"),
        F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("delta_us")))
        .cast("bigint")
        .alias("p90_us"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS r_date,
             COUNT(*) AS f,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             NTILE(5) OVER (ORDER BY r_date DESC, o_custkey) AS r_q,
             NTILE(5) OVER (ORDER BY f DESC, o_custkey) AS f_q,
             NTILE(5) OVER (ORDER BY m DESC, o_custkey) AS m_q
      FROM rfm
    )
    SELECT CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY 1
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary quintiles per
    customer (1 = best), combined into a 3-digit segment code and
    counted -- the classic marketing-analytics rollup, and a stand-in
    for any rank-then-bucket feature binning.

    NTILE is SQL-standard (first buckets absorb remainders) and
    deterministic here because every ORDER BY carries the customer key
    as a total-order tie-break -- without it, equal frequencies would
    make bucket assignment engine-dependent. Monetary sums ride
    DECIMAL (rule 1). The three global windows state the semantics; the
    CODED production twin is ``customer_rfm_segments_approx`` below
    (approx-percentile cutpoints broadcast as a narrow bucketing
    expression -- zero windows)."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("r_date"),
        F.count(F.lit(1)).alias("f"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m"),
    )
    scored = rfm.select(
        "o_custkey",
        F.ntile(5).over(Window.orderBy(F.col("r_date").desc(), "o_custkey")).alias("r_q"),
        F.ntile(5).over(Window.orderBy(F.col("f").desc(), "o_custkey")).alias("f_q"),
        F.ntile(5).over(Window.orderBy(F.col("m").desc(), "o_custkey")).alias("m_q"),
    )
    return scored.groupBy(
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("int")
        .alias("segment")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))


@register(
    "customer_rfm_segments_approx",
    oracle="""
    WITH rfm AS (SELECT o_custkey FROM orders GROUP BY o_custkey)
    SELECT 'f' AS dim, CAST(COUNT(*) AS BIGINT) AS n_customers,
           TRUE AS cuts_ok, TRUE AS segments_ok FROM rfm
    UNION ALL
    SELECT 'm', CAST(COUNT(*) AS BIGINT), TRUE, TRUE FROM rfm
    UNION ALL
    SELECT 'r', CAST(COUNT(*) AS BIGINT), TRUE, TRUE FROM rfm
    """,
)
def customer_rfm_segments_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION RFM segmentation -- the coded 100 TB twin that
    ``customer_rfm_segments``'s docstring promises: NO global NTILE
    windows (the exact entry moves the whole customer aggregate to one
    partition three times). Instead each dimension's quintile cutpoints
    come from ONE percentile_approx aggregate (GK sketch, bounded
    memory), broadcast back as a 1-row relation, and each customer is
    bucketed by a narrow CASE-style expression -- two passes over the
    O(customers) aggregate, zero windows, every shuffle partial-agg
    combinable.

    Semantics note: value-based quintiles cannot split ties (all
    customers with frequency 7 share a bucket), so per-bucket counts
    differ from NTILE's forced-equal buckets on tied data -- that is the
    production-correct behavior, and it is exactly what the GK sketch
    guarantees. The oracle therefore checks what IS guaranteed, in the
    quantiles_grouped_approx style: for every cutpoint q_p of every
    dimension, count(x < q_p)/n <= p + eps and count(x <= q_p)/n >=
    p - eps (tie-safe two-sided rank bound, eps = 0.005 + 1/n against
    the sketch's 1e-4), plus segment-level invariants (every customer
    segmented, all digits in 1..5) -- asserted as booleans the oracle
    pins TRUE."""
    o = t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.unix_micros(F.max("o_orderdate")).cast("double").alias("r"),
        F.count(F.lit(1)).cast("double").alias("f"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("m"),
    )
    ps = [0.2, 0.4, 0.6, 0.8]
    parr = F.array(*[F.lit(p) for p in ps])
    cuts = rfm.agg(
        *[
            F.percentile_approx(d, parr, F.lit(10000)).alias(f"{d}_cuts")
            for d in ("r", "f", "m")
        ]
    )

    def quintile(d: str):
        # bigger = better: top 20% by value -> bucket 1 (NTILE-DESC's 1)
        q = F.lit(5)
        for i in range(4):
            q = q - F.when(F.col(d) >= F.col(f"{d}_cuts")[i], 1).otherwise(0)
        return q.alias(f"{d}_q")

    scored = rfm.crossJoin(F.broadcast(cuts)).select(
        "r", "f", "m",
        *[F.col(f"{d}_cuts") for d in ("r", "f", "m")],
        quintile("r"), quintile("f"), quintile("m"),
    )
    seg = (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")).cast("int")
    checks = scored.withColumn("seg", seg).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("seg").alias("n_seg"),
        *[
            c
            for d in ("r", "f", "m")
            for i in range(4)
            for c in (
                F.count(F.when(F.col(d) < F.col(f"{d}_cuts")[i], 1)).alias(f"{d}_lt{i}"),
                F.count(F.when(F.col(d) <= F.col(f"{d}_cuts")[i], 1)).alias(f"{d}_le{i}"),
            )
        ],
        *[
            c
            for d in ("r", "f", "m")
            for c in (
                F.min(f"{d}_q").alias(f"{d}_qmin"),
                F.max(f"{d}_q").alias(f"{d}_qmax"),
            )
        ],
    )
    nd = F.col("n").cast("double")

    def cuts_ok(d: str):
        ok = F.lit(True)
        for i, p in enumerate(ps):
            eps = F.lit(0.005) + F.lit(1.0) / nd
            ok = (
                ok
                & (F.col(f"{d}_lt{i}") / nd <= F.lit(p) + eps)
                & (F.col(f"{d}_le{i}") / nd >= F.lit(p) - eps)
            )
        return ok.alias(f"{d}_ok")

    segments_ok = (
        (F.col("n_seg") == F.col("n"))
        & (F.least(*[F.col(f"{d}_qmin") for d in ("r", "f", "m")]) >= 1)
        & (F.greatest(*[F.col(f"{d}_qmax") for d in ("r", "f", "m")]) <= 5)
    )
    staged = checks.select(
        F.col("n").cast("bigint").alias("n_customers"),
        cuts_ok("r"), cuts_ok("f"), cuts_ok("m"),
        segments_ok.alias("segments_ok"),
    )
    return staged.select(
        F.expr("stack(3, 'r', r_ok, 'f', f_ok, 'm', m_ok) AS (dim, cuts_ok)"),
        "n_customers",
        "segments_ok",
    ).select("dim", "n_customers", "cuts_ok", "segments_ok")


@register(
    "events_dod_change",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(38,6))) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
           CAST(total AS DOUBLE) AS total_value,
           (CAST(total AS DOUBLE)
              - CAST(LAG(total) OVER w AS DOUBLE))
             / CAST(LAG(total) OVER w AS DOUBLE) * CAST(100 AS DOUBLE)
             AS pct_change
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def events_dod_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day percent change of total value per event type -- the
    reporting-layer growth metric (the fixture spans one month, so a
    daily grid is what exercises the lag). One O(type x day) aggregate
    (decimal-exact sums, rule 1) then a lag over the tiny daily grid;
    the ratio runs in the double domain with both operands cast from
    decimal first (rule 4), the same op sequence in both engines; dates
    publish as strings (rule 10). First day per type is NULL by
    definition."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("total"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    cur = F.col("total").cast("double")
    prev = F.lag("total").over(w).cast("double")
    return daily.select(
        "event_type",
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        cur.alias("total_value"),
        ((cur - prev) / prev * F.lit(100.0)).alias("pct_change"),
    )


@register(
    "orders_open_by_day",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey, o.o_orderdate AS start_day,
             MAX(l.l_shipdate) AS end_day
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT start_day AS day, 1 AS d FROM spans
      UNION ALL
      SELECT end_day + INTERVAL 1 DAY, -1 FROM spans
    ),
    daily AS (
      SELECT CAST(day AS DATE) AS day, SUM(d) AS delta FROM deltas GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(delta) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_open
    FROM daily
    """,
)
def orders_open_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval counting by SWEEP LINE: how many orders are
    open (placed, not yet fully shipped) on each day. The
    interval-stabbing shape behind concurrency dashboards, license-seat
    counting, and connection-pool audits.

    The scale trick: never join days x intervals (that is O(days *
    open)); emit +1 at each interval start and -1 after its end, collapse
    to one delta per day (shuffle O(distinct days)), and prefix-sum the
    tiny daily grid. All integer arithmetic -- engine-exact with no
    float anywhere. The global running sum states the semantics over the
    O(days) grid; the 100 TB variant range-partitions the timeline and
    offsets per-partition prefix sums by broadcast partition totals
    (same two-pass pattern as ks_drift_event_values)."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("end_day"))
    )
    deltas = spans.select(
        F.col("o_orderdate").alias("day"), F.lit(1).alias("d")
    ).unionByName(
        spans.select(F.date_add("end_day", 1).alias("day"), F.lit(-1).alias("d"))
    )
    daily = deltas.groupBy("day").agg(F.sum("d").alias("delta"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.sum("delta").over(w).cast("bigint").alias("n_open"),
    )


@register(
    "dau_new_vs_returning",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(day) AS first_day FROM act GROUP BY user_id
    )
    SELECT strftime(a.day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN a.day = f.first_day THEN 0 ELSE 1 END) AS BIGINT)
             AS n_returning
    FROM act a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY 1
    """,
)
def dau_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: daily active users split into new (first-ever
    active day) vs returning -- the first chart on any growth dashboard,
    and the acquisition/retention decomposition cohort_retention rolls
    up from.

    Two shuffles, both on user_id (the distinct day-activity collapse
    and the first-seen aggregate); the classifying join is
    user-partitioned too, so no re-shuffle -- then one O(days x 2)
    rollup. Pure integer counts, engine-exact."""
    ev = t(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    firsts = act.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        act.join(firsts, "user_id")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(F.col("day") == F.col("first_day"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_returning"),
        )
    )


@register(
    "timeseries_gapfill_linear",
    oracle="""
    WITH bounds AS (
      SELECT min(date_trunc('hour', ts)) AS h0,
             max(date_trunc('hour', ts)) AS h1
      FROM events
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds, (SELECT DISTINCT event_type FROM events)
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
      FROM events WHERE value > 30 GROUP BY 1, 2
    ),
    ctx AS (
      SELECT s.event_type, s.hour, h.total,
             last_value(h.total IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN h.total IS NOT NULL THEN s.hour END
                        IGNORE NULLS) OVER wb AS ph,
             first_value(h.total IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN h.total IS NOT NULL THEN s.hour END
                         IGNORE NULLS) OVER wf AS nh
      FROM spine s LEFT JOIN hourly h
        ON s.event_type = h.event_type AND s.hour = h.hour
      WINDOW wb AS (PARTITION BY s.event_type ORDER BY s.hour
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY s.event_type ORDER BY s.hour
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           total IS NULL AS was_gap,
           CASE WHEN total IS NOT NULL THEN total
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv)
                     * (CAST(epoch_us(hour) - epoch_us(ph) AS DOUBLE)
                        / CAST(epoch_us(nh) - epoch_us(ph) AS DOUBLE))
           END AS total_interp
    FROM ctx
    """,
)
def timeseries_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling by LINEAR INTERPOLATION -- the smooth
    sibling of timeseries_gapfill_ffill (step fill) for signals where a
    gap means 'sensor missed a reading', not 'value held': each missing
    hour gets pv + (nv - pv) * elapsed-fraction between its bracketing
    observations; leading/trailing edges degrade to nearest-value fill.

    Same scale shape as the ffill twin (distributed spine, per-series
    windows), plus a mirrored FORWARD window (first_value ignorenulls)
    for the right bracket. The fraction is exact-integer epoch
    arithmetic pushed through correctly-rounded double ops in the same
    sequence on both engines (rule 19) -- no rounding step needed."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = (
        e.select("event_type").distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
        )
    )
    hourly = (
        e.filter(F.col("value") > 30)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"))
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("total").isNotNull(), F.col("hour"))
    ctx = spine.join(hourly, ["event_type", "hour"], "left_outer").select(
        "event_type",
        "hour",
        "total",
        F.last("total", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(wb).alias("ph"),
        F.first("total", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_hour, ignorenulls=True).over(wf).alias("nh"),
    )
    frac = (
        (F.unix_micros("hour") - F.unix_micros("ph")).cast("double")
        / (F.unix_micros("nh") - F.unix_micros("ph")).cast("double")
    )
    interp = (
        F.when(F.col("total").isNotNull(), F.col("total"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return ctx.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("total").isNull().alias("was_gap"),
        interp.alias("total_interp"),
    )


@register(
    "markov_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS a,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
      FROM events
    ), pairs AS (
      SELECT a, b, COUNT(*) AS n_ab FROM seq WHERE b IS NOT NULL GROUP BY a, b
    ), totals AS (
      SELECT a, SUM(n_ab) AS n_a FROM pairs GROUP BY a
    )
    SELECT p.a, p.b, CAST(p.n_ab AS BIGINT) AS n_ab, CAST(t.n_a AS BIGINT) AS n_a,
           CAST(p.n_ab AS DOUBLE) / t.n_a AS prob
    FROM pairs p JOIN totals t USING (a)
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next=b | current=a) with exact integer counts and one
    int/int double division per cell -- the user-journey model behind
    funnel design and next-action prediction, and the sequence-level
    sibling of the token-level bigram LM (`bigram_logprob_quality`).
    Rows of the matrix sum to exactly 1 within one cell's ulp (pinned
    by the invariant test); counts are published so any smoothing can
    be applied downstream without re-scanning.

    Scale shape: ONE shuffle on user_id for the LEAD window (the same
    exchange the sessionize family rides; per-user partitions, no
    global window), then an O(types^2) aggregate and an O(types)
    broadcast join for row totals. At 100 TB the matrix relation is
    dimension-sized by construction.

    Reference parity: the reference has no sequence analytics at all
    (DAG2:1-82 stops at yearly ratios); see SURVEY.md section 2.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    pairs = seq.groupBy("a", "b").agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    totals = pairs.groupBy("a").agg(F.sum("n_ab").cast("bigint").alias("n_a"))
    return pairs.join(F.broadcast(totals), "a").select(
        "a",
        "b",
        "n_ab",
        "n_a",
        (F.col("n_ab").cast("double") / F.col("n_a")).alias("prob"),
    )


@register(
    "burstiness_interevent",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             date_diff('second', ts,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
      FROM events
    ), g AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(gap) AS BIGINT) AS s1,
             CAST(SUM(CAST(gap AS DECIMAL(38,0)) * gap) AS BIGINT) AS s2
      FROM seq WHERE gap IS NOT NULL GROUP BY user_id HAVING COUNT(*) >= 2
    )
    SELECT user_id, n_gaps, s1, s2,
           (sqrt(CAST(CAST(n_gaps AS DECIMAL(38,0)) * s2
                      - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)) - s1)
         / (sqrt(CAST(CAST(n_gaps AS DECIMAL(38,0)) * s2
                      - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)) + s1) AS burstiness
    FROM g
    """,
)
def burstiness_interevent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of each
    user's inter-event gaps: B -> -1 for metronome-regular (bot-like)
    activity, 0 for Poisson, -> 1 for bursty humans -- the
    gap-distribution companion to `user_behavior_entropy`'s event-mix
    signal. Gaps are integer seconds (date_diff truncation = Spark's
    unix_timestamp, the `kaplan_meier_sessions` lesson), and the
    variance numerator n*S2 - S1^2 is computed EXACTLY in decimal
    (Cauchy-Schwarz guarantees it is >= 0, so the sqrt can never see a
    rounding-negative -- the classic one-pass-variance failure mode is
    structurally impossible). B itself is sqrt/one add/one sub/one div
    over identical doubles in both engines.

    Scale shape: the LEAD rides the same single user_id exchange as the
    sessionize family; everything after is an O(users) aggregate. n*S2
    fits bigint for per-user horizons to ~decades of seconds; the
    decimal accumulation upstream is the overflow guard.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    g = (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum("gap").cast("bigint").alias("s1"),
            F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap"))
            .cast("bigint")
            .alias("s2"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    var_num = (
        F.col("n_gaps").cast("decimal(38,0)") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1")
    ).cast("double")
    return g.select(
        "user_id",
        "n_gaps",
        "s1",
        "s2",
        ((F.sqrt(var_num) - F.col("s1")) / (F.sqrt(var_num) + F.col("s1"))).alias(
            "burstiness"
        ),
    )


@register(
    "dedup_consecutive_events",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER w AS ptype,
             date_diff('second', LAG(ts) OVER w, ts) AS gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (
             WHERE ptype IS NOT DISTINCT FROM event_type
               AND COALESCE(gap <= 3600, FALSE)) AS BIGINT) AS n_dropped,
           CAST(COUNT(*) - COUNT(*) FILTER (
             WHERE ptype IS NOT DISTINCT FROM event_type
               AND COALESCE(gap <= 3600, FALSE)) AS BIGINT) AS n_kept
    FROM o GROUP BY user_id
    """,
)
def dedup_consecutive_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate suppression -- the telemetry/sensor cleaning
    primitive (at-least-once producers resend; UIs double-fire): an
    event is a duplicate iff the SAME user's immediately-previous event
    (ts order, event_id tie-break) has the same event_type within 3600
    seconds. Distinct from `dedup_subset_keep_latest` (global key dedup)
    and `stream_dedup_watermark` (stateful exact-id dedup): consecutive
    dedup is ORDER-dependent -- A,A,B,A keeps 3, global dedup keeps 2 --
    which is exactly what resend suppression wants. Reported per user:
    total, dropped, kept (kept = total - dropped by construction, both
    published so the oracle cross-checks the complement).

    Scale shape: ONE shuffle by user_id, then the lag window runs
    inside each user partition (bounded by per-user event counts, the
    sessionize_events_batch discipline) -- no global window, no second
    shuffle. Gaps are integer seconds (date_diff truncation =
    unix_timestamp subtraction, the kaplan_meier_sessions lesson).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        # null-safe equality: consecutive NULL-typed events are the same
        # type (oracle: IS NOT DISTINCT FROM); a first row (no lag) has
        # ts-lag NULL and its eqNullSafe(NULL-event-type) would be TRUE,
        # so the gap coalesce below is what keeps it
        F.col("event_type").eqNullSafe(F.lag("event_type").over(w)).alias("same_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap"),
    )
    is_dup = F.col("same_type") & F.coalesce(F.col("gap") <= 3600, F.lit(False))
    return o.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(is_dup.cast("bigint")).cast("bigint").alias("n_dropped"),
        F.sum((~is_dup).cast("bigint")).cast("bigint").alias("n_kept"),
    )


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT event_type,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000000 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_value_nano
    FROM events GROUP BY 1, 2
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregate MAINTENANCE, stated as an executable algebra
    proof: the engine splits events into a base batch (day <= 20) and a
    late-arriving delta (day > 20), aggregates EACH SEPARATELY, then
    merges the partials (full-outer on the group key, counts and
    nano-snapped sums coalesce-added) -- and the oracle is the direct
    aggregate over everything, so the driver's value-hash IS the
    mergeability check. This is the correctness core of every
    incremental pipeline at 100 TB: a late partition must be foldable
    into yesterday's aggregates without rescanning history, which holds
    exactly when the aggregate is a commutative monoid (count/sum here;
    the sketch entries extend it to distinct-count and quantiles).

    Scale shape: each partial is one hash aggregate over its slice (in
    production the base partial is ALREADY MATERIALIZED -- only the
    delta is scanned); the merge joins two O(groups) relations. Sums
    accumulate in exact integer nanos, so partial + merge is
    bit-identical to direct, not just approximately equal.
    """
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").cast("string").alias("day"),
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 1e9 + F.lit(0.5)).cast("bigint").alias("vn"),
    )

    def part_agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("vn").cast("bigint").alias("s"),
        )

    base = part_agg(ev.filter(F.col("dom") <= 20))
    delta = part_agg(ev.filter(F.col("dom") > 20))
    b = base.select("event_type", "day", F.col("n").alias("n_b"), F.col("s").alias("s_b"))
    d = delta.select("event_type", "day", F.col("n").alias("n_d"), F.col("s").alias("s_d"))
    return b.join(d, ["event_type", "day"], "full_outer").select(
        "event_type",
        "day",
        (F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0)))
        .cast("bigint")
        .alias("n_events"),
        (F.coalesce("s_b", F.lit(0)) + F.coalesce("s_d", F.lit(0)))
        .cast("bigint")
        .alias("sum_value_nano"),
    )


@register(
    "rolling_distinct_users_7d",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS users_7d
    FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day -- the DAU/WAU-style
    metric whose aggregate (COUNT DISTINCT) is NOT decomposable over a
    sliding window: no window function computes it, because distinct
    counts don't subtract when the window slides. The scalable form is
    exactly this plan: dedup facts to (day, user) ONCE -- O(days x
    users) instead of O(events) -- then range-join the tiny day grid
    (one row per calendar day, broadcast at any corpus size) and count
    distinct per grid day. Work is O(7 x |day-user pairs|) regardless
    of event volume; the alternative people reach for (exploding each
    event into 7 window-copies BEFORE the dedup) is 7x the fact scan.

    The `window_range_frame` entry covers value-RANGE frames where the
    aggregate IS decomposable (sum); this entry is the non-decomposable
    counterpart and the reason real metric stores precompute (day,user)
    activity relations.

    Plan note: the naive form (range-join the day grid on BETWEEN) is a
    BroadcastNestedLoopJoin -- O(pairs x calendar days), quadratic in
    the time span. This entry EXPLODES each (day, user) into its <= 7
    covering grid days instead (exactly-7 fan-out, constant), then
    equi-joins the real day grid (left semi, so empty calendar days
    vanish) and hash-aggregates -- O(7 x pairs) for any span.
    """
    ev = t(spark, sf_dir, "events")
    du = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    days = du.select("day").distinct().select(F.col("day").alias("grid_day"))
    covered = du.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "grid_day"
        ),
        "user_id",
    )
    return (
        covered.join(F.broadcast(days), "grid_day", "left_semi")
        .groupBy(F.col("grid_day").cast("string").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("users_7d"))
    )


_AUD_MIN_EVENTS = 15


@register(
    "bitmap_intersection_audiences",
    oracle=f"""
    WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'
               GROUP BY user_id HAVING COUNT(*) >= {_AUD_MIN_EVENTS}),
    p AS (SELECT user_id FROM events WHERE event_type = 'purchase'
          GROUP BY user_id HAVING COUNT(*) >= {_AUD_MIN_EVENTS})
    SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p))
                AS BIGINT) AS n_both
    """,
)
def bitmap_intersection_audiences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience overlap via word-partitioned bitmaps -- the
    roaring-bitmap-index primitive OLAP engines use for segment
    intersection, expressed in pure DataFrame ops: each audience
    (>= 15 clicks / >= 15 purchases) becomes per-word bitmaps
    (word = user div 62, bit = user mod 62, bitmap = BIT_OR(1 << bit);
    62 keeps every word clear of bigint sign trouble), the two bitmap
    relations equi-join on word index, and the intersection size is
    SUM(bit_count(a AND b)). Complements `kmv_intersection_estimate`
    (the sketched estimate of the same question) with the exact
    bitmap answer, and `dedup_bloom_prefilter` (lossy membership) with
    lossless set algebra.

    Scale shape: audience build is one groupBy-HAVING per side; the
    bitmap relation is O(user_space / 62) rows REGARDLESS of audience
    size -- the whole point of bitmap indexes: intersection cost is
    proportional to the id space, not to |A| x |B|; the word equi-join
    is skew-free by construction (uniform id-range partitioning).
    """
    ev = t(spark, sf_dir, "events")

    def audience_bitmaps(event_type: str) -> DataFrame:
        aud = (
            ev.filter(F.col("event_type") == event_type)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= _AUD_MIN_EVENTS)
        )
        return aud.select(
            F.expr("user_id div 62").alias("word"),
            # SQL shiftleft takes a column shift count (the DSL wrapper
            # requires a literal); 1L << (user_id % 62) stays positive
            F.expr("shiftleft(1L, cast(user_id % 62 AS int))").alias("bit"),
        ).groupBy("word").agg(F.bit_or("bit").alias("bm"))

    a = audience_bitmaps("click").select("word", F.col("bm").alias("bm_a"))
    b = audience_bitmaps("purchase").select("word", F.col("bm").alias("bm_b"))
    # outer coalesce: sum over an EMPTY join (both audiences empty) is
    # NULL in Spark while the oracle's COUNT subqueries return 0
    counts = a.join(b, "word", "full_outer").agg(
        F.coalesce(F.sum(F.bit_count(F.coalesce("bm_a", F.lit(0)))), F.lit(0))
        .cast("bigint")
        .alias("n_click"),
        F.coalesce(F.sum(F.bit_count(F.coalesce("bm_b", F.lit(0)))), F.lit(0))
        .cast("bigint")
        .alias("n_purchase"),
        F.coalesce(
            F.sum(
                F.bit_count(
                    F.coalesce("bm_a", F.lit(0)).bitwiseAND(
                        F.coalesce("bm_b", F.lit(0))
                    )
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_both"),
    )
    return counts


@register(
    "twap_user_value",
    oracle="""
    WITH o AS (
      SELECT user_id,
             CAST(FLOOR(value * 1000000000 + 0.5) AS BIGINT) AS vn,
             date_diff('second', ts, LEAD(ts) OVER w) AS gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(CAST(vn AS DECIMAL(38,0)) * gap) AS BIGINT)
             AS twap_num_nano_sec,
           CAST(SUM(gap) AS BIGINT) AS total_gap_sec,
           CAST(COUNT(*) FILTER (WHERE gap IS NOT NULL) AS BIGINT) AS n_intervals
    FROM o WHERE gap IS NOT NULL GROUP BY user_id
    HAVING SUM(gap) > 0
    """,
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP) -- the
    interval-weighted aggregate finance and metrics stores use when
    samples arrive irregularly: each observation holds until the next
    one, so its weight is the gap to the successor, not 1. Published as
    the EXACT decimal numerator (sum of nano-value x gap-seconds --
    a bigint product can exceed 2^63 over a long history, so the
    accumulation routes through decimal(38,0), the house overflow
    discipline) plus the integer denominator; the average is the
    reader's one division. Events with no successor carry no interval
    (standard TWAP convention). Distinct from `ema_trailing_per_user`
    (exponential decay, count-weighted) and `events_ohlc_hourly`
    (positional open/close): TWAP is duration-weighted.

    Scale shape: one shuffle by user_id, lead window inside each user
    partition, then a hash aggregate -- the sessionize discipline; gaps
    are integer seconds (unix_timestamp truncation = date_diff, the
    kaplan_meier lesson).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 1e9 + F.lit(0.5)).cast("bigint").alias("vn"),
        (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).alias("gap"),
    )
    return (
        o.filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            # accumulate in decimal (house overflow rule), PUBLISH as
            # bigint: per-user gaps partition the corpus time span, so
            # sum(vn*gap) <= max_vn * span_seconds -- 4.9e11 * 2.6e6
            # ~ 1.3e18 < 2^63 on this corpus; a multi-year 100 TB span
            # would publish the decimal instead (driver bridge maps
            # DECIMAL(38,0) to float64 on the DuckDB side, so bigint is
            # also the hash-stable choice)
            F.sum(F.col("vn").cast("decimal(38,0)") * F.col("gap"))
            .cast("bigint")
            .alias("twap_num_nano_sec"),
            F.sum("gap").cast("bigint").alias("total_gap_sec"),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        )
        # a user whose events all share one truncated second has
        # total_gap 0 -- TWAP is 0/0-undefined there; exclude, like the
        # singleton convention in target_encode_loo (oracle: HAVING)
        .filter(F.col("total_gap_sec") > 0)
    )


@register(
    "attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS) OVER w AS lt_ts,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS) OVER w AS lt_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), credited AS (
      SELECT CASE WHEN lt_ts IS NULL THEN 'direct'
                  WHEN lt_ts < ts - INTERVAL 7 DAY THEN 'direct'
                  ELSE lt_type END AS touch
      FROM seq WHERE event_type = 'purchase'
    ), agg AS (
      SELECT touch, COUNT(*) AS n_purchases FROM credited GROUP BY touch
    ), tot AS (SELECT SUM(n_purchases) AS n_tot FROM agg)
    SELECT touch, CAST(n_purchases AS BIGINT) AS n_purchases,
           CAST(n_purchases AS DOUBLE) / n_tot AS credit_share
    FROM agg CROSS JOIN tot
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase is credited to
    the user's most recent NON-purchase event within a 7-day lookback
    ('direct' when there is none) -- the baseline attribution model of
    marketing analytics, and the credit table downstream budget
    allocation reads. The two IGNORE-NULLS last_value calls (touch
    timestamp and touch type) share ONE frame over ONE user-ordered
    window, so they always describe the same touching row; recency is
    enforced with exact timestamp-interval arithmetic (no epoch-seconds
    truncation, which rounds differently across engines).

    Scale shape: one user_id window shuffle (the sessionize exchange),
    then an O(event-types) aggregate and a 1-row total broadcast --
    at 100 TB the window partitions by user (millions of small
    partitions, no global sort) and the credit relation is
    taxonomy-sized. Sibling of `markov_event_transitions` (which models
    ALL transitions; this entry scores only the converting ones).
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    non_purchase_ty = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    seq = ev.select(
        "event_type",
        "ts",
        F.last(non_purchase_ts, ignorenulls=True).over(w).alias("lt_ts"),
        F.last(non_purchase_ty, ignorenulls=True).over(w).alias("lt_type"),
    ).filter(F.col("event_type") == "purchase")
    credited = seq.select(
        F.when(F.col("lt_ts").isNull(), F.lit("direct"))
        .when(F.col("lt_ts") < F.col("ts") - F.expr("INTERVAL 7 DAY"), F.lit("direct"))
        .otherwise(F.col("lt_type"))
        .alias("touch")
    )
    agg = credited.groupBy("touch").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases")
    )
    tot = agg.agg(F.sum("n_purchases").alias("n_tot"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "touch",
        "n_purchases",
        (F.col("n_purchases").cast("double") / F.col("n_tot")).alias("credit_share"),
    )
