"""Streaming queries as oracle-checkable catalog entries.

Each entry executes an unbounded Structured Streaming plan over the
events table with ``trigger(availableNow=True)`` into a memory sink --
a finite, deterministic replay -- and the DuckDB oracle states the same
event-time semantics in batch SQL. This is the strongest correctness
check streaming allows: the streaming result must equal the batch result
on the same (now bounded) input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.events import (
    ohlc_bars,
    read_events_stream,
    run_available_now,
    session_windows,
    sliding_counts,
    stateful_user_totals,
    stream_dedup,
    tumbling_counts,
)
from . import register

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "stream_hourly_tumbling",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS hour,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation (1h event-time windows x
    event_type), replayed to completion: must equal the batch GROUP BY
    on the same input."""
    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(tumbling_counts(stream), output_mode="complete")
    return out.select(
        F.date_format("window.start", _TS_FMT_SPARK).alias("hour"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "stream_ohlc_hourly",
    oracle=f"""
    WITH keyed AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, value,
             (epoch_us(ts) - epoch_us(date_trunc('hour', ts)))
               * 2147483648 + event_id AS k
      FROM events
    )
    SELECT event_type, strftime(hour, '{_TS_FMT_DUCK}') AS hour,
           arg_min(value, k) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, k) AS close,
           COUNT(*) AS n_events
    FROM keyed GROUP BY event_type, hour
    """,
)
def stream_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC bars (1h event-time windows x event_type), replayed
    to completion: the stateful min_by/max_by window aggregation must
    equal the batch OHLC (``events_ohlc_hourly``) on the same input."""
    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(ohlc_bars(stream), output_mode="complete")
    return out.select(
        "event_type",
        F.date_format("window.start", _TS_FMT_SPARK).alias("hour"),
        "open", "high", "low", "close", "n_events",
    )


@register(
    "stream_session_windows",
    oracle=f"""
    WITH d AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, SUM(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM d
    )
    SELECT user_id,
           strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '{_TS_FMT_DUCK}') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sess
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user session windows (30 min gap): session_window
    state merging must reproduce the batch gaps-and-islands derivation
    (a session starts when the gap to the previous event is >= the gap;
    session end = last event + gap)."""
    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(session_windows(stream), output_mode="complete")
    return out.select(
        "user_id",
        F.date_format("session_window.start", _TS_FMT_SPARK).alias("session_start"),
        F.date_format("session_window.end", _TS_FMT_SPARK).alias("session_end"),
        "n_events",
        "total_value",
    )


@register(
    "stream_stateful_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): cumulative
    per-user totals. The last emission per user (max n_events) must equal
    the batch per-user aggregate. Money is summed as integer cents inside
    the state so the result is order-exact across engines."""
    stream = read_events_stream(spark, sf_dir).withColumn(
        "value", F.round(F.col("value") * 100).cast("bigint")
    )
    out = run_available_now(stateful_user_totals(stream), output_mode="update")
    # update mode re-emits a row per micro-batch; totals are cumulative,
    # so the final state per user is the row with the max event count.
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").cast("bigint").alias("total_cents"),
    )


def _has_protobuf() -> bool:
    """transformWithStateInPandas talks to the JVM state server over a
    protobuf protocol; the pyspark distribution does not vendor protobuf,
    so the API only works where the package is installed. Gate the
    catalog entry (this image lacks it) -- the operator itself lives in
    streaming/events.py::tws_user_peaks and registers wherever protobuf
    exists."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _stream_tws_user_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing via transformWithStateInPandas (the
    Spark 4 successor to applyInPandasWithState: typed ValueState handles,
    timers, state TTL). Cumulative per-user count + peak cents; the final
    emission per user must equal the batch aggregate. The API requires the
    RocksDB state store, so the provider is set for this query and
    restored after (production would set it session-wide -- RocksDB is
    also the provider you want at scale: state spills to disk instead of
    executor heap)."""
    from ..streaming.events import tws_user_peaks

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, sf_dir)
        out = run_available_now(tws_user_peaks(stream), output_mode="update")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    # update mode re-emits per micro-batch; count and peak are both
    # cumulative (non-decreasing), so the final state is the max of each.
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("peak_cents").alias("peak_cents"),
    )


if _has_protobuf():
    register(
        "stream_tws_user_peaks",
        oracle="""
        SELECT user_id, COUNT(*) AS n_events,
               CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS peak_cents
        FROM events GROUP BY user_id
        """,
    )(_stream_tws_user_peaks)


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark on event_id):
    distinct-event counts per type must match batch COUNT(DISTINCT)."""
    stream = read_events_stream(spark, sf_dir)
    deduped = run_available_now(
        stream_dedup(stream, ["event_id"]), output_mode="append"
    )
    return deduped.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_distinct")
    )


@register(
    "stream_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           COUNT(c.event_id) AS n_clicks_before,
           CAST(SUM(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT) AS total_lead_us
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
    GROUP BY 1, 2
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase <- preceding clicks within 30
    min per user), replayed to completion and rolled up; must equal the
    batch interval join. Join state is bounded by the watermark horizon."""
    from ..streaming.events import interval_join_clicks_to_purchases

    ev = read_events_stream(spark, sf_dir)
    joined = interval_join_clicks_to_purchases(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )
    out = run_available_now(joined, output_mode="append")
    return out.groupBy(
        F.col("purchase_id"), F.col("p_user").alias("user_id")
    ).agg(
        F.count("click_id").alias("n_clicks_before"),
        F.sum(F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("total_lead_us"),
    )


@register(
    "stream_interval_join_left_outer",
    oracle="""
    WITH wm AS (
      SELECT LEAST(
        (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
        (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
      ) - INTERVAL 30 MINUTE AS w
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT p.purchase_id, p.user_id, p.p_ts, c.click_id
      FROM p LEFT JOIN c
        ON c.c_user = p.user_id
       AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE AND c.c_ts < p.p_ts
    ),
    g AS (
      SELECT purchase_id, user_id, COUNT(click_id) AS n_clicks,
             MIN(p_ts) AS p_ts
      FROM j GROUP BY 1, 2
    )
    SELECT purchase_id, user_id, n_clicks
    FROM g CROSS JOIN wm
    WHERE n_clicks > 0 OR p_ts < w
    """,
)
def stream_interval_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join -- the hard emission case:
    matched (purchase, click) rows emit as they match, but an UNMATCHED
    purchase can only emit its null row once the watermark proves no
    matching click can still arrive, i.e. when the purchase's state is
    evicted. The replay pins that boundary exactly: the effective
    watermark is the MINIMUM across both watermarked inputs (measured:
    clicks end hours before purchases in the fixture, so the click-side
    max -- not the global max -- gates the flush), and purchases newer
    than min(max_click_ts, max_purchase_ts) - 30min are withheld in
    state at termination, exactly as they would be on a live stream.
    The oracle states that boundary in batch SQL: every matched
    purchase, plus unmatched purchases strictly below the final
    watermark.

    Replay determinism note: the single-file source makes all matches
    happen in one micro-batch, so the matched set cannot depend on
    batch boundaries; only the null-row flush depends on the (also
    deterministic) final watermark. State is bounded by the watermark
    horizon on both sides.

    Boundary assumption: the oracle uses STRICT p_ts < watermark. A
    purchase landing EXACTLY on the final watermark could be evicted or
    withheld depending on Spark's inclusivity at equality; no fixture
    row sits on that boundary, and
    tests/test_diagnostics_entries.py::test_stream_left_outer_join_flush_semantics
    asserts so, so a regenerated fixture fails loudly instead of
    diverging."""
    ev = read_events_stream(spark, sf_dir)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    j = p.join(
        c,
        F.expr(
            "c_user = p_user AND c_ts >= p_ts - INTERVAL 30 MINUTES "
            "AND c_ts < p_ts"
        ),
        "leftOuter",
    )
    out = run_available_now(j, output_mode="append")
    return out.groupBy(
        "purchase_id", F.col("p_user").alias("user_id")
    ).agg(F.count("click_id").alias("n_clicks"))


@register(
    "stream_foreach_batch_merge",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_foreach_batch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch incremental merge replayed to completion: per-user
    totals accumulated batch-by-batch into a versioned parquet target
    (exactly-once via the batch_id guard) must equal the one-shot batch
    aggregate. Decimal accumulation keeps the multi-batch sum exact."""
    import tempfile

    from ..streaming.events import (
        merge_stream_into_parquet,
        read_events_stream,
        read_merged_parquet,
        stream_checkpoint_dir,
    )

    d = tempfile.mkdtemp(prefix="fbmerge_")
    stream = read_events_stream(spark, sf_dir).select(
        "user_id",
        F.lit(1).alias("n_events"),
        F.col("value").cast("decimal(38,6)").alias("total_value"),
    )
    # finite replay: tmpfs checkpoint is safe (a production merge into a
    # long-lived table would pass a durable dir instead)
    merge_stream_into_parquet(
        stream,
        f"{d}/target",
        keys=["user_id"],
        sum_cols=["n_events", "total_value"],
        checkpoint_dir=stream_checkpoint_dir("fbmerge"),
    )
    return read_merged_parquet(spark, f"{d}/target").select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_value").cast("double").alias("total_value"),
    )


@register(
    "stream_sliding_windows",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts) - (k * INTERVAL 1 HOUR),
                    '{_TS_FMT_DUCK}') AS window_start,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
    GROUP BY 1, 2
    """,
)
def stream_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding windows (2h length, 1h slide): every event
    belongs to exactly 2 overlapping windows. The oracle states the same
    assignment in batch SQL -- each event re-keyed to both hour-aligned
    window starts that contain it."""
    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(
        sliding_counts(stream, "2 hours", "1 hour"), output_mode="complete"
    )
    return out.select(
        F.date_format("window.start", _TS_FMT_SPARK).alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "stream_session_dynamic_gap",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN event_type = 'purchase' THEN INTERVAL 10 MINUTE
                  ELSE INTERVAL 30 MINUTE END AS gap
      FROM events
    ),
    d AS (
      SELECT *, CASE WHEN MAX(ts + gap) OVER w IS NULL
                      OR ts >= MAX(ts + gap) OVER w THEN 1 ELSE 0 END AS new_sess
      FROM g
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    s AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM d
    )
    SELECT user_id,
           strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts + gap), '{_TS_FMT_DUCK}') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sess
    """,
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap (session_window's dynamic
    form): purchases close their session after 10 minutes of silence,
    everything else after 30 -- the production sessionization shape when
    inactivity timeouts differ by activity kind. Each event contributes
    a window [ts, ts + its own gap); overlapping windows merge, so a
    session's end is the MAX merged end, not last-event + constant.

    The oracle states the same merge in batch SQL via the prefix-max
    form: a session breaks at event i iff ts_i >= max over all prior
    same-user events of (ts_j + gap_j) -- the global prefix max equals
    the within-session max because a break event's own extent always
    covers the previous session's end. All boundary arithmetic is
    integer micros + whole-minute intervals: engine-exact."""
    stream = read_events_stream(spark, sf_dir)
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("10 minutes")
    ).otherwise(F.lit("30 minutes"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value"),
        )
    )
    out = run_available_now(agg, output_mode="complete")
    return out.select(
        "user_id",
        F.date_format("session_window.start", _TS_FMT_SPARK).alias(
            "session_start"
        ),
        F.date_format("session_window.end", _TS_FMT_SPARK).alias("session_end"),
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


def _stream_cm_oracle() -> str:
    from .extensions import _CM_DEPTH, _cm_bucket_sql

    pairs = " UNION ALL ".join(
        f"SELECT {r} AS row, {_cm_bucket_sql(r, 'key')} AS bucket FROM k"
        for r in range(_CM_DEPTH)
    )
    probes = " UNION ALL ".join(
        f"SELECT key, n_occ, {r} AS row, {_cm_bucket_sql(r, 'key')} AS bucket "
        "FROM topk"
        for r in range(_CM_DEPTH)
    )
    return f"""
    WITH k AS (
      SELECT CAST(user_id AS VARCHAR) AS key FROM events
    ), exact AS (
      SELECT key, COUNT(*) AS n_occ FROM k GROUP BY key
    ), topk AS (
      SELECT key, n_occ FROM exact ORDER BY n_occ DESC, key LIMIT 20
    ), pairs AS (
      {pairs}
    ), sketch AS (
      SELECT row, bucket, COUNT(*) AS c FROM pairs GROUP BY row, bucket
    ), probes AS (
      {probes}
    )
    SELECT p.key AS user_key, p.n_occ,
           CAST(MIN(s.c) AS BIGINT) AS cm_estimate,
           CAST(MIN(s.c) - p.n_occ AS BIGINT) AS cm_overestimate
    FROM probes p JOIN sketch s ON s.row = p.row AND s.bucket = p.bucket
    GROUP BY p.key, p.n_occ
    """


@register("stream_countmin_users", oracle=_stream_cm_oracle())
def stream_countmin_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min sketch over user activity -- the BOUNDED-STATE
    frequency monitor: the streaming aggregation groups by (row,
    md5-bucket), so the state store holds at most d x w = 4096 counters
    NO MATTER how many distinct users the stream ever sees. Contrast
    ``stream_stateful_user_totals``, whose state is O(users): at 100 TB/
    day the sketch is the shape that survives, and because count-min
    cells are additive, every micro-batch's state-store update IS the
    sketch merge -- per-day sketches roll up without rescanning history
    (the streaming face of ``countmin_heavy_hitters`` /
    ``hll_sketch_merge`` / ``bloom_union`` mergeability).

    Replayed to completion, the sketch is BIT-IDENTICAL to the batch
    grid (md5 bucketing, integer counters), so probing the exact top-20
    users through it must reproduce the oracle's estimates exactly --
    including the CM guarantee estimate >= exact (collisions only
    inflate), surfaced as cm_overestimate >= 0."""
    from ..io.readers import read_parquet_table
    from .extensions import _CM_DEPTH, _CM_WIDTH

    def bucket(row: int, col) -> F.Column:
        h = F.md5(F.concat(F.lit(f"{row}:"), col))
        return F.conv(F.substring(h, 1, 5), 16, 10).cast("bigint") % _CM_WIDTH

    def rb_explode(df):
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("row"),
                        bucket(r, F.col("key")).alias("bucket"),
                    )
                    for r in range(_CM_DEPTH)
                ]
            )
        ).alias("rb")

    stream = read_events_stream(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("key")
    )
    pairs = stream.select(rb_explode(stream)).select("rb.row", "rb.bucket")
    sketch = run_available_now(
        pairs.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c")),
        output_mode="complete",
    )

    ev = read_parquet_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key")
    )
    exact = ev.groupBy("key").agg(F.count(F.lit(1)).alias("n_occ"))
    topk = exact.orderBy(F.desc("n_occ"), "key").limit(20)
    probes = topk.select("key", "n_occ", rb_explode(topk)).select(
        "key", "n_occ", "rb.row", "rb.bucket"
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("key", "n_occ")
        .agg(
            F.min("c").cast("bigint").alias("cm_estimate"),
            (F.min("c") - F.col("n_occ")).cast("bigint").alias("cm_overestimate"),
        )
        .select(
            F.col("key").alias("user_key"),
            "n_occ",
            "cm_estimate",
            "cm_overestimate",
        )
    )


@register(
    "stream_psi_drift",
    oracle=f"""
    WITH ref AS (
      SELECT CAST(least(floor(value / 50.0), 9) AS INT) AS bin,
             COUNT(*) AS na_b
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    na_t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS na
      FROM events WHERE event_type = 'click'
    ),
    live AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(least(floor(value / 50.0), 9) AS INT) AS bin,
             COUNT(*) AS nb_b
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM live),
    nb_t AS (SELECT day, CAST(SUM(nb_b) AS BIGINT) AS nb FROM live GROUP BY day),
    spine AS (SELECT CAST(unnest(range(10)) AS INT) AS bin),
    grid AS (
      SELECT d.day, s.bin, COALESCE(r.na_b, 0) AS na_b,
             COALESCE(l.nb_b, 0) AS nb_b
      FROM days d CROSS JOIN spine s
      LEFT JOIN ref r ON r.bin = s.bin
      LEFT JOIN live l ON l.day = d.day AND l.bin = s.bin
    ),
    terms AS (
      SELECT g.day,
             CAST(floor(
               ((CAST(na_b AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 5.0)
                - (CAST(nb_b AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 5.0))
               * ln(((CAST(na_b AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 5.0))
                    / ((CAST(nb_b AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 5.0)))
               * 1e9 + 0.5) AS BIGINT) AS tn
      FROM grid g CROSS JOIN na_t JOIN nb_t ON nb_t.day = g.day
    )
    SELECT strftime(t.day, '{_TS_FMT_DUCK}') AS window_start,
           nb_t.nb AS n_live,
           CAST(SUM(tn) AS DOUBLE) / 1e9 AS psi
    FROM terms t JOIN nb_t ON nb_t.day = t.day
    GROUP BY 1, 2
    """,
)
def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor: per-day PSI of the live purchase `value`
    distribution against a STATIC reference histogram (all clicks) --
    the production shape of ``psi_drift_event_values``: drift checks in
    ML ops run on a stream, scoring each arriving window against a
    frozen training-time distribution (the profiling DAG's recurring
    data-inspection purpose, reference DAG2:41-55, moved to where it
    runs in production).

    The ONLY stateful streaming operator is the windowed bin count
    (groupBy(window('1 day'), bin)): state is O(windows x 10 bins), the
    minimum possible. The broadcast reference histogram joins AFTER the
    replayed aggregation, on the tiny (day, bin) relation -- joining it
    per-event pre-agg (stream_static_enrich's shape) would buy nothing
    and 10x the rows flowing into state. Same +0.5/+5.0 Laplace
    smoothing and per-term nano-snap as the batch entry, so the PSI is
    engine-exact; replayed to completion it must equal the batch SQL
    the oracle states."""
    from ..io.readers import read_parquet_table

    def bin_of(c):
        return F.least(F.floor(c / F.lit(50.0)), F.lit(9)).cast("int")

    ev = read_parquet_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    ref = (
        clicks.select(bin_of(F.col("value")).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("na_b"))
    )
    na = clicks.agg(F.count(F.lit(1)).cast("bigint").alias("na"))

    stream = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    agg = (
        stream.withColumn("bin", bin_of(F.col("value")))
        .groupBy(F.window("ts", "1 day"), "bin")
        .agg(F.count(F.lit(1)).alias("nb_b"))
    )
    out = run_available_now(agg, output_mode="complete")
    live = out.select(F.col("window.start").alias("day"), "bin", "nb_b")

    days = live.select("day").distinct()
    spine = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    nb_t = live.groupBy("day").agg(F.sum("nb_b").cast("bigint").alias("nb"))
    grid = (
        days.crossJoin(F.broadcast(spine))
        .join(F.broadcast(ref), "bin", "left")
        .join(live, ["day", "bin"], "left")
        .select(
            "day",
            "bin",
            F.coalesce("na_b", F.lit(0)).alias("na_b"),
            F.coalesce("nb_b", F.lit(0)).alias("nb_b"),
        )
    )
    pa = (F.col("na_b").cast("double") + F.lit(0.5)) / (
        F.col("na").cast("double") + F.lit(5.0)
    )
    pb = (F.col("nb_b").cast("double") + F.lit(0.5)) / (
        F.col("nb").cast("double") + F.lit(5.0)
    )
    terms = (
        grid.crossJoin(F.broadcast(na))
        .join(F.broadcast(nb_t), "day")
        .select(
            "day",
            "nb",
            F.floor((pa - pb) * F.log(pa / pb) * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
            .alias("tn"),
        )
    )
    return (
        terms.groupBy("day", "nb")
        .agg(F.sum("tn").cast("bigint").alias("tsum"))
        .select(
            F.date_format("day", _TS_FMT_SPARK).alias("window_start"),
            F.col("nb").alias("n_live"),
            (F.col("tsum").cast("double") / F.lit(1e9)).alias("psi"),
        )
    )


@register(
    "stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the unbounded event stream joined to the
    static customer dimension (user_id -> c_custkey), rolled up per
    market segment x event type.

    The canonical lookup-table pattern in Structured Streaming: a
    stream-static join is STATELESS (no watermark, no join state store)
    because the static side is re-resolved per micro-batch -- which is
    also how dimension updates between batches become visible. The dim is
    broadcast, so enrichment adds zero shuffle to the stream; the only
    stateful operator is the downstream aggregation. Replayed to
    completion, the result must equal the batch join+GROUP BY the oracle
    states. Value sums ride DECIMAL(38,6) (DETERMINISM.md rule 1).
    """
    from ..io.readers import read_parquet_table

    ev = read_events_stream(spark, sf_dir)
    cust = read_parquet_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(cust), "user_id")
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value"),
    )
    out = run_available_now(agg, output_mode="complete")
    return out.select(
        "c_mktsegment",
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )

