"""Watermark semantics pinned by deterministic multi-batch file replay.

The oracle-paired stream_* entries replay to completion in complete mode,
which never exercises LATE-DATA DROP. This file pins the append-mode
watermark behavior with a hand-built 3-file source whose batch order is
fixed (maxFilesPerTrigger=1 + staggered mtimes: the file source processes
oldest-modification-time first), so the drop is reproducible.

The key semantics, measured on this Spark (4.x) and asserted below: a
stateful operator carries TWO watermark values per batch --
``watermarkForLateEvents`` (the PREVIOUS batch's watermark, used to filter
incoming late rows) and ``watermarkForEviction`` (the current one, used to
finalize windows). A row arriving one batch after its window's watermark
passed is therefore still MERGED (the state has not yet been read when the
filter value lags); only a row arriving once the late-event watermark has
caught up is dropped. Production consequence: "allowed lateness" is the
watermark delay PLUS up to one trigger interval, which matters when sizing
the delay against upstream batching.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _ordered_file_source(spark, base: str, batches: list[list[tuple]]) -> str:
    """Write each batch as one parquet file into a source dir with
    strictly increasing mtimes, so the file stream replays them in order
    (one file per trigger)."""
    src = f"{base}/src"
    os.makedirs(src)
    now = time.time()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
            f"{base}/f{i}"
        )
        part = glob.glob(f"{base}/f{i}/part-*.parquet")[0]
        dst = f"{src}/{chr(97 + i)}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (now - 1000 + i * 100, now - 1000 + i * 100))
    return src


def test_watermark_late_drop_and_two_watermark_lag(spark, tmp_path_factory):
    """Replay: batch0 = on-time rows (max 12:00 -> wm 11:30 next batch);
    batch1 = 12:05 (advances wm to 11:35, evicts+emits the 09:00 and
    10:00 windows); batch2 = a 09:10 straggler, now behind the
    late-event watermark -> DROPPED, counted in
    numRowsDroppedByWatermark. The 12:00 window's end (13:00) never
    falls below the final watermark, so append mode must withhold it."""
    base = str(tmp_path_factory.mktemp("late_drop"))
    src = _ordered_file_source(
        spark,
        base,
        [
            [
                (1, _ts("2024-01-01 09:05:00")),
                (2, _ts("2024-01-01 10:20:00")),
                (3, _ts("2024-01-01 12:00:00")),
            ],
            [(5, _ts("2024-01-01 12:05:00"))],
            [(4, _ts("2024-01-01 09:10:00"))],
        ],
    )
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop_pin")
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()

    res = sorted(
        (r.w, r.n)
        for r in spark.table("late_drop_pin")
        .select(F.date_format("window.start", "HH:mm").alias("w"), "n")
        .collect()
    )
    # the straggler is NOT in the 09:00 window; the 12:00 window is withheld
    assert res == [("09:00", 1), ("10:00", 1)], res

    progress = list(q.recentProgress)
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in progress
        for so in p["stateOperators"]
    )
    assert dropped == 1, [
        (p["batchId"], p.get("eventTime", {}).get("watermark")) for p in progress
    ]


def test_watermark_one_batch_lag_merges_straggler(spark, tmp_path_factory):
    """The counterpart pin: the SAME straggler arriving one batch
    earlier -- while the late-event watermark still lags at its previous
    value -- is MERGED into its (not-yet-evicted) window, not dropped.
    This is the two-watermark lag production planning must account for;
    if Spark ever tightened the filter to the eviction watermark, this
    test flips and the docstring above needs rewriting."""
    base = str(tmp_path_factory.mktemp("late_merge"))
    src = _ordered_file_source(
        spark,
        base,
        [
            [
                (1, _ts("2024-01-01 09:05:00")),
                (2, _ts("2024-01-01 10:20:00")),
                (3, _ts("2024-01-01 12:00:00")),
            ],
            [
                (4, _ts("2024-01-01 09:10:00")),
                (5, _ts("2024-01-01 12:05:00")),
            ],
        ],
    )
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_merge_pin")
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()

    res = sorted(
        (r.w, r.n)
        for r in spark.table("late_merge_pin")
        .select(F.date_format("window.start", "HH:mm").alias("w"), "n")
        .collect()
    )
    # straggler merged: the 09:00 window emits with BOTH rows
    assert res == [("09:00", 2), ("10:00", 1)], res
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped == 0, dropped


# ---------------------------------------------------------------------------
# Checkpoint recovery: the production property the checkpoint machinery
# exists for. The reference's whole retry story is Airflow `retries=1`
# (reference DAG1:11-19 -- rerun the task from scratch); Spark claims the
# stronger guarantee: kill a stateful query mid-stream, start a NEW query
# from the same checkpoint, and the final sink equals the uninterrupted
# replay bit-for-bit (state store + source offsets + sink log all recover).
# The tests below prove it deterministically: availableNow over file 1
# terminates the first query, files 2-3 appear, a fresh query resumes from
# the checkpoint. No sleeps, no races.
# ---------------------------------------------------------------------------

_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.LongType()),
    ]
)

_SESS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.LongType()),
    ]
)


def _publish_file(spark, base: str, i: int, rows, schema) -> str:
    """Stage batch ``i`` as one parquet file in ``{base}/src`` with an
    mtime that preserves publish order (the file source processes
    oldest-first). Unlike _ordered_file_source, files can be published
    incrementally -- between two runs of a checkpointed query."""
    src = f"{base}/src"
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{base}/f{i}")
    part = glob.glob(f"{base}/f{i}/part-*.parquet")[0]
    dst = f"{src}/{chr(97 + i)}.parquet"
    shutil.copy(part, dst)
    stamp = time.time() - 1000 + i * 100
    os.utime(dst, (stamp, stamp))
    return src


def _run_totals_to_parquet(spark, src: str, ck: str, out: str, batch_log: list):
    """One availableNow pass of stateful_user_totals with a FAULT-TOLERANT
    sink: foreachBatch writes each micro-batch's emissions to a parquet
    dir keyed by batch_id, mode=overwrite -- a replayed batch id rewrites
    identical content instead of duplicating it (the idempotence that
    upgrades at-least-once delivery to exactly-once table state; same
    guard as merge_stream_into_parquet). The memory sink can't serve
    here: it is not fault-tolerant and starts empty on restart."""
    from state_economics_end_to_end_data_pipeline_spark.streaming.events import (
        stateful_user_totals,
    )

    stream = (
        spark.readStream.schema(_TOTALS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    def sink(df, bid: int) -> None:
        batch_log.append(bid)
        df.write.mode("overwrite").parquet(f"{out}/b{bid}")

    q = (
        stateful_user_totals(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()


def _final_totals(spark, out: str):
    """Roll the per-batch update-mode emissions to final state: the row
    with the max cumulative event count per user (same rollup as the
    stream_stateful_user_totals catalog entry)."""
    df = spark.read.parquet(f"{out}/b*")
    return sorted(
        (r.user_id, r.n, int(r.tot))
        for r in df.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n"),
            F.max_by("total_value", "n_events").alias("tot"),
        )
        .collect()
    )


_TOTALS_BATCHES = [
    [(1, 10), (1, 20), (2, 5)],
    [(1, 7), (3, 100)],
    [(2, 1), (2, 2), (3, 3)],
]
# batch aggregate over ALL files, computed by hand: the recovery oracle
_TOTALS_EXPECTED = [(1, 3, 37), (2, 3, 8), (3, 2, 103)]


def test_checkpoint_recovery_stateful_user_totals(spark, tmp_path_factory):
    """applyInPandasWithState across a restart: replay file 1, let the
    query terminate, publish files 2-3, start a NEW query from the same
    checkpoint. The resumed query must (a) process ONLY the new files
    (source offsets recovered -- batch ids continue 0,1,2 with no
    reprocessing) and (b) continue each user's totals from the
    checkpointed STATE STORE, so the final rollup equals both the
    uninterrupted replay and the hand-computed batch aggregate. A lost
    state store would restart user 1 at zero; a re-read of file 1 would
    double-count -- either diverges from the oracle."""
    base = str(tmp_path_factory.mktemp("ckrec_totals"))

    ub = f"{base}/uninterrupted"
    src_u = None
    for i, rows in enumerate(_TOTALS_BATCHES):
        src_u = _publish_file(spark, ub, i, rows, _TOTALS_SCHEMA)
    log_u: list = []
    _run_totals_to_parquet(spark, src_u, f"{ub}/ck", f"{ub}/out", log_u)
    assert log_u == [0, 1, 2]

    ib = f"{base}/interrupted"
    src_i = _publish_file(spark, ib, 0, _TOTALS_BATCHES[0], _TOTALS_SCHEMA)
    log_i: list = []
    _run_totals_to_parquet(spark, src_i, f"{ib}/ck", f"{ib}/out", log_i)
    assert log_i == [0]
    for i in (1, 2):
        _publish_file(spark, ib, i, _TOTALS_BATCHES[i], _TOTALS_SCHEMA)
    _run_totals_to_parquet(spark, src_i, f"{ib}/ck", f"{ib}/out", log_i)
    # offsets recovered: the resumed query saw only the two NEW files
    assert log_i == [0, 1, 2], log_i

    assert _final_totals(spark, f"{ib}/out") == _TOTALS_EXPECTED
    assert _final_totals(spark, f"{ub}/out") == _TOTALS_EXPECTED


def test_checkpoint_recovery_replays_uncommitted_batch_idempotently(
    spark, tmp_path_factory
):
    """The crash case RESTART-FROM-CHECKPOINT alone doesn't exercise: the
    process dies AFTER batch 0's offsets are written but BEFORE its
    commit marker (simulated by deleting checkpoint/commits/0). Recovery
    must re-run batch 0 against the SAME pinned offsets -- the state
    store loads the pre-batch-0 version, so the replay emits identical
    rows, the idempotent sink overwrites b0 with identical content, and
    the final rollup still matches the oracle exactly (at-least-once
    delivery + idempotent sink = exactly-once table state)."""
    base = str(tmp_path_factory.mktemp("ckrec_crash"))
    src = _publish_file(spark, base, 0, _TOTALS_BATCHES[0], _TOTALS_SCHEMA)
    log: list = []
    _run_totals_to_parquet(spark, src, f"{base}/ck", f"{base}/out", log)
    assert log == [0]
    b0_before = sorted(
        tuple(r) for r in spark.read.parquet(f"{base}/out/b0").collect()
    )

    # crash between offsets and commit: the marker never got written (a
    # real crash leaves neither the file nor its ChecksumFs .crc twin --
    # a stale .crc would make the re-commit rename fail as a spurious
    # "concurrent query" conflict)
    os.remove(f"{base}/ck/commits/0")
    os.remove(f"{base}/ck/commits/.0.crc")
    for i in (1, 2):
        _publish_file(spark, base, i, _TOTALS_BATCHES[i], _TOTALS_SCHEMA)
    _run_totals_to_parquet(spark, src, f"{base}/ck", f"{base}/out", log)
    # batch 0 WAS replayed (at-least-once), then the new files processed
    assert log == [0, 0, 1, 2], log
    b0_after = sorted(
        tuple(r) for r in spark.read.parquet(f"{base}/out/b0").collect()
    )
    assert b0_after == b0_before  # the replay rewrote identical content
    assert _final_totals(spark, f"{base}/out") == _TOTALS_EXPECTED


def test_checkpoint_recovery_rocksdb_state_store(spark, tmp_path_factory):
    """The same restart scenario on the ROCKSDB state-store provider --
    the production backend once state outgrows executor heap (billions
    of keys at 100 TB): state lives off-heap in one RocksDB instance per
    store, checkpointed as SST snapshots. A checkpoint written by the
    RocksDB provider must recover into a NEW query exactly like the
    default HDFS-backed provider does (the provider is bundled:
    rocksdbjni ships in Spark's own jars)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    provider = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(key)
    spark.conf.set(key, provider)
    try:
        base = str(tmp_path_factory.mktemp("ckrec_rocksdb"))
        src = _publish_file(spark, base, 0, _TOTALS_BATCHES[0], _TOTALS_SCHEMA)
        log: list = []
        _run_totals_to_parquet(spark, src, f"{base}/ck", f"{base}/out", log)
        assert log == [0]
        for i in (1, 2):
            _publish_file(spark, base, i, _TOTALS_BATCHES[i], _TOTALS_SCHEMA)
        _run_totals_to_parquet(spark, src, f"{base}/ck", f"{base}/out", log)
        assert log == [0, 1, 2], log
        assert _final_totals(spark, f"{base}/out") == _TOTALS_EXPECTED
    finally:
        spark.conf.set(key, prev)


def test_checkpoint_recovery_session_window_spanning_restart(
    spark, tmp_path_factory
):
    """Dynamic-gap session windows (the stream_session_dynamic_gap shape)
    across a restart, with the hard case built in: user 1's session is
    OPEN when the first query terminates (events at 10:00 and 10:20,
    click gap 30m -> extent to 10:50) and its next event (10:40, file 2)
    arrives only after the restart. Only a recovered state store can
    merge it into ONE session [10:00, 11:10); a fresh store would emit
    two. File 3 advances the watermark to 19:00, flushing every closed
    session; the append-mode parquet FILE SINK is the fault-tolerant
    sink (its _spark_metadata log commits per batch id -- the memory
    sink would start empty on restart). Final committed rows must be
    bit-identical between the interrupted and uninterrupted replays and
    equal the hand-computed sessionization."""

    def ts(s: str):
        return _ts(f"2024-01-01 {s}:00")

    batches = [
        [(1, ts("10:00"), "click", 1), (1, ts("10:20"), "click", 2),
         (2, ts("10:05"), "purchase", 4)],
        [(1, ts("10:40"), "click", 8), (2, ts("12:00"), "click", 16)],
        [(9, ts("20:00"), "click", 32)],  # watermark -> 19:00, flushes all
    ]
    # sessionized by hand: per-event gap = 10m for purchases, 30m else
    expected = [
        (1, "10:00", "11:10", 3, 11),   # spans the restart boundary
        (2, "10:05", "10:15", 1, 4),
        (2, "12:00", "12:30", 1, 16),
        # user 9's session ends 20:30 > watermark 19:00: withheld in state
    ]

    def run(src: str, ck: str, out: str) -> None:
        stream = (
            spark.readStream.schema(_SESS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        gap = F.when(
            F.col("event_type") == "purchase", F.lit("10 minutes")
        ).otherwise(F.lit("30 minutes"))
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", gap), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
            )
            .select(
                "user_id",
                F.date_format("session_window.start", "HH:mm").alias("s"),
                F.date_format("session_window.end", "HH:mm").alias("e"),
                "n_events",
                "total_value",
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()

    def committed(out: str):
        return sorted(
            (r.user_id, r.s, r.e, r.n_events, int(r.total_value))
            for r in spark.read.parquet(out).collect()
        )

    base = str(tmp_path_factory.mktemp("ckrec_sess"))
    ub = f"{base}/uninterrupted"
    src_u = None
    for i, rows in enumerate(batches):
        src_u = _publish_file(spark, ub, i, rows, _SESS_SCHEMA)
    run(src_u, f"{ub}/ck", f"{ub}/out")

    ib = f"{base}/interrupted"
    src_i = _publish_file(spark, ib, 0, batches[0], _SESS_SCHEMA)
    run(src_i, f"{ib}/ck", f"{ib}/out")  # session open, nothing flushed yet
    for i in (1, 2):
        _publish_file(spark, ib, i, batches[i], _SESS_SCHEMA)
    run(src_i, f"{ib}/ck", f"{ib}/out")  # NEW query, same checkpoint

    assert committed(f"{ib}/out") == expected
    assert committed(f"{ub}/out") == expected


def test_events_stream_reads_directory_layout(spark, sf_dir, tmp_path_factory):
    """read_events_stream must yield the SAME rows whether
    events.parquet is a single file (driver fixtures) or a Spark-written
    directory of part files (any engine output). The directory case used
    to return an EMPTY stream silently -- the glob filter matches file
    names, so nothing under events.parquet/ matched it (caught by the
    10x scale probe timing streaming entries suspiciously fast on zero
    rows)."""
    from state_economics_end_to_end_data_pipeline_spark.io.readers import (
        read_parquet_table,
    )
    from state_economics_end_to_end_data_pipeline_spark.streaming.events import (
        read_events_stream,
        run_available_now,
    )

    base = str(tmp_path_factory.mktemp("dirsrc"))
    ev = read_parquet_table(spark, sf_dir, "events")
    ev.write.parquet(f"{base}/events.parquet")  # directory layout
    n_expected = ev.count()

    stream = read_events_stream(spark, base)
    out = run_available_now(
        stream.groupBy().count(), output_mode="complete"
    )
    [row] = out.collect()
    assert row["count"] == n_expected
