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
