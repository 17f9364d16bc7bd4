"""SparkSession factory tuned for this engine.

Local test posture is ``local[N]`` (single JVM), but every default here is
chosen to also be the right default on a 1000-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting, dynamic
  broadcast) -- at 100 TB the static ``shuffle.partitions`` number is always
  wrong, AQE fixes it per-stage.
- Arrow on for any pandas interchange (the slow path, used only by the Excel
  ingest shim and multimodal UDFs).
- UTC session timezone so timestamp semantics match the DuckDB oracle and are
  stable across clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "state-econ-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster callers pass ``None`` and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # full JVM charset set for legacy-encoded CSVs (e.g. windows-1252)
        .config("spark.sql.legacy.javaCharsets", "true")
        # read INT64 TIMESTAMP(NANOS) parquet columns as long instead of
        # failing; io.readers.read_parquet_table converts them back to
        # microsecond timestamps losslessly
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet timestamps with isAdjustedToUTC=false scan as TIMESTAMP
        # (session-local, = UTC here), not TIMESTAMP_NTZ: watermarks,
        # window(), and unix_micros all require TIMESTAMP, and with a UTC
        # session the micros are identical either way -- this keeps the
        # engine agnostic to which flavor the upstream writer produced
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
