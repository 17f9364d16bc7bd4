"""Task-retry determinism: the batch-side fault-tolerance twin of the
streaming checkpoint-recovery tests.

On a 1000-executor cluster, task attempts FAIL routinely (preemption,
OOM-kill, disk faults) and Spark re-runs them (spark.task.maxFailures,
default 4). The engine's correctness claim therefore rests on every plan
being deterministic under re-execution: a retried task must recompute
exactly the partition its predecessor would have produced. The catalog
enforces the preconditions by discipline (salted-md5 instead of rand(),
row_number over explicit orderings instead of
monotonically_increasing_id, decimal/integer accumulation -- see
docs/DETERMINISM.md); this test executes the property itself.

Local mode needs a dedicated master string for retries -- ``local[N]``
aborts on first task failure, ``local[N, F]`` allows F failures -- and
one JVM holds one SparkContext, so the scenario runs in a SUBPROCESS
session rather than the suite-shared fixture. Inside it, a
mapPartitions stage raises on the FIRST attempt of every partition
(tracked via attempt-scoped marker files) and succeeds on retry; the
aggregate over the retried stage must equal the same aggregate computed
without any injected failures.

Reference anchor: the reference's only failure story is Airflow task
``retries=1`` (reference DAG1:11-19) -- rerun the whole pandas task.
Spark retries the failed PARTITION only; this test is the executed proof
that a retried partition reproduces its data exactly.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap


def test_retried_tasks_reproduce_partitions_exactly(sf_dir, tmp_path):
    script = textwrap.dedent(
        f"""
        import glob
        import os
        import sys

        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as F

        marker_dir = {str(tmp_path)!r}
        spark = (
            SparkSession.builder.appName("retry-determinism")
            # local[4, 2]: 4 threads, tolerate 1 failure per task
            .master("local[4, 2]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )

        def fail_first_attempt(it):
            from pyspark import TaskContext

            tc = TaskContext.get()
            marker = os.path.join(
                marker_dir, f"p{{tc.partitionId()}}_seen"
            )
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError(
                    f"injected failure: partition {{tc.partitionId()}} "
                    f"attempt {{tc.attemptNumber()}}"
                )
            yield from it

        li = spark.read.parquet({f"{sf_dir}/lineitem.parquet"!r}).select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        ).repartition(4, "l_orderkey")

        flaky = spark.createDataFrame(
            li.rdd.mapPartitions(fail_first_attempt), li.schema
        )

        def agg(df):
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"),
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("p"),
                F.sum(F.hash("l_orderkey", "l_quantity").cast("bigint")).alias("h"),
            ).first()
            return (row["n"], str(row["q"]), str(row["p"]), row["h"])

        with_retries = agg(flaky)
        markers = sorted(os.path.basename(m) for m in glob.glob(marker_dir + "/p*_seen"))
        clean = agg(li)
        assert len(markers) == 4, markers  # every partition failed once
        assert with_retries == clean, (with_retries, clean)
        print("RETRY_OK", with_retries[0], len(markers))
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY_OK" in proc.stdout, proc.stdout
