"""Partition-shape helpers.

The CPU-bound narrow operators (minhash, simhash, fingerprints, decode
UDFs) are only as parallel as their input splits. A small parquet file
scans as ONE partition, so a 32-core local run uses 1 core; at cluster
scale the same operator on a skewed file layout (few huge files) hits the
same wall. ``rebalance_for_cpu`` is the gated fix: repartition ONLY when
the scan produced fewer splits than the target -- on a healthy 100 TB
layout (thousands of splits) it is a no-op, so it never introduces a
corpus-wide shuffle where the file layout is already parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_cpu(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition to ``target`` (default: cluster default
    parallelism) iff the current plan has fewer partitions. Use ahead of
    expensive per-row work, never as a default on cheap scans."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
