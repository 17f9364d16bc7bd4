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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join when AQE's skew splitting is unavailable or a
    single key dominates: the big side gets a random-free deterministic
    salt (hash of its row via pmod on a second column is caller's choice;
    here round-robin by key hash spread), the small side is replicated
    ``n_salts`` times, and the join key becomes (key, salt) -- a hot key's
    rows land on n_salts reducers instead of one.

    Result is row-identical to ``big.join(small, key, how)``: salting
    only re-buckets the shuffle. Cost: small side x n_salts (keep it for
    dim-sized or pre-aggregated small sides)."""
    from pyspark.sql import functions as F

    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
    )
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("long").alias("__salt")
    )
    salted_small = small.crossJoin(F.broadcast(salts))
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
