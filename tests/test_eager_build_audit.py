"""Registry-wide enforcement of the eager_build contract (ADVICE r8):
building a NON-eager entry's DataFrame must be (near) side-effect-free.

Every `spark.read.parquet` triggers one small footer/schema job, so an
entry legitimately runs ~one job per distinct table it reads (the
worst honest case in the catalog is tpch_q8 at 7 tables). Anything
well beyond that is hidden build-time WORK -- an iterative
localCheckpoint loop, a driver count(), a codebook collect -- and must
be declared `eager_build=True` so generic catalog consumers (plan
dumpers, schema walkers) can skip or defer it. This audit caught
pagerank_parts_3iter (driver n_nodes count), dedup_cluster_survivors
and dedup_semantic_clusters (cluster_labels propagation loops) running
9-19 jobs at build while unmarked.

Runs at sf0.001 and builds plans only (no .collect()), ~2-3 min for
the full catalog.
"""

from __future__ import annotations

from state_economics_end_to_end_data_pipeline_spark.plans import load_all

# one schema job per table read; the widest honest entry reads 7 tables
MAX_SCHEMA_JOBS = 8


def test_non_eager_entries_run_no_real_jobs_at_build(spark, sf_dir):
    qs = load_all()
    sc = spark.sparkContext
    violators = []
    for name, q in sorted(qs.items()):
        if q.eager_build:
            continue
        group = f"eager-audit-{name}"
        sc.setJobGroup(group, name)
        try:
            q.fn(spark, sf_dir)
        finally:
            jobs = sc.statusTracker().getJobIdsForGroup(group)
            sc.setJobGroup("", "")
        if len(jobs) > MAX_SCHEMA_JOBS:
            violators.append((name, len(jobs)))
    assert not violators, (
        f"entries run >{MAX_SCHEMA_JOBS} jobs at build without "
        f"eager_build=True: {violators}"
    )
