"""Approx-vs-exact property tests for the sketch production paths, and
JVM-twin equivalence for the deliberate Python-boundary demos.

The catalog's oracle-parity entries (exact percentile, pandas_udf
normalize, applyInPandas min-max) pin cross-engine values; these tests
pin the PRODUCTION variants to them, so the scale path is checked
against the exact path on every run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from state_economics_end_to_end_data_pipeline_spark.io.readers import read_parquet_table
from state_economics_end_to_end_data_pipeline_spark.operators.similarity import (
    l2_normalize,
    norm2,
    with_l2_normalized,
)
from state_economics_end_to_end_data_pipeline_spark.plans import load_all

QUERIES = load_all()


def test_approx_quantiles_within_rank_tolerance(spark, sf_dir):
    """percentile_approx cuts must satisfy the GK rank guarantee against
    the exact data: count(x < q)/n <= p + eps and count(x <= q)/n >= p - eps."""
    out = {
        r["l_returnflag"]: r
        for r in QUERIES["quantiles_grouped_approx"].fn(spark, sf_dir).collect()
    }
    assert out, "no groups returned"
    for flag, row in out.items():
        assert row["q25_ok"] and row["q50_ok"] and row["q75_ok"], (flag, row)


def test_winsorized_approx_rank_guarantee(spark, sf_dir):
    """The registered sketch-only plan: both tail cuts must satisfy the
    GK rank guarantee (checked in-plan with COUNTs, no exact percentile)."""
    rows = QUERIES["winsorized_mean_per_group_approx"].fn(spark, sf_dir).collect()
    assert rows, "no groups returned"
    for row in rows:
        assert row["cut01_ok"] and row["cut99_ok"], row


def test_winsorized_approx_tracks_exact(spark, sf_dir):
    """Value-level pin: the production sketch-cut winsorized mean must
    land within 1% of the exact-percentile parity variant. (This check
    deliberately lives here, not in the registered plan -- the production
    plan must never run exact percentile.)"""
    from state_economics_end_to_end_data_pipeline_spark.plans.robust_stats import (
        winsorized_mean_approx_values,
    )

    approx = {
        r["l_returnflag"]: r["approx_wmean"]
        for r in winsorized_mean_approx_values(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["winsorized_mean"]
        for r in QUERIES["winsorized_mean_per_group"].fn(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, wm in approx.items():
        assert abs(wm - exact[flag]) <= 0.01 * abs(exact[flag]), (flag, wm, exact[flag])


def test_mad_approx_rank_guarantee(spark, sf_dir):
    rows = QUERIES["mad_per_group_approx"].fn(spark, sf_dir).collect()
    assert rows, "no groups returned"
    for row in rows:
        assert row["median_ok"] and row["mad_ok"], row


def test_mad_approx_tracks_exact(spark, sf_dir):
    """Sketch MAD within max(5% of exact, 1.0) of exact MAD. NOTE which
    bound binds: l_quantity is integer-valued, so exact MAD interpolates
    on a grid with step 1.0 and the absolute floor (one full grid step)
    DOMINATES here -- TPC-H MAD is ~12.5, so the effective tolerance is
    1.0 (~8%), looser than the 5% term. The percentage term only binds
    for data where exact MAD > 20."""
    from state_economics_end_to_end_data_pipeline_spark.plans.robust_stats import (
        mad_approx_values,
    )

    approx = {
        r["l_returnflag"]: r["approx_mad"]
        for r in mad_approx_values(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["mad_qty"]
        for r in QUERIES["mad_per_group"].fn(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, mad in approx.items():
        tol = max(0.05 * abs(exact[flag]), 1.0)
        assert abs(mad - exact[flag]) <= tol, (flag, mad, exact[flag])


def test_minmax_norm_window_equals_pandas_variant(spark, sf_dir):
    """The window-function production plan and the applyInPandas demo must
    produce identical doubles (same subtraction/division per value)."""
    jvm = QUERIES["grouped_minmax_norm_window"].fn(spark, sf_dir)
    py = QUERIES["grouped_minmax_norm"].fn(spark, sf_dir)
    # (l_orderkey, l_linenumber) is not unique in the synthetic lineitem,
    # so compare as multisets (exact double equality), not via a key join
    assert jvm.exceptAll(py).count() == 0
    assert py.exceptAll(jvm).count() == 0


def test_l2_normalize_jvm_equals_pandas_udf(spark, sf_dir):
    """Bit-identical nano-unit strings from the codegen'd transform and
    the Arrow-batched pandas_udf (same IEEE fold order end to end)."""
    jvm = QUERIES["embedding_l2_normalize_jvm"].fn(spark, sf_dir)
    py = QUERIES["embedding_l2_normalize"].fn(spark, sf_dir)
    diff = (
        jvm.withColumnRenamed("unit_vec_nano", "a")
        .join(py.withColumnRenamed("unit_vec_nano", "b"), "vec_id", "full")
        .filter(
            F.col("a").isNull() | F.col("b").isNull() | (F.col("a") != F.col("b"))
        )
    )
    assert diff.count() == 0


def test_l2_normalize_produces_unit_vectors(spark, sf_dir):
    """The array<double> form of the production normalizer: ||unit||^2 == 1
    to double precision for every non-zero vector."""
    emb = read_parquet_table(spark, sf_dir, "embeddings").limit(500)
    bad = (
        emb.select(norm2(l2_normalize(F.col("embedding"))).alias("sq"))
        .filter(F.abs(F.col("sq") - 1.0) > 1e-12)
        .count()
    )
    assert bad == 0


def test_l2_normalize_staged_norm_folds_once(spark):
    """The scale guard for normalization: ``with_l2_normalized`` must keep
    the norm fold OUT of the per-element lambda. Catalyst does not CSE
    through higher-order-function lambdas, so an inlined norm is re-folded
    for every element -- O(d^2)/row, ~1M ops/row at production d. Asserted
    structurally (exactly ONE aggregate() in the optimized plan, at a
    realistic d=512) so a CollapseProject regression re-inlining the fold
    fails the suite; plus the zero-vector guard (0-vec passes through with
    no NaN/Inf components)."""
    import re

    rows = [
        (i, [float((i * 31 + j) % 97) / 97.0 + 0.01 for j in range(512)])
        for i in range(50)
    ]
    rows.append((99, [0.0] * 512))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = with_l2_normalized(df, "embedding", "unit_vec")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(re.findall(r"aggregate\(", plan)) == 1, plan

    checked = out.select("vec_id", norm2(F.col("unit_vec")).alias("sq")).collect()
    for r in checked:
        if r["vec_id"] == 99:
            assert r["sq"] == 0.0  # zero vector unchanged, not NaN
        else:
            assert abs(r["sq"] - 1.0) < 1e-12


def test_transform_with_state_user_peaks(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) must
    reproduce the batch per-user count/peak aggregate on a bounded
    replay. Requires protobuf (the state-server wire protocol), absent
    from some images -- skipped there."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F2

    from state_economics_end_to_end_data_pipeline_spark.plans.streaming_queries import (
        _stream_tws_user_peaks,
    )

    got = {
        r["user_id"]: (r["n_events"], r["peak_cents"])
        for r in _stream_tws_user_peaks(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r["user_id"]: (r["n"], r["peak"])
        for r in ev.groupBy("user_id")
        .agg(
            F2.count(F2.lit(1)).alias("n"),
            F2.max(F2.round(F2.col("value") * 100).cast("bigint")).alias("peak"),
        )
        .collect()
    }
    assert got == want


def test_pq_codebook_vectors_encode_to_themselves(spark, sf_dir):
    """PQ sanity: a codebook donor vector's nearest codebook entry in
    every subspace is itself (d2 == 0 exactly -- same doubles), every
    error is non-negative, and every encoded vector has exactly m=8
    subspace rows."""
    rows = QUERIES["embedding_pq_codes"].fn(spark, sf_dir).collect()
    per_vec = {}
    for r in rows:
        assert r["d2"] >= 0.0
        per_vec.setdefault(r["vec_id"], []).append(r)
    assert all(len(v) == 8 for v in per_vec.values())
    for vid in range(4):  # the codebook donors
        for r in per_vec[vid]:
            assert r["code"] == vid, (vid, r)
            assert r["d2"] == 0.0, (vid, r)


def test_pq_adc_topk_ranks_dense_and_monotone(spark, sf_dir):
    """ADC search invariants: exactly 5 ranked rows per query, ranks
    dense 1..5, approximate distances non-negative and non-decreasing
    with rank (the integer-nano sum makes ties stable), and the query
    itself never returned as its own neighbor."""
    rows = QUERIES["embedding_pq_adc_topk"].fn(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        assert r["adc_nano"] >= 0
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5], qid
        dists = [r["adc_nano"] for r in rs]
        assert dists == sorted(dists), qid


def test_kmeans_ivf_recall_deterministic_and_useful(spark, sf_dir):
    """The KMeans-trained IVF index: the entry reports per-query
    STRUCTURAL guarantee booleans (candidate lists non-empty, hits a
    subset of candidates) instead of raw recalls -- KMeans means are
    float-nondeterministic across engines. The env-sensitive THRESHOLDS
    (mean recall, cell census) moved to
    test_diagnostics_entries.py::test_kmeans_ivf_thresholds_hold in
    round 7 (ADVICE r6). Seeded training must be reproducible
    run-to-run and every structural guarantee must hold."""
    out = QUERIES["embedding_ivf_kmeans_recall"].fn(spark, sf_dir)
    rows = {r["query_id"]: r.asDict() for r in out.collect()}
    assert len(rows) == 10
    for r in rows.values():
        assert r["n_hits_ok"] and r["n_approx_ok"] and r["hits_subset_ok"]
    again = {
        r["query_id"]: r.asDict()
        for r in QUERIES["embedding_ivf_kmeans_recall"].fn(spark, sf_dir).collect()
    }
    assert rows == again  # seeded KMeans: same input -> same index


def test_python_datasource_zero_rows(spark):
    """rows=0 with multiple planned partitions must yield an empty scan,
    not a range(0, 0, 0) planning crash (the split step is floor-divided
    from the row count and needs the empty-source guard)."""
    from state_economics_end_to_end_data_pipeline_spark.io.python_datasource import (
        read_synthetic_events,
    )

    df = read_synthetic_events(spark, n_rows=0, n_parts=8)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "event_id", "user_id", "amount_cents", "day",
    ]


def test_python_datasource_plans_partitions_and_derives_rows(spark):
    """The custom DataSource must honor its planned parallelism and the
    documented row-derivation contract."""
    from state_economics_end_to_end_data_pipeline_spark.io.python_datasource import (
        KNUTH,
        N_USERS,
        read_synthetic_events,
    )

    df = read_synthetic_events(spark, n_rows=1000, n_parts=4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    rows = {r["event_id"]: r for r in df.filter(F.col("event_id") < 3).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert rows[2]["user_id"] == (2 * KNUTH) % N_USERS
    assert rows[2]["amount_cents"] == 4 % 10_000 + 100


def test_minmax_norm_arrow_equals_window_variant(spark, sf_dir):
    """applyInArrow must produce the same doubles as the JVM window plan
    (multiset compare -- the group key is not unique in this data)."""
    arrow = QUERIES["grouped_minmax_norm_arrow"].fn(spark, sf_dir)
    jvm = QUERIES["grouped_minmax_norm_window"].fn(spark, sf_dir)
    assert arrow.exceptAll(jvm).count() == 0
    assert jvm.exceptAll(arrow).count() == 0
