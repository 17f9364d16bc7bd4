"""Dump `explain("formatted")` for the headline queries into docs/PLANS.md
— reviewable evidence that each plan has the shape the 100 TB design
claims (pushed filters, pruned read schemas, broadcast joins, partial
aggregation, single exchanges), frozen alongside the code that produces it.

Usage: python tools/explain_dump.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# NOTE: traversal-at-build entries (graph_bfs_hops, CC, kcore) and
# stream-replay entries are deliberately excluded — building their
# DataFrame runs the whole traversal / replay, which a plan-dump tool
# must not do.  The registry now carries this as `Query.eager_build`
# (plans/__init__.py); entries kept below despite a small eager step
# (PQ codebook / IVF centroid collects, bounded by construction) are
# the tolerated exceptions, warned about at dump time.
HEADLINERS = [
    "scan_project_filter",
    "q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "sessionize_events_batch",
    "minhash_lsh_pairs",
    "embedding_ivf_topk",
    "skew_salted_agg",
    "upsert_scd2",
    "tpch_q13_order_histogram",
    "tpch_q22_anti_prospects",
    "cohort_retention",
    "quantiles_grouped_approx",
    "benchmark_contamination",
    # dedup_semantic_clusters: excluded since r9 -- its build runs the
    # cluster_labels propagation loop (traversal-at-build, 17 jobs),
    # caught by tests/test_eager_build_audit.py
    "sequence_packing_chunks",
    "window_range_frame_trailing",
    "pyds_synthetic_events",
    "market_basket_pairs",
    "embedding_l2_normalize_jvm",
    "embedding_pq_adc_topk",
    "copurchase_triangles",
    "dedup_incremental_batch",
    "fk_check_orphans",
    "dedup_bloom_prefilter",
    "bm25_keyword_search",
    "hll_sketch_merge",
    "simhash_banded_pairs",
    "dupspan_coverage",
    "embedding_ivfpq_topk",
    "events_ohlc_hourly",
    "vocab_topk_coverage",
    "token_pmi_pairs",
    "item_item_cosine_topk",
    "ema_trailing_per_user",
    "bigram_logprob_quality",
    "ks_drift_event_values",
    "bootstrap_mean_ci",
    "kmv_intersection_estimate",
    "jaccard_prefix_filter_pairs",
    "clustering_coefficient_parts",
    "orders_open_by_day",
    "customer_rfm_segments",
    "customer_rfm_segments_approx",
    "window_ntile_deciles_approx",
    "ks_drift_event_values_distributed",
    "psi_drift_event_values",
    "tfidf_topk_terms",
    "multimodal_pixels",
    "skipgram_cooccurrence",
    "minhash_jaccard_estimate",
    # round-7 batch additions (stream_* excluded: building the DataFrame
    # replays the stream, same reason as graph_bfs_hops)
    "split_leakage_neardup",
    "cluster_aware_split",
    "mannwhitney_u_event_values",
    "theilsen_trend_event_values",
    "kappa_lang_agreement",
    "weighted_sample_ares",
    "cusum_changepoint_event_values",
    # round 8 (graph CC/kcore/modularity excluded: traversal-at-build)
    "zorder_layout_spans",
    "sorted_neighborhood_pairs",
    "cm_selfjoin_size",
    "seasonal_decompose_daily",
    "kaplan_meier_sessions",
    "acf_daily_lags",
    "gini_user_spend",
    "hill_tail_index",
    "hybrid_rrf_fusion",
    "target_encode_loo",
    "markov_event_transitions",
    "burstiness_interevent",
    "mann_kendall_trend",
    # round 9
    "dedup_consecutive_events",
    "incremental_agg_merge",
    "cdc_chunk_dedup",
    "gram_novelty_by_bucket",
    "rolling_distinct_users_7d",
    "bitmap_intersection_audiences",
    "dup_cluster_size_histogram",
    "group_kfold_assign",
    "compression_ratio_quality",
    "graph_neighbor_jaccard",
    "twap_user_value",
    # round 11 (lpa/coreness/pca excluded: eager-build -- iteration or
    # collect at plan-construction time, same reason as graph CC)
    "ppr_parts_3iter",
    "ppr_multiseed",
    "hits_bipartite_2iter",
    "cross_source_dup_matrix",
    "degree_assortativity",
    "edge_triangle_support",
    "source_mixture_weights",
    # round 13 (bpe_encode_heldout excluded: eager-build -- the memoized
    # merge loop runs at plan-construction time; dsir/kmeans likewise)
    "exact_substring_spans",
    "embedding_matryoshka_recall",
    "zipf_slope_topk",
    # round 14
    "exact_substring_removal",
    "exact_substring_removal_by_source",
    "matryoshka_rerank_topk",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from state_economics_end_to_end_data_pipeline_spark.plans import load_all
    from state_economics_end_to_end_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="explain-dump")
    qs = load_all()
    names = args.names or [n for n in HEADLINERS if n in qs]

    header = [
        "# Physical plans — headline queries",
        "",
        f"`explain(\"formatted\")` at `{args.sf_dir}`, generated by",
        "`python tools/explain_dump.py`. What to look for: `PushedFilters`",
        "reaching each scan, pruned `ReadSchema`, `BroadcastHashJoin` for",
        "dim joins, paired partial/final `HashAggregate`, and exchange",
        "counts matching the per-query docstrings.",
        "",
    ]
    sections: dict[str, str] = {}
    for name in names:
        if qs[name].eager_build:
            print(f"note: {name} is eager_build — dumping it executes bounded build-time jobs")
        df = qs[name].fn(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        sections[name] = "\n".join(
            [f"## {name}", "", qs[name].doc.strip(), "", "```", buf.getvalue().rstrip(), "```", ""]
        )
        print(f"dumped {name}")

    # MERGE, never clobber (r14): an explicit-names run refreshes only
    # those sections; every other committed section survives. Section
    # order is the HEADLINERS order, unknown names appended.
    target = REPO / "docs" / "PLANS.md"
    if args.names and target.exists():
        old = target.read_text()
        for chunk in old.split("\n## ")[1:]:
            old_name = chunk.split("\n", 1)[0].strip()
            if old_name not in sections:
                sections[old_name] = "## " + chunk.rstrip() + "\n"
    order = {n: i for i, n in enumerate(HEADLINERS)}
    ordered = sorted(sections, key=lambda n: (order.get(n, len(order)), n))
    target.write_text("\n".join(header + [sections[n] for n in ordered]))
    print(f"wrote docs/PLANS.md ({len(sections)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
