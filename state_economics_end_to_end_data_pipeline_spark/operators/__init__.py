from .dedup import (
    cluster_labels,
    content_hash,
    dedup_survivors,
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_table,
)
from .multimodal import decode_media, media_table, sample_frame_indexes, thumbnail_dims
from .partitioning import rebalance_for_cpu, salted_join
from .profile import frequent_values, histogram, numeric_profile, profile_report
from .quality import check_primary_key, duplicate_keys
from .reshape import surrogate_key, unpivot_wide_years
from .similarity import cosine_topk, ivf_topk, neardup_pairs_lsh
from .text import lang_guess, quality_features, redact_pii, token_count, tokens

__all__ = [
    "check_primary_key",
    "cluster_labels",
    "content_hash",
    "cosine_topk",
    "decode_media",
    "dedup_survivors",
    "duplicate_keys",
    "exact_dedup",
    "frequent_values",
    "histogram",
    "ivf_topk",
    "jaccard_pairs",
    "lang_guess",
    "lsh_candidate_pairs",
    "media_table",
    "minhash_signatures",
    "neardup_pairs_lsh",
    "numeric_profile",
    "profile_report",
    "quality_features",
    "rebalance_for_cpu",
    "redact_pii",
    "salted_join",
    "sample_frame_indexes",
    "simhash_table",
    "surrogate_key",
    "thumbnail_dims",
    "token_count",
    "tokens",
    "unpivot_wide_years",
]
