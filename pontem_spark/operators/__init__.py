"""Custom operators beyond Spark's built-ins: dedup family, similarity search,
as-of join, multimodal column plumbing. Each is a composition of DataFrame
ops where semantics allow (the fast, Catalyst-visible path), with
``applyInPandas``/``mapInPandas`` only where genuinely necessary."""

from pontem_spark.operators.dedup import (
    exact_duplicates,
    jaccard_similar_pairs,
    minhash_signatures,
    minhash_candidate_pairs,
    simhash,
    simhash_band_candidates,
)
from pontem_spark.operators.similarity import (
    brute_force_topk,
    cosine_pairs_blocked,
    cosine_pairs_bucketed,
    cosine_pairs_tiled,
    lsh_bucket_topk,
)
from pontem_spark.operators.ivf import ivf_topk, label_centroids
from pontem_spark.operators.asof import asof_join
from pontem_spark.operators.graph import connected_components
from pontem_spark.operators.skew import salted_join, two_phase_agg
from pontem_spark.operators.bucketing import bucketed_join, write_bucketed

__all__ = [
    "exact_duplicates",
    "jaccard_similar_pairs",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "simhash",
    "simhash_band_candidates",
    "brute_force_topk",
    "cosine_pairs_blocked",
    "cosine_pairs_bucketed",
    "cosine_pairs_tiled",
    "lsh_bucket_topk",
    "ivf_topk",
    "label_centroids",
    "asof_join",
    "connected_components",
    "salted_join",
    "two_phase_agg",
    "bucketed_join",
    "write_bucketed",
]
