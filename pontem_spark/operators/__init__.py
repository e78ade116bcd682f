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
)
from pontem_spark.operators.similarity import brute_force_topk, lsh_bucket_topk
from pontem_spark.operators.asof import asof_join

__all__ = [
    "exact_duplicates",
    "jaccard_similar_pairs",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "simhash",
    "brute_force_topk",
    "lsh_bucket_topk",
    "asof_join",
]
