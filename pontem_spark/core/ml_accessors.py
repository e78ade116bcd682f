"""Pandas-style accessor namespaces exposing the engine's LLM-data-pipeline
operators on the public DataFrame API: ``df.dedup.minhash_candidates(...)``,
``df.sim.topk(...)``, ``df.merge_asof(...)``.

Each method unwraps the pandas-like frame to its Spark anchor, runs the
operator from :mod:`pontem_spark.operators` (all scale-shaped: equi-join
candidates, tiled/bucketed kernels, map-side argmin), and re-wraps the
result with a fresh rowid index via :func:`pontem_spark.core.io.from_spark`
— mirroring pandas' index-reset on relational outputs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pontem_spark.core.frame import DataFrame


def _wrap(sdf) -> "DataFrame":
    from pontem_spark.core.io import from_spark

    return from_spark(sdf)


def _unwrap(df) -> "object":
    # pandas-like frame → Spark frame (named columns; rowid column is inert)
    from pontem_spark.core.frame import DataFrame as PFrame

    return df.to_spark() if isinstance(df, PFrame) else df


class DedupAccessor:
    """``df.dedup.*`` — the four dedup tiers plus clustering."""

    def __init__(self, df: "DataFrame"):
        self._df = df

    def exact(self, id_col: str, text_col: str, normalized: bool = True) -> "DataFrame":
        """(content_hash, n_docs, keep_id) groups; only hashes shuffle."""
        from pontem_spark.operators.dedup import exact_duplicates

        return _wrap(exact_duplicates(_unwrap(self._df), id_col, text_col, normalized))

    def jaccard_pairs(
        self, id_col: str, text_col: str, threshold: float = 0.8, ngram: int = 3
    ) -> "DataFrame":
        from pontem_spark.operators.dedup import jaccard_similar_pairs

        return _wrap(
            jaccard_similar_pairs(_unwrap(self._df), id_col, text_col, threshold, ngram)
        )

    def minhash_candidates(
        self,
        id_col: str,
        text_col: str,
        num_hashes: int = 8,
        rows_per_band: int = 4,
        ngram: int = 3,
    ) -> "DataFrame":
        """LSH-banded candidate pairs (id_a, id_b) — linear shuffle."""
        from pontem_spark.operators.dedup import minhash_candidate_pairs

        return _wrap(
            minhash_candidate_pairs(
                _unwrap(self._df), id_col, text_col, num_hashes, rows_per_band, ngram
            )
        )

    def simhash_near_pairs(
        self, id_col: str, text_col: str, max_hamming: int = 8
    ) -> "DataFrame":
        """(id_a, id_b, hamming) within ``max_hamming`` — banded candidates
        (pigeonhole-complete) + exact verify, never an O(n^2) scan."""
        from pyspark.sql import functions as F

        from pontem_spark.operators import dedup as D

        fp = D.simhash(_unwrap(self._df), id_col, text_col).cache()
        cand = D.simhash_band_candidates(
            fp, id_col, "simhash64", bits=64, n_bands=max_hamming + 1
        )
        a = fp.select(F.col(id_col).alias("id_a"), F.col("simhash64").alias("h_a"))
        b = fp.select(F.col(id_col).alias("id_b"), F.col("simhash64").alias("h_b"))
        out = (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .withColumn("hamming", D.hamming_distance(F.col("h_a"), F.col("h_b")).cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
        )
        return _wrap(out)

    def clusters(
        self, id_col: str, text_col: str, threshold: float = 0.8, ngram: int = 3
    ) -> "DataFrame":
        """(id, cluster_id): connected components over the Jaccard pair
        graph; cluster_id = min id in the component (the survivor)."""
        from pyspark.sql import functions as F

        from pontem_spark.operators.dedup import jaccard_similar_pairs
        from pontem_spark.operators.graph import connected_components

        sdf = _unwrap(self._df)
        pairs = jaccard_similar_pairs(sdf, id_col, text_col, threshold, ngram)
        comps = connected_components(
            sdf.select(id_col), pairs.select("id_a", "id_b"),
            node_col=id_col, src_col="id_a", dst_col="id_b",
        )
        return _wrap(comps.select(id_col, F.col("component").alias("cluster_id")))


class SimilarityAccessor:
    """``df.sim.*`` — ANN top-k and near-dup pair search over an embedding
    column (``array<float>``)."""

    def __init__(self, df: "DataFrame"):
        self._df = df

    def topk(self, queries, id_col: str = "vec_id", vec_col: str = "embedding",
             k: int = 5, dim: int | None = None) -> "DataFrame":
        """Exact brute-force cosine top-k (broadcast queries, one scan)."""
        from pontem_spark.operators.similarity import brute_force_topk

        return _wrap(brute_force_topk(_unwrap(self._df), _unwrap(queries), id_col, vec_col, k, dim=dim))

    def topk_lsh(self, queries, id_col: str = "vec_id", vec_col: str = "embedding",
                 k: int = 5, n_planes: int = 4, dim: int = 64) -> "DataFrame":
        from pontem_spark.operators.similarity import lsh_bucket_topk

        return _wrap(lsh_bucket_topk(_unwrap(self._df), _unwrap(queries), id_col, vec_col, k, n_planes, dim))

    def topk_ivf(self, queries, id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label", k: int = 5, dim: int = 64, n_probe: int = 3) -> "DataFrame":
        from pontem_spark.operators.ivf import ivf_topk

        return _wrap(ivf_topk(_unwrap(self._df), _unwrap(queries), id_col, vec_col, label_col, k, dim, n_probe))

    def pairs(self, id_col: str = "vec_id", vec_col: str = "embedding",
              threshold: float = 0.4, method: str = "tiled", **kw) -> "DataFrame":
        """All-pairs cosine ≥ threshold: 'tiled' (exact, distributed) or
        'bucketed' (LSH-approximate, linear shuffle)."""
        from pontem_spark.operators.similarity import cosine_pairs_bucketed, cosine_pairs_tiled

        fn = {"tiled": cosine_pairs_tiled, "bucketed": cosine_pairs_bucketed}.get(method)
        if fn is None:
            raise ValueError(f"method {method!r} (use 'tiled' or 'bucketed')")
        return _wrap(fn(_unwrap(self._df), id_col, vec_col, threshold, **kw))
