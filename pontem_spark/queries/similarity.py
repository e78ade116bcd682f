"""Similarity-search queries over `embeddings` — exact brute-force top-k and
the LSH-bucketed approximate variant, both oracle-checked (the LSH
hyperplanes are md5-derived, so even the approximate path is deterministic
across engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.operators import similarity as S
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table

_N_QUERIES = 10  # vec_id < 10 are the query set
_K = 5
_COS_SQL = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(generate_series(1, len({b})), "
    "i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
)


@register(
    "q_ann_brute_force_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({_COS_SQL.format(a='q.embedding', b='c.embedding')}, 6) AS cos_sim
        FROM embeddings q JOIN embeddings c ON q.vec_id < {_N_QUERIES} AND c.vec_id != q.vec_id
    ), ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {_K}
    """,
    tags=("similarity", "ann", "topk"),
)
def q_ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors: broadcast queries, one corpus
    scan, per-query window rank. Linear in corpus size at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.brute_force_topk(emb, queries, k=_K, dim=64)


from pontem_spark.queries.oracle_fragments import lsh_sig_sql  # shared, no registrations


def _lsh_oracle(n_planes: int = 4, dim: int = 64) -> str:
    def sig(vec: str) -> str:
        return lsh_sig_sql(vec, n_planes, dim)

    return f"""
    WITH b AS (
        SELECT vec_id, embedding, {sig('embedding')} AS bucket FROM embeddings
    ), cand AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({_COS_SQL.format(a='q.embedding', b='c.embedding')}, 6) AS cos_sim
        FROM b q JOIN b c ON q.bucket = c.bucket
        WHERE q.vec_id < {_N_QUERIES} AND c.vec_id != q.vec_id
    ), ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
        FROM cand
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {_K}
    """


@register(
    "q_ann_lsh_topk",
    oracle=_lsh_oracle(4, 64),
    tags=("similarity", "ann", "lsh"),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH buckets: a query scores
    only its own bucket (~corpus/16 here) — the equi-join-on-bucket shape
    that scales sub-linearly. Deterministic hyperplanes → oracle-checkable."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.lsh_bucket_topk(emb, queries, k=_K, n_planes=4, dim=64)


@register(
    "q_embedding_label_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           ROUND(AVG(sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
                 i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))), 4) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
    tags=("similarity", "agg", "vector"),
)
def q_embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector counts and mean L2 norm — array math fully JVM-side."""
    from pontem_spark.functions import vector as V

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        rnd(F.avg(V.norm("embedding")), 4).alias("avg_norm"),
    )


def _ivf_oracle(dim: int = 64, n_probe: int = 3, cdigits: int = 6) -> str:
    cos = (
        "(list_sum(list_transform(generate_series(1, {d}), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
        "(sqrt(list_sum(list_transform(generate_series(1, {d}), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(generate_series(1, {d}), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))))"
    )
    qc = cos.format(a="e.embedding", b="c.centroid", d=dim)
    nc = cos.format(a="q.embedding", b="c.embedding", d=dim)
    return f"""
    WITH cent_parts AS (
        SELECT label, i, ROUND(avg(CAST(embedding[i] AS DOUBLE)), {cdigits}) AS m
        FROM embeddings, generate_series(1, {dim}) AS t(i)
        GROUP BY label, i
    ), centroids AS (
        SELECT label AS centroid_id, list(m ORDER BY i) AS centroid
        FROM cent_parts GROUP BY label
    ), corpus_cells AS (
        SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY ROUND({qc}, {cdigits}) DESC, c.centroid_id) AS r
            FROM embeddings e CROSS JOIN centroids c
        ) WHERE r <= 1
    ), query_cells AS (
        SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY ROUND({qc}, {cdigits}) DESC, c.centroid_id) AS r
            FROM embeddings e CROSS JOIN centroids c
            WHERE e.vec_id < {_N_QUERIES}
        ) WHERE r <= {n_probe}
    ), cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({nc}, 6) AS cos_sim
        FROM query_cells q JOIN corpus_cells c ON q.centroid_id = c.centroid_id
        WHERE c.vec_id != q.vec_id
    ), ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
        FROM cand
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {_K}
    """


@register(
    "q_ann_ivf_topk",
    oracle=_ivf_oracle(64, 3),
    tags=("similarity", "ann", "ivf"),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: per-label mean centroids (broadcast), map-side cell
    assignment, probe = equi-join on cell id — |corpus|*n_probe/K scored
    per query instead of |corpus|. Deterministic (rounded centroids) →
    the entire two-stage index is oracle-checked."""
    from pontem_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(emb, queries, k=_K, dim=64, n_probe=3)
