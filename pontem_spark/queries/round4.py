"""Round-4 queries: operators added this round.

Registered ahead of stale r01 greens so the driver's 50-row correctness
window verifies them on first rotation (see registry.all_queries ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.queries.oracle_fragments import SHINGLES_CTE, minhash_cand_ctes
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table


@register(
    "q_dedup_minhash_jaccard",
    oracle=f"""
    WITH {SHINGLES_CTE},
    {minhash_cand_ctes(8, 4)},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    ), scored AS (
        SELECT id_a, id_b,
               ROUND(n_common * 1.0 / (sa.set_size + sb.set_size - n_common), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    )
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.8
    """,
    tags=("dedup", "minhash", "jaccard", "composed"),
)
def q_dedup_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE at-scale dedup pipeline: MinHash-LSH candidates → exact Jaccard
    verify on candidates only. No shingle self-join anywhere in the plan —
    the hot-shingle quadratic tier of q_dedup_jaccard_pairs is retired; the
    verify cost is linear in candidate volume. Both halves md5-exact, so the
    full composition is oracle-checked."""
    from pontem_spark.operators.dedup import minhash_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.8, num_hashes=8, rows_per_band=4, ngram=3
    )


from pontem_spark.queries.oracle_fragments import (
    SIMHASH_MD5_FP_CTES as _SIMHASH_MD5_FP_CTES,  # shared with queries/dedup.py
)


@register(
    "q_simhash_md5_fingerprints",
    oracle=f"""
    WITH {_SIMHASH_MD5_FP_CTES}
    SELECT doc_id, simhash60 FROM fp
    """,
    tags=("dedup", "simhash", "fingerprint"),
)
def q_simhash_md5_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable SimHash fingerprints (60-bit, md5 token hashes) —
    hash-checked bit-for-bit against DuckDB. Closes the round-2 gap where
    SimHash had only rows-only evidence: the xxhash64 production variant
    keeps its speed, this twin proves the algorithm."""
    from pontem_spark.operators.dedup import simhash_md5

    docs = load_table(spark, sf_dir, "documents")
    return simhash_md5(docs, "doc_id", "text", bits=60)


@register(
    "q_dedup_simhash_md5_pairs",
    oracle=f"""
    WITH {_SIMHASH_MD5_FP_CTES}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash60, b.simhash60)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash60, b.simhash60)) <= 8
    """,
    tags=("dedup", "simhash", "banding"),
)
def q_dedup_simhash_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 8) where the SPARK side uses the
    linear-shuffle banded equi-join (9 bands over 60 bits; pigeonhole
    guarantees a Hamming-8 pair shares ≥1 exact band) and the ORACLE does
    the naive all-pairs scan — an exact cross-engine proof that banding
    loses zero recall, not just a property test."""
    from pontem_spark.operators.dedup import (
        hamming_distance,
        simhash_band_candidates,
        simhash_md5,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = simhash_md5(docs, "doc_id", "text", bits=60)
    cand = simhash_band_candidates(
        fp, "doc_id", "simhash60", bits=60, n_bands=9, carry_hash=True
    )
    return (
        cand.withColumn("hamming", hamming_distance(F.col("h_a"), F.col("h_b")).cast("int"))
        .filter(F.col("hamming") <= 8)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


_HIER_COS = (
    "(list_sum(list_transform(generate_series(1, {d}), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(generate_series(1, {d}), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(generate_series(1, {d}), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))))"
)


def _ivf_hier_oracle(
    m: int = 16,
    dim: int = 64,
    n_probe: int = 3,
    k: int = 5,
    n_queries: int = 10,
    n_probe_groups: int = 1,
    centroids_cte: str | None = None,
) -> str:
    """DuckDB twin of ivf_topk_hier: same composite cell key, same
    (first-component, id)-ordered chunking into ceil(sqrt(K)) groups, same
    two-stage argmin with (-sim, id) tie-breaks. ``n_probe_groups`` mirrors
    the multi-group probe: query vectors rank cells over the UNION of their
    g nearest groups' members (corpus vectors always stay single-group).
    ``centroids_cte`` swaps the centroid source: CTE text that must end
    with a CTE named ``centroids(centroid_id, centroid)`` (default: the
    composite-label mean build)."""
    vg_cos = _HIER_COS.format(a="e.embedding", b="g.gcentroid", d=dim)
    cc_cos = _HIER_COS.format(a="v.embedding", b="c.centroid", d=dim)
    nn_cos = _HIER_COS.format(a="q.embedding", b="c.embedding", d=dim)
    if centroids_cte is None:
        centroids_cte = f"""cent_parts AS (
        SELECT label * {m} + (vec_id % {m}) AS centroid_id, i,
               ROUND(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
        FROM embeddings, generate_series(1, {dim}) AS t(i)
        GROUP BY 1, i
    ), centroids AS (
        SELECT centroid_id, list(m ORDER BY i) AS centroid FROM cent_parts GROUP BY 1
    )"""
    return f"""
    WITH {centroids_cte}, meta AS (
        SELECT COUNT(*) AS kk, CAST(ceil(sqrt(COUNT(*))) AS BIGINT) AS ng FROM centroids
    ), corder AS (
        SELECT centroid_id, centroid,
               ROW_NUMBER() OVER (ORDER BY centroid[1], centroid_id) - 1 AS rn
        FROM centroids
    ), cgrouped AS (
        SELECT centroid_id, centroid,
               CAST(rn // CAST(ceil(kk * 1.0 / ng) AS BIGINT) AS INTEGER) AS group_id
        FROM corder, meta
    ), gcent_parts AS (
        SELECT group_id, i, ROUND(avg(CAST(centroid[i] AS DOUBLE)), 6) AS m
        FROM cgrouped, generate_series(1, {dim}) AS t(i)
        GROUP BY 1, 2
    ), gcentroids AS (
        SELECT group_id, list(m ORDER BY i) AS gcentroid FROM gcent_parts GROUP BY 1
    ), vg AS (
        SELECT vec_id, embedding, group_id FROM (
            SELECT e.vec_id, e.embedding, g.group_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY ROUND({vg_cos}, 6) DESC, g.group_id) AS r
            FROM embeddings e CROSS JOIN gcentroids g
        ) WHERE r = 1
    ), corpus_cells AS (
        SELECT vec_id, embedding, centroid_id FROM (
            SELECT v.vec_id, v.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY ROUND({cc_cos}, 6) DESC, c.centroid_id) AS r
            FROM vg v JOIN cgrouped c ON c.group_id = v.group_id
        ) WHERE r <= 1
    ), vgq AS (
        SELECT vec_id, embedding, group_id FROM (
            SELECT e.vec_id, e.embedding, g.group_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY ROUND({vg_cos}, 6) DESC, g.group_id) AS r
            FROM embeddings e CROSS JOIN gcentroids g
            WHERE e.vec_id < {n_queries}
        ) WHERE r <= {n_probe_groups}
    ), query_cells AS (
        SELECT vec_id, embedding, centroid_id FROM (
            SELECT v.vec_id, v.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY ROUND({cc_cos}, 6) DESC, c.centroid_id) AS r
            FROM vgq v JOIN cgrouped c ON c.group_id = v.group_id
        ) WHERE r <= {n_probe}
    ), cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({nn_cos}, 6) AS cos_sim
        FROM query_cells q JOIN corpus_cells c ON q.centroid_id = c.centroid_id
        WHERE c.vec_id != q.vec_id
    ), ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
        FROM cand
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


@register(
    "q_ann_ivf_hier_topk",
    oracle=_ivf_hier_oracle(16, 64, 3, 5, 10),
    tags=("similarity", "ann", "ivf", "hierarchical"),
)
def q_ann_ivf_hier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical IVF ANN (the large-K production build): ~160 fine cells
    from a composite (label, vec_id%16) key, coarse sqrt(K) quantizer routes
    map-side, within-group argmin picks the cell — per-row assignment work
    O(sqrt(K)·dim), centroids carried as array literals (data, not plan), so
    the same code serves K in the tens of thousands. Fully oracle-checked,
    including the hierarchy's exact routing rule."""
    from pontem_spark.operators.ivf import ivf_topk_hier

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "cell_key", F.col("label") * 16 + F.col("vec_id") % 16
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk_hier(
        emb, queries, cell_key_col="cell_key", k=5, dim=64, n_probe=3
    )


@register(
    "q_sequence_packing",
    oracle="""
    WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tok
        FROM documents
    ), c AS (
        SELECT doc_id, shard, n_tok,
               SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT doc_id, shard, n_tok,
           CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS bin_id
    FROM c
    """,
    tags=("curation", "packing", "window"),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (contiguous fill, sharded running-sum
    window — one bounded shuffle; see operators/curation.py). Promoted from
    local-only tests to a driver-checked query."""
    from pontem_spark.operators.curation import sequence_packing

    docs = load_table(spark, sf_dir, "documents")
    return sequence_packing(docs, "doc_id", "text", budget=512, shards=8)
