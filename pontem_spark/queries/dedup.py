"""Dedup queries over `documents` — each tier of operators/dedup.py as an
oracle-checked query. The corpus plants near-duplicate pairs (trigram Jaccard
≥ 0.9 against a ≤ 0.07 background), so thresholds at 0.8 separate cleanly.

The MinHash/LSH pipeline is md5-based end-to-end, which makes even the LSH
candidate generation *exactly* reproducible in DuckDB — the whole
probabilistic pipeline is oracle-checked, not just spot-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.operators import dedup as D
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table

# shared with the public-API query family (no registrations there)
from pontem_spark.queries.oracle_fragments import SHINGLES_CTE as _SHINGLES_CTE
from pontem_spark.queries.oracle_fragments import SIMHASH_MD5_FP_CTES as _SIMHASH_MD5_FP_CTES
from pontem_spark.queries.oracle_fragments import minhash_oracle as _minhash_oracle_shared


@register(
    "q_dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keep_id
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup", "exact"),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (normalized) dedup: hash-groupBy; only 32-byte hashes shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_duplicates(docs, "doc_id", "text", normalized=True)


@register(
    "q_dedup_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 50),
    shc AS (SELECT sh.doc_id, sh.shingle FROM sh
            WHERE sh.shingle NOT IN (SELECT shingle FROM hot)),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
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
    tags=("dedup", "jaccard", "ngram"),
)
def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-shingle Jaccard near-dup pairs (threshold 0.8) via
    inverted-index self-join WITH the hot-shingle cap (max_doc_freq=50):
    shingles in more than 50 documents are boilerplate, carry no dedup
    signal, and are exactly the keys that would make the self-join
    quadratic — dropping them bounds the worst bucket at 50². The oracle
    applies the identical cap. (Non-binding at the tested SFs — max df is
    25 at sf0.1 — so results equal the uncapped query there; at 100 TB the
    cap is what keeps this runnable.)"""
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_similar_pairs(
        docs, "doc_id", "text", threshold=0.8, ngram=3, max_doc_freq=50
    )


_minhash_oracle = _minhash_oracle_shared


@register(
    "q_dedup_minhash_candidates",
    oracle=_minhash_oracle(8, 4),
    tags=("dedup", "minhash", "lsh"),
)
def q_dedup_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8 hashes) + LSH banding (2 bands × 4 rows) candidate pairs.
    Cross-engine deterministic because every hash is md5."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_candidate_pairs(docs, "doc_id", "text", num_hashes=8, rows_per_band=4, ngram=3)


@register(
    "q_dedup_simhash_nearpairs",
    oracle="""
    WITH {fp_ctes},
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash60, b.simhash60)) <= 8
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id NOT IN (SELECT id_b FROM pairs)
    """.format(fp_ctes=_SIMHASH_MD5_FP_CTES),
    tags=("dedup", "simhash", "survivorship"),
)
def q_dedup_simhash_nearpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup REMOVAL, end-to-end: engine-portable 60-bit md5
    fingerprints (operators/dedup.py::simhash_md5) → banded candidates
    (9 bands over 60 bits; pigeonhole guarantees a Hamming-8 pair shares
    ≥1 exact band — an equi-join, no O(n^2) scan) → exact Hamming ≤ 8
    verify → greedy smaller-id survivorship (a doc with ANY near-dup of
    smaller id is dropped; one anti-join past the pair set — no
    connected-components fixpoint, the cheap decision rule production
    dedup pipelines default to). Returns the surviving doc_ids.

    Fully oracle-checked (VERDICT r6 #1 — this retired the last
    no-oracle trio entry): the oracle recomputes the identical md5
    fingerprints but finds pairs by the NAIVE all-pairs scan, so the hash
    match is also a cross-engine proof that banding loses zero recall.
    The xxhash64 production fingerprint (one JVM intrinsic per token vs
    md5+conv, :func:`pontem_spark.operators.dedup.simhash`) keeps its
    structural + Hamming-property tests; swap it in at 100 TB where the
    oracle harness doesn't run."""
    docs = load_table(spark, sf_dir, "documents")
    fp = D.simhash_md5(docs, "doc_id", "text", bits=60)
    cand = D.simhash_band_candidates(fp, "doc_id", "simhash60", bits=60, n_bands=9, carry_hash=True)
    dropped = (
        cand.filter(D.hamming_distance(F.col("h_a"), F.col("h_b")) <= 8)
        .select(F.col("id_b").alias("doc_id"))  # id_a < id_b: the larger id loses
        .distinct()
    )
    return docs.select("doc_id").join(dropped, "doc_id", "left_anti")


@register(
    "q_dedup_embedding_cosine",
    oracle="""
    WITH pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(
                 list_sum(list_transform(generate_series(1, len(a.embedding)),
                          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
                          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)),
                          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
               , 4) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.4
    """,
    tags=("dedup", "embedding", "cosine"),
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.4), EXACT all-pairs with no
    driver ceiling: block-tiled self-join — every pair meets in exactly one
    tile, the BLAS kernel runs per tile via applyInPandas (see
    cosine_pairs_tiled). Shuffle is n_blocks x corpus; per-task memory is
    two blocks. The approximate linear-shuffle variant is
    q_dedup_cosine_bucketed."""
    from pontem_spark.operators.similarity import cosine_pairs_tiled

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_tiled(emb, "vec_id", "embedding", threshold=0.4, round_digits=4)


@register(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(n_common * 1.0 / (sa.set_size + sb.set_size - n_common), 4) >= 0.8
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
    """,
    tags=("dedup", "clustering", "iterative", "graph"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: connected components over the trigram-Jaccard
    (>= 0.8) pair graph — iterative min-label propagation on the Spark side,
    a recursive CTE on the oracle side. Two completely different algorithms
    (distributed fixpoint vs recursive SQL) must produce identical
    components; singletons keep their own id as cluster_id."""
    from pontem_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_similar_pairs(docs, "doc_id", "text", threshold=0.8, ngram=3)
    nodes = docs.select("doc_id")
    comps = connected_components(
        nodes, pairs.select("id_a", "id_b"), node_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    return comps.select("doc_id", F.col("component").alias("cluster_id"))


@register(
    "q_minhash_quality",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), exact_pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(n_common * 1.0 / (sa.set_size + sb.set_size - n_common), 4) >= 0.8
    ), sig AS (
        SELECT doc_id,
               {", ".join(f"MIN(md5(shingle || '#{i}')) AS mh{i}" for i in range(8))}
        FROM sh GROUP BY doc_id
    ), bands AS (
        SELECT doc_id, 0 AS band_idx, md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3) AS bucket FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) AS bucket FROM sig
    ), cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    )
    SELECT (SELECT COUNT(*) FROM exact_pairs) AS n_true_pairs,
           (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM exact_pairs e JOIN cand c
              ON e.id_a = c.id_a AND e.id_b = c.id_b) AS n_hits,
           ROUND((SELECT COUNT(*) FROM exact_pairs e JOIN cand c
              ON e.id_a = c.id_a AND e.id_b = c.id_b) * 1.0
             / GREATEST((SELECT COUNT(*) FROM exact_pairs), 1), 4) AS recall,
           ROUND((SELECT COUNT(*) FROM exact_pairs e JOIN cand c
              ON e.id_a = c.id_a AND e.id_b = c.id_b) * 1.0
             / GREATEST((SELECT COUNT(*) FROM cand), 1), 4) AS precision
    """,
    tags=("dedup", "minhash", "quality", "measurement"),
)
def q_minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality measurement: recall and precision of MinHash(8,2x4)
    candidates against exact trigram-Jaccard >= 0.8 ground truth — the
    evaluation loop a production dedup pipeline runs on samples before
    committing to LSH parameters. Fully oracle-checked because both the
    approximate and exact sides are deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    exact = D.jaccard_similar_pairs(docs, "doc_id", "text", threshold=0.8, ngram=3).select(
        "id_a", "id_b"
    ).cache()
    cand = D.minhash_candidate_pairs(docs, "doc_id", "text", num_hashes=8, rows_per_band=4).cache()
    hits = exact.join(cand, ["id_a", "id_b"]).count()
    n_true = exact.count()
    n_cand = cand.count()
    row = {
        "n_true_pairs": n_true,
        "n_candidates": n_cand,
        "n_hits": hits,
        "recall": float(__import__("math").floor(hits / max(n_true, 1) * 1e4 + 0.5) / 1e4),
        "precision": float(__import__("math").floor(hits / max(n_cand, 1) * 1e4 + 0.5) / 1e4),
    }
    return spark.createDataFrame(
        [tuple(row.values())],
        "n_true_pairs bigint, n_candidates bigint, n_hits bigint, recall double, precision double",
    )


@register(
    "q_dedup_jaccard_prefix",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_common * 1.0 / (sa.set_size + sb.set_size - n_common), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common) >= 0.8
    """,
    tags=("dedup", "jaccard", "prefix-filter"),
)
def q_dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard (PPJoin family): only the (1-t) rarest
    fraction of each doc's shingles — ordered by global document frequency
    — enters the self-join, with zero false negatives by the prefix
    theorem; candidates length-filtered then verified map-side against the
    full shingle arrays (operators/dedup.py::jaccard_prefix_pairs). The
    oracle computes the UNFILTERED quadratic Jaccard directly, so the hash
    match proves the pruning loses nothing."""
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_prefix_pairs(docs, "doc_id", "text", threshold=0.8)


@register(
    "q_dedup_containment",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 50),
    shc AS (SELECT sh.doc_id, sh.shingle FROM sh
            WHERE sh.shingle NOT IN (SELECT shingle FROM hot)),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    dirs AS (
        SELECT id_a AS id_contained, id_b AS id_container,
               n_common * 1.0 / sa.set_size AS c
        FROM inter JOIN sizes sa ON sa.doc_id = id_a
        UNION ALL
        SELECT id_b AS id_contained, id_a AS id_container,
               n_common * 1.0 / sb.set_size AS c
        FROM inter JOIN sizes sb ON sb.doc_id = id_b
    )
    SELECT id_contained, id_container, ROUND(c, 4) AS containment
    FROM dirs WHERE c >= 0.85
    """,
    tags=("dedup", "containment", "ngram"),
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment |A∩B|/|A| ≥ 0.85 — sub-document
    detection (a doc pasted inside a bigger one has tiny Jaccard but
    containment ~1). Same capped inverted-index plan as the Jaccard tier,
    scored in both directions (operators/dedup.py::containment_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.containment_pairs(docs, "doc_id", "text", threshold=0.85)
