"""Round-5 queries: reshaping (melt / explode) and grouped-transform
promotions, the hierarchical-IVF multi-group probe, and trained-centroid
IVF — each a new driver-checked (Spark vs DuckDB oracle) entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.queries.registry import register
from pontem_spark.queries.round4 import _ivf_hier_oracle
from pontem_spark.sources.tables import load_table


@register(
    "q_ann_ivf_hier_g2_topk",
    oracle=_ivf_hier_oracle(16, 64, 3, 5, 10, n_probe_groups=2),
    tags=("similarity", "ann", "ivf", "hierarchical"),
)
def q_ann_ivf_hier_g2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical IVF ANN with the boundary-recall mitigation: queries
    take their 2 nearest coarse GROUPS, pool both groups' cells, and probe
    the n_probe nearest of the union — so a query on a group boundary also
    sees the adjacent group's cells (the single-group trade documented in
    ivf.py). The DuckDB oracle mirrors the exact two-stage rule."""
    from pontem_spark.operators.ivf import ivf_topk_hier

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "cell_key", F.col("label") * 16 + F.col("vec_id") % 16
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk_hier(
        emb, queries, cell_key_col="cell_key", k=5, dim=64, n_probe=3,
        n_probe_groups=2,
    )


def _kmeans_centroids_cte(k: int, pct: int, dim: int) -> str:
    """DuckDB twin of operators/ivf.py:train_centroids (iters=2, unrolled):
    same md5-bucket sample, same smallest-id init, same rounded-cosine
    argmin assignment, same per-(cell, pos) AVG rebuild with empty cells
    keeping their previous centroid. Ends in ``centroids(centroid_id,
    centroid)`` for _ivf_hier_oracle."""
    from pontem_spark.operators.sampling import hash_bucket_sql
    from pontem_spark.queries.round4 import _HIER_COS

    hb = hash_bucket_sql("vec_id", 100)
    sc = _HIER_COS.format(a="s.embedding", b="c.centroid", d=dim)

    def lloyd(prev: str, n: int) -> str:
        return f"""a{n} AS (
        SELECT vec_id, embedding, centroid_id FROM (
            SELECT s.vec_id, s.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                      ORDER BY ROUND({sc}, 6) DESC, c.centroid_id) AS r
            FROM samp s CROSS JOIN {prev} c
        ) WHERE r = 1
    ), c{n}p AS (
        SELECT centroid_id, i, ROUND(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
        FROM a{n}, generate_series(1, {dim}) AS t(i) GROUP BY 1, 2
    ), c{n}n AS (
        SELECT centroid_id, list(m ORDER BY i) AS centroid FROM c{n}p GROUP BY 1
    ), c{n} AS (
        SELECT p.centroid_id, COALESCE(n.centroid, p.centroid) AS centroid
        FROM {prev} p LEFT JOIN c{n}n n ON n.centroid_id = p.centroid_id
    )"""

    return f"""samp AS (
        SELECT vec_id, embedding FROM embeddings WHERE {hb} < {pct}
    ), init AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS centroid_id,
               list_transform(embedding, x -> ROUND(CAST(x AS DOUBLE), 6)) AS centroid
        FROM samp ORDER BY vec_id LIMIT {k}
    ), {lloyd('init', 1)}, {lloyd('c1', 2)},
    centroids AS (SELECT centroid_id, centroid FROM c2)"""


@register(
    "q_ann_ivf_trained_topk",
    oracle=_ivf_hier_oracle(
        dim=64, n_probe=3, k=5, n_queries=10,
        centroids_cte=_kmeans_centroids_cte(k=24, pct=30, dim=64),
    ),
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def q_ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with TRAINED centroids (VERDICT r04 #5): sampled Lloyd k-means
    (deterministic md5-bucket sample, smallest-id init, 2 iterations as
    DataFrame aggs) feeds the hierarchical assign/probe machinery — no
    label crutch anywhere. The oracle replays the identical training
    (unrolled to 2 iterations) and the identical two-stage probe, so the
    whole index build is hash-checked cross-engine."""
    from pontem_spark.operators.ivf import ivf_topk_hier, train_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids(
        emb, "vec_id", "embedding", dim=64, k=24, sample_pct=30, iters=2
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk_hier(
        emb, queries, k=5, dim=64, n_probe=3, centroids=cents
    )


@register(
    "q_api_melt_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable,
           ROUND(CAST(l_quantity AS DOUBLE), 2) AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice',
           ROUND(CAST(l_extendedprice AS DOUBLE), 2) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount',
           ROUND(CAST(l_discount AS DOUBLE), 2) FROM lineitem
    """,
    tags=("api", "reshape", "melt"),
)
def q_api_melt_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """melt (wide → long) through the wrapper == one stack() Generate —
    each row fans out to one row per value column entirely map-side, no
    shuffle, no UDF (promoted to a driver query per VERDICT r04 #8)."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    li = from_spark(load_table(spark, sf_dir, "lineitem"))[
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"]
    ]
    out = li.melt(id_vars=["l_orderkey", "l_linenumber"])
    return out.to_spark().select(
        "l_orderkey", "l_linenumber", "variable",
        rnd(F.col("value"), 2).alias("value"),
    )


@register(
    "q_api_explode_tokens",
    oracle="""
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')[1:5]) AS tok
    FROM documents
    """,
    tags=("api", "reshape", "explode"),
)
def q_api_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode through the wrapper == explode_outer Generate (one row per
    array element, map-side). First five whitespace tokens per document."""
    from pontem_spark.core import from_spark

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 5).alias("tok")
    )
    out = from_spark(docs).explode("tok")
    return out.to_spark().select("doc_id", "tok").filter(F.col("tok").isNotNull())


@register(
    "q_api_grouped_transform",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(o_totalprice / AVG(o_totalprice) OVER (PARTITION BY o_orderpriority), 6)
               AS price_ratio
    FROM orders
    """,
    tags=("api", "groupby", "transform"),
)
def q_api_grouped_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby().transform through the wrapper: the per-group mean is a
    window aggregate broadcast back to every row (single shuffle on the
    group key, no join-back), and the ratio assignment stays one growing
    Catalyst plan on the shared anchor."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    df = from_spark(load_table(spark, sf_dir, "orders"))[
        ["o_orderkey", "o_orderpriority", "o_totalprice"]
    ]
    mean = df.groupby("o_orderpriority")["o_totalprice"].transform("mean")
    ratio = df["o_totalprice"] / mean
    out = df.assign(price_ratio=ratio)
    return out.to_spark().select(
        "o_orderkey", "o_orderpriority",
        rnd(F.col("price_ratio"), 6).alias("price_ratio"),
    )


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_PHONE = "\\+\\d{9,15}\\b"

_PII_ORACLE = (
    "SELECT doc_id, "
    "CAST(len(regexp_extract_all(text, '" + _PII_EMAIL + "')) AS INTEGER) AS n_email, "
    "CAST(len(regexp_extract_all(text, '" + _PII_IPV4 + "')) AS INTEGER) AS n_ipv4, "
    "CAST(len(regexp_extract_all(text, '" + _PII_PHONE + "')) AS INTEGER) AS n_phone, "
    "CAST(length(text) AS INTEGER) AS orig_len, "
    "CAST(length(regexp_replace(regexp_replace(regexp_replace(text, "
    "'" + _PII_EMAIL + "', '[PII]', 'g'), "
    "'" + _PII_IPV4 + "', '[PII]', 'g'), "
    "'" + _PII_PHONE + "', '[PII]', 'g')) AS INTEGER) AS redacted_len "
    "FROM documents"
)


@register(
    "q_curation_pii_redaction",
    oracle=_PII_ORACLE,
    tags=("curation", "pii", "text"),
)
def q_curation_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing as a pure-Column map-side pass (operators/curation.py
    redact_pii): per-pattern regexp_count + chained regexp_replace, zero
    UDF, zero shuffle. Patterns restricted to the Java-regex ∩ RE2 subset
    so the DuckDB oracle is exact. The fixture corpus is PII-free (counts
    all zero) — the planted-PII differential lives in tests/."""
    from pontem_spark.operators.curation import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    out = redact_pii(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.col("orig_len").cast("int").alias("orig_len"),
        F.col("redacted_len").cast("int").alias("redacted_len"),
    )


from pontem_spark.queries.oracle_fragments import SHINGLES_CTE as _SHINGLES_CTE


@register(
    "q_dedup_apply_removal",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 50),
    shc AS (SELECT sh.doc_id, sh.shingle FROM sh
            WHERE sh.shingle NOT IN (SELECT shingle FROM hot)),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
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
    ), clusters AS (
        SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
    )
    SELECT cluster_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
    FROM clusters GROUP BY 1
    """,
    tags=("dedup", "clustering", "pipeline"),
)
def q_dedup_apply_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the near-dup pipeline: connected components over the
    Jaccard-0.8 graph, keep ONE canonical doc per cluster (the min id —
    which IS the min-label component id, so survivorship is a filter, not
    another join), and report each survivor with the number of docs it
    absorbed. Composes jaccard_similar_pairs → connected_components →
    one groupBy; the oracle replays it as a recursive CTE. Uses the same
    hot-shingle cap (max_doc_freq=50) as q_dedup_jaccard_pairs so the
    at-scale path has no uncapped self-join anywhere."""
    from pontem_spark.operators import dedup as D
    from pontem_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_similar_pairs(
        docs, "doc_id", "text", threshold=0.8, ngram=3, max_doc_freq=50
    )
    comps = connected_components(
        docs.select("doc_id"), pairs.select("id_a", "id_b"),
        node_col="doc_id", src_col="id_a", dst_col="id_b",
    )
    return (
        comps.groupBy(F.col("component").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )


@register(
    "q_api_reset_index_enumerate",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS idx,
           o_orderkey, o_orderpriority
    FROM orders
    """,
    tags=("api", "reset_index"),
)
def q_api_reset_index_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reset_index through the wrapper — driver evidence for the
    DISTRIBUTED renumbering (range-partition + per-partition counts +
    cumulative offsets; no single-partition Exchange, plan-asserted in
    tests/test_frame_pandas.py). The oracle's global ROW_NUMBER proves the
    offset arithmetic reproduces the exact total order 0..n-1."""
    from pontem_spark.core import from_spark

    df = from_spark(load_table(spark, sf_dir, "orders"))[
        ["o_orderkey", "o_orderpriority"]
    ]
    out = df.set_index("o_orderkey").reset_index()
    sdf = out.to_spark()
    return sdf.select(
        F.col("__index__").alias("idx"), "o_orderkey", "o_orderpriority"
    )


@register(
    "q_stream_static_enrich",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
    tags=("streaming", "join", "enrich"),
)
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the events STREAM broadcast-joins the
    static customer dimension per micro-batch (stateless — no watermark,
    no join state), then aggregates value by market segment. Drained with
    availableNow and compared against the equivalent batch join — proving
    the streaming join path loses and duplicates nothing."""
    from pontem_spark.functions.compat import rnd
    from pontem_spark.streaming.events import (
        enrich_with_dim,
        read_event_stream,
        run_to_memory,
    )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = read_event_stream(spark, sf_dir)
    enriched = enrich_with_dim(stream, cust, "user_id", "c_custkey")
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    result = run_to_memory(agg, mode="complete")
    return result.select(
        "c_mktsegment", "n_events", rnd(F.col("total_value"), 2).alias("total_value")
    )


@register(
    "q_incremental_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total,
           ROUND(SUM(value) / COUNT(value), 2) AS avg,
           ROUND(CASE WHEN COUNT(value) >= 2 THEN SQRT(GREATEST(
               (SUM(value * value) - SUM(value) * SUM(value) / COUNT(value))
               / (COUNT(value) - 1), 0.0)) END, 2) AS sd,
           ROUND(MIN(value), 2) AS lo,
           ROUND(MAX(value), 2) AS hi
    FROM events
    GROUP BY 1
    """,
    tags=("incremental", "agg", "rollup"),
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation proof: the events table is split into three
    disjoint 'arrival batches' (by event_id mod), each batch is aggregated
    INDEPENDENTLY into a mergeable state, the states are merged pairwise
    (tree order, not list order — merging is associative), and read-time
    stats derive from the merged state. The oracle aggregates everything
    directly — hash-equality proves the incremental path loses nothing,
    which is what lets a 100 TB rollup update by shuffling only the new
    batch (operators/incremental.py). The ``sd`` column exercises the
    sum-of-squares state: sample stddev derived at READ time from the
    merged (n, total, ss) monoid — the oracle replays the same identity
    from SUM(value*value)."""
    from pontem_spark.operators.incremental import (
        finalize,
        merge_states,
        rollup_state,
    )

    events = load_table(spark, sf_dir, "events")
    # pmod + coalesce: plain `% 3 == i` would silently drop null ids (null
    # predicate) and negative ids (Spark % keeps sign), breaking the
    # batches-partition-the-input invariant this query exists to prove
    split = F.pmod(F.coalesce(F.col("event_id"), F.lit(0)), F.lit(3))
    batches = [
        rollup_state(events.filter(split == i), ["event_type"], "value")
        for i in range(3)
    ]
    merged = merge_states(merge_states(batches[0], batches[1], ["event_type"]),
                          batches[2], ["event_type"])
    return finalize(merged, ["event_type"], round_digits=2)
