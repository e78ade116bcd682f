"""Round-2 queries: new operators added this round.

Registered immediately after the previously-unverified tpch2/tpch3/windows/
tpch families so they land inside the driver's 50-row correctness window.

Queries are added here by the operators they exercise:
- bucketed cosine near-dup pairs (LSH buckets -> per-bucket BLAS kernel)
- SimHash banded near-pair candidates (equi-join, no O(n^2) scan)
- public pandas-like API surface for the dedup/similarity operators
- TF-IDF top terms / n-gram count tables (operators/textstats.py)
- deterministic stratified sampling (operators/sampling.py)
- latest-record-per-key compaction (operators/dedup.py::latest_by_key)
- column profiling + z-score outliers (operators/profile.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table

_COS4_SQL = (
    "ROUND(list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(generate_series(1, len({b})), "
    "i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))), 4)"
)


def _bucketed_cosine_oracle(n_planes: int = 4, dim: int = 64, threshold: float = 0.4) -> str:
    from pontem_spark.queries.oracle_fragments import lsh_sig_sql

    return f"""
    WITH b AS (
        SELECT vec_id, embedding, {lsh_sig_sql('embedding', n_planes, dim)} AS bucket
        FROM embeddings
    ), pairs AS (
        SELECT x.vec_id AS id_a, y.vec_id AS id_b,
               {_COS4_SQL.format(a='x.embedding', b='y.embedding')} AS cos_sim
        FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= {threshold}
    """


from pontem_spark.queries.oracle_fragments import minhash_oracle  # no registrations


@register(
    "q_api_dedup_minhash",
    oracle=minhash_oracle(8, 4),
    tags=("api", "dedup", "minhash", "lsh"),
)
def q_api_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH dedup pipeline driven ENTIRELY through the public
    pandas-like API: read_parquet → df.dedup.minhash_candidates(...) —
    proving the north-star surface runs the same scale-shaped plan as the
    operator layer (same oracle as q_dedup_minhash_candidates)."""
    from pontem_spark.core.io import read_parquet

    pdf = read_parquet(f"{sf_dir}/documents.parquet", spark=spark)
    cands = pdf.dedup.minhash_candidates("doc_id", "text", num_hashes=8, rows_per_band=4, ngram=3)
    return cands.to_spark().select("id_a", "id_b")


@register(
    "q_dedup_cosine_bucketed",
    oracle=_bucketed_cosine_oracle(),
    tags=("dedup", "embedding", "cosine", "lsh"),
)
def q_dedup_cosine_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via LSH buckets + per-bucket BLAS kernel:
    one hash shuffle on the bucket key, no driver collect — the
    linear-shuffle 100 TB counterpart of the exact tiled all-pairs."""
    from pontem_spark.operators.similarity import cosine_pairs_bucketed

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_bucketed(emb, "vec_id", "embedding", threshold=0.4, n_planes=4, dim=64, round_digits=4)


@register(
    "q_stream_stateful_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(value) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def q_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running stats maintained in grouped state across micro-batches, drained
    with availableNow — the FINAL state per key must hash-match the plain
    batch aggregation. The state is the SAME monoid as the batch
    incremental rollup (operators/incremental.py — n counts non-null
    values, hence COUNT(value) in the oracle; identical on this data).
    Update mode can emit a key once per batch; the final emission is
    selected via max-by-count (n_events is strictly increasing per
    emission), so the check is multi-batch-safe."""
    from pyspark.sql import functions as F

    from pontem_spark.functions.compat import rnd
    from pontem_spark.streaming import read_event_stream, run_to_memory
    from pontem_spark.streaming.stateful import running_user_stats

    emitted = run_to_memory(
        running_user_stats(read_event_stream(spark, sf_dir)), mode="update"
    )
    final = (
        emitted.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value", "max_value")).alias("s"))
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            rnd(F.col("s.total_value"), 2).alias("total_value"),
            F.col("s.max_value").alias("max_value"),
        )
    )
    return final


@register(
    "q_tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    ranked AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.dfreq,
               ROUND(tf.tf * ln(n.n_docs * 1.0 / dfreq.dfreq), 4) AS tfidf,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, dfreq.dfreq ASC, tf.term ASC
               ) AS INTEGER) AS term_rank
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, dfreq, tfidf, term_rank FROM ranked WHERE term_rank <= 3
    """,
    tags=("text", "tfidf", "inverted-index"),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF. Ties break on
    integers only (tf, dfreq, term) so both engines rank identically even
    when their ln() differs in the last ulp."""
    from pontem_spark.operators.textstats import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3, round_digits=4)


@register(
    "q_bigram_counts",
    oracle="""
    WITH t AS (
        SELECT string_split_regex(trim(text), '\\s+') AS ts FROM documents
    ), g AS (
        SELECT unnest(CASE WHEN len(ts) >= 2
                           THEN list_transform(generate_series(1, len(ts) - 1),
                                               i -> ts[i] || ' ' || ts[i+1])
                           ELSE [] END) AS ngram
        FROM t
    )
    SELECT ngram, COUNT(*) AS n_occurrences
    FROM g GROUP BY ngram HAVING COUNT(*) >= 5
    """,
    tags=("text", "ngram", "langmodel"),
)
def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram count table (the LM count shape): explode word 2-grams,
    one hash aggregation, min-count prune inside the agg."""
    from pontem_spark.operators.textstats import ngram_counts

    docs = load_table(spark, sf_dir, "documents")
    return ngram_counts(docs, "text", n=2, min_count=5)


def _stratified_oracle() -> str:
    from pontem_spark.operators.sampling import hash_bucket_sql

    return f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {hash_bucket_sql('doc_id', 100)} <
          CASE lang WHEN 'en' THEN 60 WHEN 'zh' THEN 90 ELSE 40 END
    """


@register(
    "q_stratified_sample",
    oracle=_stratified_oracle(),
    tags=("sampling", "pipeline"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language corpus rebalance: keep 60% of English,
    90% of Chinese, 40% of everything else — selected by md5 hash bucket of
    the doc id, so the exact same rows survive on any engine or cluster
    size. Pure scan + filter; zero shuffles."""
    from pontem_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(docs, "lang", "doc_id", {"en": 60, "zh": 90}, default_percent=40)
    return sampled.select("doc_id", "lang", "source")


@register(
    "q_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus, o_totalprice
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
        ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    tags=("dedup", "compaction", "upsert"),
)
def q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert/CDC compaction: each customer's latest order via
    max(struct(...)) — a map-side-combinable aggregate that shuffles ~|keys|
    rows, where the equivalent row_number window would shuffle every
    version of every key (the whole table at 100 TB)."""
    from pontem_spark.operators.dedup import latest_by_key

    orders = load_table(spark, sf_dir, "orders")
    return latest_by_key(
        orders, "o_custkey", ["o_orderdate", "o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


@register(
    "q_profile_null_stats",
    oracle="""
    WITH s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_event_type,
               COUNT(DISTINCT event_type) AS nd_event_type,
               CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_user_id,
               COUNT(DISTINCT user_id) AS nd_user_id,
               CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_value,
               COUNT(DISTINCT value) AS nd_value,
               CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_props,
               COUNT(DISTINCT props) AS nd_props
        FROM events
    )
    SELECT 'event_type' AS column_name, n AS n_rows, nn_event_type AS n_nulls, nd_event_type AS n_distinct FROM s
    UNION ALL SELECT 'user_id', n, nn_user_id, nd_user_id FROM s
    UNION ALL SELECT 'value', n, nn_value, nd_value FROM s
    UNION ALL SELECT 'props', n, nn_props, nd_props FROM s
    """,
    tags=("profiling", "quality"),
)
def q_profile_null_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card profile of the events table: per-column null count and
    exact cardinality, ALL columns in ONE aggregation pass, fanned out to
    per-column rows by a constant-size unpivot."""
    from pontem_spark.operators.profile import profile_columns

    events = load_table(spark, sf_dir, "events")
    return profile_columns(events, ["event_type", "user_id", "value", "props"])


@register(
    "q_zscore_outliers",
    oracle="""
    WITH s AS (
        SELECT AVG(o_totalprice) AS mu, stddev_pop(o_totalprice) AS sigma FROM orders
    )
    SELECT o_orderkey, ROUND((o_totalprice - mu) / sigma, 2) AS zscore
    FROM orders, s
    WHERE abs(ROUND((o_totalprice - mu) / sigma, 2)) > 1.5
    """,
    tags=("profiling", "outliers"),
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical anomaly gate: orders whose total price is >1.5 population
    std-devs from the mean. One scalar aggregate broadcast back over the
    scan — no global window funneling everything through one partition."""
    from pontem_spark.operators.profile import zscore_outliers

    orders = load_table(spark, sf_dir, "orders")
    return zscore_outliers(orders, "o_totalprice", ["o_orderkey"], threshold=1.5, round_digits=2)


@register(
    "q_stream_dedup_daily_users",
    oracle="""
    SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')
    """,
    tags=("streaming", "dedup", "watermark"),
)
def q_stream_dedup_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (dropDuplicatesWithinWatermark on user/type/day —
    bounded state) drained with availableNow; the surviving first-arrivals
    aggregate to exactly the batch COUNT(DISTINCT) — only key-determined
    outputs are asserted, since WHICH duplicate survives is arrival order."""
    from pyspark.sql import functions as F

    from pontem_spark.streaming import read_event_stream, run_to_memory
    from pontem_spark.streaming.events import dedup_stream

    stream = read_event_stream(spark, sf_dir).withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    deduped = dedup_stream(stream, ["user_id", "event_type", "event_date"])
    emitted = run_to_memory(deduped, mode="append")
    return emitted.groupBy("event_type", "event_date").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "q_quality_repetition",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents
    ), g AS (
        SELECT doc_id, 1 AS n, unnest(ts) AS g FROM t
        UNION ALL
        SELECT doc_id, 2 AS n,
               unnest(CASE WHEN len(ts) >= 2
                           THEN list_transform(generate_series(1, len(ts) - 1),
                                               i -> ts[i] || ' ' || ts[i+1])
                           ELSE [] END) AS g
        FROM t
    ), c AS (
        SELECT doc_id, n, g, count(*) AS cnt FROM g GROUP BY doc_id, n, g
    ), m AS (
        SELECT doc_id,
               sum(CASE WHEN n = 1 THEN cnt END) AS n_tok,
               count(CASE WHEN n = 1 THEN 1 END) AS n_distinct,
               max(CASE WHEN n = 1 THEN cnt END) AS top_tok,
               sum(CASE WHEN n = 2 THEN cnt END) AS n_bg,
               max(CASE WHEN n = 2 THEN cnt END) AS top_bg
        FROM c GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           ROUND(n_distinct * 1.0 / n_tok, 4) AS distinct_ratio,
           ROUND(top_tok * 1.0 / n_tok, 4) AS top_token_share,
           ROUND(COALESCE(top_bg * 1.0 / n_bg, 0.0), 4) AS top_bigram_share,
           CAST(ROUND(n_distinct * 1.0 / n_tok, 4) >= 0.4
                AND ROUND(COALESCE(top_bg * 1.0 / n_bg, 0.0), 4) <= 0.1 AS INT) AS keep
    FROM m
    """,
    tags=("text", "quality", "curation"),
)
def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter: distinct-token ratio and top
    token/bigram shares per document, with a keep flag. One tagged explode →
    two partial-agg hash aggregations; the shuffle carries gram counts,
    never document bodies."""
    from pontem_spark.operators.curation import repetition_metrics

    docs = load_table(spark, sf_dir, "documents")
    return repetition_metrics(docs, "doc_id", "text")


@register(
    "q_contamination_overlap",
    oracle="""
    WITH t AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS ts FROM documents
    ), sh AS (
        SELECT doc_id, source,
               unnest(list_distinct(
                   CASE WHEN len(ts) >= 5
                        THEN list_transform(generate_series(1, len(ts) - 4),
                             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                  || ' ' || ts[i+3] || ' ' || ts[i+4])
                        ELSE [] END)) AS sh
        FROM t
    ), ev AS (
        SELECT DISTINCT sh FROM sh WHERE source = 'src0'
    ), tr AS (
        SELECT doc_id, sh.sh AS sh FROM sh WHERE source <> 'src0'
    )
    SELECT tr.doc_id,
           count(*) AS n_shingles,
           count(ev.sh) AS n_overlap,
           ROUND(count(ev.sh) * 1.0 / count(*), 4) AS overlap_ratio
    FROM tr LEFT JOIN ev ON tr.sh = ev.sh
    GROUP BY tr.doc_id
    HAVING count(ev.sh) > 0
    """,
    tags=("text", "contamination", "curation", "broadcast"),
)
def q_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: fraction of each train doc's distinct
    5-grams that appear anywhere in the held-out split (source='src0').
    The eval shingle set is broadcast — the train corpus is scanned once,
    never shuffled on the shingle key."""
    from pontem_spark.operators.curation import ngram_contamination

    docs = load_table(spark, sf_dir, "documents")
    return ngram_contamination(docs, "doc_id", "text", "source", "src0", n=5)


@register(
    "q_embedding_quantize",
    oracle="""
    -- norm via list_reduce: a strict LEFT fold, the same summation order as
    -- Spark's aggregate() HOF, so the double is bit-identical (list_sum may
    -- sum pairwise and drift 1 ulp). recon terms are floored onto a 1e-9
    -- integer grid so THAT sum is order-exact on both engines.
    WITH n AS (
        SELECT vec_id, embedding,
               sqrt(list_reduce(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                    (a, x) -> a + x)) AS nrm
        FROM embeddings
    )
    SELECT vec_id,
           ROUND(nrm, 4) AS l2_norm,
           ROUND(list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))), 4) AS max_abs,
           CAST(list_sum(list_transform(embedding,
                 x -> floor(CAST(x AS DOUBLE) / nrm * 127 + 0.5))) AS BIGINT) AS q_checksum,
           ROUND(list_sum(list_transform(embedding,
                 x -> floor(abs(CAST(x AS DOUBLE) / nrm
                                - floor(CAST(x AS DOUBLE) / nrm * 127 + 0.5) / 127.0)
                            * 1000000000.0)))
                 / 1000000000.0 / len(embedding), 5) AS recon_err
    FROM n
    """,
    tags=("embeddings", "quantization", "curation"),
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize + int8-quantize every embedding, reporting norm, max
    component, integer quantization checksum (exact cross-engine match) and
    mean reconstruction error. Pure per-row array folds — zero shuffles."""
    from pontem_spark.operators.curation import normalize_quantize

    emb = load_table(spark, sf_dir, "embeddings")
    return normalize_quantize(emb, "vec_id", "embedding", levels=127)
