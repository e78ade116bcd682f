"""Text-analysis queries over the `documents` corpus (training-data pipeline ops).

All column math is JVM-side (functions/text.py); the per-document work is
embarrassingly parallel — no shuffle at all except where an aggregate needs
one. At 100 TB the corpus scan dominates, which is exactly the shape you want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.functions import text as T
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table

_EN_IN = ", ".join(f"'{w}'" for w in T.EN_STOPWORDS)


@register(
    "q_text_token_stats",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, source,
               string_split_regex(trim(text), '\\s+') AS toks,
               length(regexp_replace(text, '\\s', '', 'g')) AS alpha_chars
        FROM documents
    )
    SELECT doc_id, lang, source,
           len(toks) AS n_tokens,
           CAST(alpha_chars AS BIGINT) AS n_alpha_chars,
           ROUND(alpha_chars * 1.0 / len(toks), 4) AS avg_token_len,
           CAST(len(list_filter(toks, x -> x in ({_EN_IN}))) AS BIGINT) AS n_stopwords
    FROM t
    """,
    tags=("text", "tokenize"),
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: counts, average token length, stopword
    hits. Pure projection — zero shuffles, scales with executor count."""
    docs = load_table(spark, sf_dir, "documents")
    alpha = T.n_alpha_chars("text")
    return docs.withColumn("toks", T.tokens("text")).select(
        "doc_id",
        "lang",
        "source",
        F.size("toks").alias("n_tokens"),
        alpha.cast("bigint").alias("n_alpha_chars"),
        rnd(alpha * F.lit(1.0) / F.size("toks"), 4).alias("avg_token_len"),
        T.stopword_count("toks", T.EN_STOPWORDS).cast("bigint").alias("n_stopwords"),
    )


@register(
    "q_text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS toks,
               length(regexp_replace(text, '\\s', '', 'g')) AS alpha_chars
        FROM documents
    ), scored AS (
        SELECT doc_id,
               ROUND(
                 LEAST(len(toks) / 100.0, 1.0) * 0.5
                 + LEAST(len(list_filter(toks, x -> x in ({_EN_IN}))) * 10.0 / len(toks), 1.0) * 0.3
                 + LEAST(alpha_chars * 1.0 / (len(toks) * 8.0), 1.0) * 0.2
               , 4) AS quality
        FROM t
    )
    SELECT doc_id, quality FROM scored WHERE quality >= 0.5
    """,
    tags=("text", "quality"),
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality score (length + stopword density + token
    shape), filtering to keep-worthy docs — the classic pretraining-corpus
    quality gate, computed without leaving the JVM."""
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", T.tokens("text"))
    n_tok = F.size("toks").cast("double")
    alpha = T.n_alpha_chars("text").cast("double")
    stop = T.stopword_count("toks", T.EN_STOPWORDS).cast("double")
    quality = rnd(
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.5
        + F.least(stop * 10.0 / n_tok, F.lit(1.0)) * 0.3
        + F.least(alpha / (n_tok * 8.0), F.lit(1.0)) * 0.2,
        4,
    )
    return docs.select("doc_id", quality.alias("quality")).filter(F.col("quality") >= 0.5)


@register(
    "q_text_lang_id",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           {T.lang_id_oracle_sql('toks')} AS predicted_lang
    FROM t
    """,
    tags=("text", "langid"),
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID per document, alongside the dataset's own
    label. (The synthetic corpus is English-ish regardless of label — the
    point is the deterministic classification machinery.)"""
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", T.tokens("text"))
    counted = docs.select("doc_id", "lang", T.lang_counts("toks").alias("__lc"))
    return counted.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.lang_from_counts("__lc").alias("predicted_lang"),
    )


@register(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           substr(md5(text), 1, 16) AS fp64,
           md5(lower(trim(text))) AS fp_normalized
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: raw 64-bit (hex) prefix + case/space-normalized
    full hash. md5 because it is byte-identical across engines — these
    fingerprints are the join keys for cross-system dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.fingerprint("text", bits=64).alias("fp64"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp_normalized"),
    )


@register(
    "q_text_source_profile",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY source, lang
    """,
    tags=("text", "agg"),
)
def q_text_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile by (source, lang) — the dataset-card aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        rnd(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "q_corpus_assembly",
    oracle=f"""
    WITH stats AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               md5(lower(trim(text))) AS content_hash
        FROM documents
    ), emb AS (
        SELECT vec_id,
               ROUND(sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
                     i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 4) AS emb_norm,
               label
        FROM embeddings
    ), dedup AS (
        SELECT content_hash, MIN(doc_id) AS keep_id FROM stats GROUP BY content_hash
    )
    SELECT s.doc_id, s.n_tokens, e.emb_norm, e.label,
           CASE WHEN s.doc_id = d.keep_id THEN 1 ELSE 0 END AS is_canonical
    FROM stats s
    JOIN emb e ON s.doc_id = e.vec_id
    JOIN dedup d ON s.content_hash = d.content_hash
    WHERE s.n_tokens >= 10
    """,
    tags=("text", "pipeline", "join"),
)
def q_corpus_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus assembly: per-doc token stats + exact-dedup
    canonical flag + joined embedding norms + quality gate, in ONE pipeline.
    The shape a real 100 TB data-curation job takes: narrow per-doc
    projections, one dedup shuffle on the 16-byte hash, an equi-join to the
    embedding table, filters pushed to the scans."""
    from pontem_spark.functions import text as TX
    from pontem_spark.functions import vector as V
    from pontem_spark.operators.dedup import exact_duplicates

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(
        "doc_id",
        F.size(TX.tokens("text")).alias("n_tokens"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"),
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        rnd(V.norm_fixed("embedding", 64), 4).alias("emb_norm"),
        "label",
    )
    dedup = exact_duplicates(docs, "doc_id", "text", normalized=True).select(
        "content_hash", F.col("keep_id")
    )
    return (
        stats.filter(F.col("n_tokens") >= 10)
        .join(emb, stats.doc_id == emb.vec_id)
        .join(dedup, "content_hash")
        .select(
            "doc_id",
            "n_tokens",
            "emb_norm",
            "label",
            F.when(F.col("doc_id") == F.col("keep_id"), 1).otherwise(0).alias("is_canonical"),
        )
    )


@register(
    "q_text_chunking",
    oracle="""
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS chunk_idx,
           substr(text, (CAST(i AS BIGINT) - 1) * 200 + 1, 200) AS chunk
    FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, CAST(ceil(length(text) / 200.0) AS BIGINT))) AS i
        FROM documents
    )
    """,
    tags=("text", "chunking"),
)
def q_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking (fixed 200-char windows) as pure Column algebra:
    explode a chunk-index sequence, slice with substring. The
    context-window-preprocessing shape, no UDF, no UDTF (the UDTF variant
    lives in tests/test_udtf.py)."""
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.ceil(F.length("text") / 200.0).cast("int")
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), n_chunks)).alias("i"),
        )
        .select(
            "doc_id",
            (F.col("i") - 1).cast("bigint").alias("chunk_idx"),
            F.expr("substr(text, (i - 1) * 200 + 1, 200)").alias("chunk"),
        )
    )


@register(
    "q_text_train_test_split",
    oracle="""
    WITH tagged AS (
        SELECT doc_id,
               CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 10 < 9
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM tagged GROUP BY split
    """,
    tags=("text", "split", "pipeline"),
)
def q_text_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/10 train/test split by content-independent hash of
    the id — reproducible across engines, runs, and cluster sizes (the ONLY
    safe way to split at 100 TB; random() splits are neither stable nor
    resumable)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)) % 10
    split = F.when(bucket < 9, "train").otherwise("test")
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )
