"""Corpus-statistics operators: TF-IDF term ranking and n-gram counts.

The language-model-data shapes: an inverted index (term → doc postings)
built by explode + groupBy, document frequencies by a second integer-only
aggregation, and corpus n-gram tables. Everything is Column-expression work
(no UDFs); the explodes fan out map-side and every aggregation is
partial-agg combinable, so the operators scale with executors — term
statistics at 100 TB are exactly these two hash shuffles (term-frequency
keys, then term keys), never a document-body shuffle.

Determinism discipline: ranking ties are broken on integers only
(tf DESC, doc-frequency ASC, term ASC) — never on a floating tfidf value —
so Spark and the DuckDB oracle produce the identical top-k even when their
``ln()`` differs in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pontem_spark.functions import text as T
from pontem_spark.functions.compat import rnd
from pontem_spark.operators.util import ensure_parallelism


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — the exploded inverted index with per-doc counts."""
    return (
        ensure_parallelism(df)
        .select(id_col, F.explode(T.tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    round_digits: int = 4,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    idf = ln(N / df) with N the corpus size and df the number of documents
    containing the term. N and the df table come from integer aggregations
    over the (id, term, tf) index; N reaches every row via a broadcast of a
    1-row aggregate (never a driver-side count → literal, which would force
    an extra eager job). The per-doc top-k window partitions on the doc id —
    each partition is one document's distinct terms, inherently tiny, so the
    window never concentrates data no matter the corpus size.
    """
    tf = term_frequencies(df, id_col, text_col)
    # dfreq = postings count per term, as a WINDOW over the tf index
    # (r14): the former separate groupBy("term") aggregate re-derived the
    # whole tokenize + explode + (doc, term) aggregation subtree (Catalyst
    # does not dedupe diamonds — the corpus was tokenized TWICE in the
    # before-plan) and then hash-joined it back. The window computes the
    # same integer on the single pass. Skew note: a corpus-wide stop word
    # concentrates its postings in one window partition; acceptable
    # because partitions carry only (id, term, tf) rows — the document
    # bodies never enter the window — and the alternative was a full
    # second corpus tokenization. (A localCheckpoint-the-index variant
    # measured SLOWER at bench scale: materializing the index costs more
    # than re-scanning a small corpus; see OPTIMIZATION_r14.md.)
    dfreq_w = Window.partitionBy("term")
    tf = tf.withColumn("dfreq", F.count(F.lit(1)).over(dfreq_w))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("dfreq").asc(), F.col("term").asc()
    )
    return (
        tf.crossJoin(F.broadcast(n_docs))
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "dfreq",
            rnd(F.col("tf") * F.log(F.col("__n") / F.col("dfreq")), round_digits).alias("tfidf"),
            "term_rank",
        )
    )


def ngram_counts(
    df: DataFrame, text_col: str, n: int = 2, min_count: int = 5
) -> DataFrame:
    """Corpus-wide word n-gram occurrence counts (the LM count table).

    One explode + one hash aggregation on the n-gram string; ``min_count``
    prunes the long tail BEFORE anything leaves the aggregation, which is
    what keeps the result bounded when the corpus is 100 TB.
    """
    return (
        ensure_parallelism(df)
        .select(T.tokens(text_col).alias("__toks"))
        .select(F.explode_outer(T.shingles("__toks", n)).alias("ngram"))
        .filter(F.col("ngram").isNotNull())
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Pointwise mutual information of adjacent word pairs — the
    collocation detector ("New York" vs incidental adjacency):
    pmi = ln( (c_ab / N_bigrams) / ((c_a / N_tokens) * (c_b / N_tokens)) ).

    Three integer count tables (bigrams, unigrams, two 1-row totals), all
    partial-agg combinable; the unigram table joins in twice. ``min_count``
    prunes rare bigrams inside the aggregation, which both bounds the
    result and keeps PMI's low-count noise out. The unigram join keys are
    vocabulary-sized (Zipf: millions, not billions) — at 100 TB these are
    two ordinary hash joins on words, never a document-body shuffle; the
    totals ride along as broadcast 1-row aggregates.
    """
    toks = ensure_parallelism(df).select(T.tokens(text_col).alias("__toks"))
    unigrams = (
        toks.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    bigrams = (
        toks.select(F.explode_outer(T.shingles("__toks", 2)).alias("ab"))
        .filter(F.col("ab").isNotNull())
        .groupBy("ab")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    n_tokens = unigrams.agg(F.sum("c_w").alias("__nt"))
    n_bigrams = (
        toks.select(
            F.greatest(F.size("__toks") - 1, F.lit(0)).alias("__nb_doc")
        ).agg(F.sum("__nb_doc").alias("__nb"))
    )
    ua = unigrams.select(F.col("w").alias("__wa"), F.col("c_w").alias("c_a"))
    ub = unigrams.select(F.col("w").alias("__wb"), F.col("c_w").alias("c_b"))
    split = F.split(F.col("ab"), " ", 2)
    return (
        bigrams.withColumn("__wa", split.getItem(0))
        .withColumn("__wb", split.getItem(1))
        .join(ua, "__wa")
        .join(ub, "__wb")
        .crossJoin(F.broadcast(n_tokens))
        .crossJoin(F.broadcast(n_bigrams))
        .select(
            "ab",
            "c_ab",
            "c_a",
            "c_b",
            rnd(
                F.log(
                    (F.col("c_ab").cast("double") / F.col("__nb"))
                    / (
                        (F.col("c_a").cast("double") / F.col("__nt"))
                        * (F.col("c_b").cast("double") / F.col("__nt"))
                    )
                ),
                round_digits,
            ).alias("pmi"),
        )
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: "list[str]",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Okapi BM25 retrieval: top-k documents for a bag of query terms.

    Ranked retrieval over the same inverted-index shape as TF-IDF
    (reference has no retrieval surface; this is the §2.G corpus family).
    idf is the Lucene-style non-negative form ln(1 + (N - df + 0.5)/(df +
    0.5)); the length normalization uses whitespace token counts.

    Scale shape: the term filter lands BEFORE the tf aggregation, so only
    postings of the |terms| query terms are ever shuffled — corpus size
    contributes one map-side projection (per-doc length) and the
    broadcast 1-row (N, avgdl) aggregate, never a document-body shuffle.
    The final top-k is a single TakeOrderedAndProject on (rounded score
    DESC, id ASC) — rounding absorbs cross-engine last-ulp ln()/summation
    skew, the id tie-break makes equal rounded scores deterministic.
    """
    stats = ensure_parallelism(df).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg(T.n_tokens(text_col).cast("double")).alias("__avgdl"),
    )
    # r14: dl rides the postings rows (first(dl) in the same aggregate)
    # and dfreq is a window count over the tf index — the former separate
    # lengths frame and dfreq aggregate each re-derived a full tokenize
    # chain (Catalyst does not dedupe diamonds: 4 tokenize passes in the
    # before-plan, 2 now — the (N, avgdl) corpus stats are the one
    # irreducible full pass). The window partitions by query term (only
    # |terms| partitions, but the frame it shuffles is the already-
    # filtered postings index — tiny by construction).
    tf = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            T.n_tokens(text_col).alias("dl"),
            F.explode(T.tokens(text_col)).alias("term"),
        )
        .filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq_w = Window.partitionBy("term")
    contrib = (
        tf.withColumn("dfreq", F.count(F.lit(1)).over(dfreq_w))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("__n") - F.col("dfreq") + F.lit(0.5))
                    / (F.col("dfreq") + F.lit(0.5))
                )
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl").cast("double") / F.col("__avgdl")
                    )
                )
            ).alias("__c"),
        )
    )
    return (
        contrib.groupBy(id_col)
        .agg(
            rnd(F.sum("__c"), round_digits).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ctfidf_top_terms(
    df: DataFrame,
    class_col: str,
    text_col: str,
    k: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Class-based TF-IDF (the BERTopic c-TF-IDF form): terms that
    characterize a CLASS of documents (a source, a language, a cluster)
    rather than a single document — score = (tf_c / w_c) · ln(1 + A/f_t)
    with tf_c the term count in the class, w_c the class token count, f_t
    the corpus term count, and A the average class token count.

    Same two-hash-shuffle shape as tfidf_top_terms: the (class, term)
    aggregation then a term-keyed one; classes are few so the per-class
    top-k window partitions stay tiny, and w_c/A reach rows via broadcast
    joins. Ranking is on the rounded score with (tf DESC, term ASC) ties.
    """
    tok = ensure_parallelism(df).select(
        F.col(class_col).alias("cls"), F.explode(T.tokens(text_col)).alias("term")
    )
    tf = tok.groupBy("cls", "term").agg(F.count(F.lit(1)).alias("tf"))
    wc = tf.groupBy("cls").agg(F.sum("tf").alias("wc"))
    ft = tf.groupBy("term").agg(F.sum("tf").alias("ft"))
    avg_wc = wc.agg(F.avg(F.col("wc").cast("double")).alias("__a"))
    score = (F.col("tf").cast("double") / F.col("wc")) * F.log(
        F.lit(1.0) + F.col("__a") / F.col("ft")
    )
    w = Window.partitionBy("cls").orderBy(
        F.col("score").desc(), F.col("tf").desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(wc), "cls")
        .join(ft, "term")
        .crossJoin(F.broadcast(avg_wc))
        .withColumn("score", rnd(score, round_digits))
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            F.col("cls").alias(class_col), "term", "tf", "ft", "score", "term_rank"
        )
    )
