"""Corpus-curation operators: repetition filtering, decontamination,
embedding normalization/quantization.

The three pre-training data stages between raw dedup and tokenization:

- :func:`repetition_metrics` — Gopher-style repetition quality signals
  (distinct-token ratio, top token/bigram share). One tagged explode over
  unigrams+bigrams, then two partial-agg-combinable hash aggregations —
  (doc, gram) then doc — so the shuffle carries gram COUNTS, never document
  bodies. At 100 TB this is the same two-shuffle shape as TF-IDF.
- :func:`ngram_contamination` — train/eval overlap detection (the "is my
  benchmark in the training set?" check). The eval side of the join is a
  distinct shingle set from a (small) held-out source, explicitly
  ``broadcast()`` — the train corpus is never shuffled, just scanned once
  against the broadcast hash table, then aggregated per doc.
- :func:`normalize_quantize` — L2-normalize an embedding column and emit
  int8-quantization statistics. Entirely per-row ``aggregate``/``transform``
  higher-order functions: zero shuffles, linear scan, embarrassingly
  parallel. The quantized checksum is an INTEGER so the cross-engine oracle
  comparison is exact (no float-hash risk).

No Python UDFs anywhere; every expression has a DuckDB twin (same fold
order, same floor-form rounding) so all three operators are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pontem_spark.functions import text as T
from pontem_spark.functions.compat import rnd
from pontem_spark.operators.util import ensure_parallelism


def repetition_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_distinct_ratio: float = 0.4,
    max_bigram_share: float = 0.1,
) -> DataFrame:
    """Per-document repetition signals + keep flag (Gopher-style filters).

    Columns: n_tok, distinct_ratio (unique tokens / tokens), top_token_share,
    top_bigram_share (most frequent n-gram's share of all n-grams), keep
    (1 when the doc clears both repetition thresholds).

    One explode of a TAGGED gram array (struct<n:int, g:string> for n=1,2)
    feeds a single (id, n, gram) count aggregation, then a conditional
    per-doc rollup — unigram and bigram statistics share one shuffle chain
    instead of two pipelines joined on doc id.
    """
    tagged = (
        "concat("
        " transform(__toks, x -> struct(1 as n, x as g)),"
        " transform(__bg,   x -> struct(2 as n, x as g)))"
    )
    grams = (
        # ~2x-per-token explode fan-out: rebalance a few-partition input
        # first so the gram generation uses every core (no-op on cluster
        # inputs that already arrive well-split)
        ensure_parallelism(df)
        .select(F.col(id_col), T.tokens(text_col).alias("__toks"))
        .select(F.col(id_col), F.col("__toks"), T.shingles("__toks", 2).alias("__bg"))
        .select(F.col(id_col), F.explode(F.expr(tagged)).alias("ng"))
        .select(id_col, F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
        .groupBy(id_col, "n", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    is1 = F.col("n") == 1
    is2 = F.col("n") == 2
    agg = grams.groupBy(id_col).agg(
        F.sum(F.when(is1, F.col("cnt"))).alias("n_tok"),
        F.count(F.when(is1, 1)).alias("n_distinct"),
        F.max(F.when(is1, F.col("cnt"))).alias("top_tok"),
        F.sum(F.when(is2, F.col("cnt"))).alias("n_bg"),
        F.max(F.when(is2, F.col("cnt"))).alias("top_bg"),
    )
    distinct_ratio = rnd(F.col("n_distinct") / F.col("n_tok"), 4)
    top_token_share = rnd(F.col("top_tok") / F.col("n_tok"), 4)
    bigram_share = rnd(
        F.coalesce(F.col("top_bg") / F.col("n_bg"), F.lit(0.0)), 4
    )
    return agg.select(
        id_col,
        F.col("n_tok"),
        distinct_ratio.alias("distinct_ratio"),
        top_token_share.alias("top_token_share"),
        bigram_share.alias("top_bigram_share"),
        (
            (distinct_ratio >= min_distinct_ratio)
            & (bigram_share <= max_bigram_share)
        )
        .cast("int")
        .alias("keep"),
    )


def ngram_contamination(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
    eval_value: str,
    n: int = 5,
) -> DataFrame:
    """Training-set contamination: for every NON-eval document, the fraction
    of its distinct word n-grams that also occur anywhere in the eval split
    (``split_col == eval_value``). Returns only contaminated docs
    (overlap > 0): id, n_shingles, n_overlap, overlap_ratio.

    Scale shape: the eval split's distinct-shingle set is small (benchmarks
    are MBs, corpora are TBs), so it is ``broadcast()`` — the train side is
    one scan + map-side semi-probe + per-doc count; no corpus shuffle on the
    shingle key, no skew exposure from boilerplate shingles.
    """
    sh = (
        df.select(F.col(id_col), F.col(split_col), T.tokens(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.col(split_col),
            F.explode(F.array_distinct(T.shingles("__toks", n))).alias("sh"),
        )
    )
    ev = (
        sh.filter(F.col(split_col) == eval_value)
        .select("sh")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    tr = sh.filter(F.col(split_col) != eval_value)
    # ONE train-side pass: broadcast LEFT join marks hits, a single per-doc
    # aggregation yields both the set size and the overlap count
    return (
        tr.join(F.broadcast(ev), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.col("__hit")).alias("n_overlap"),
        )
        .filter(F.col("n_overlap") > 0)
        .select(
            id_col,
            "n_shingles",
            "n_overlap",
            rnd(F.col("n_overlap") / F.col("n_shingles"), 4).alias("overlap_ratio"),
        )
    )


def normalize_quantize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    levels: int = 127,
) -> DataFrame:
    """L2-normalization + symmetric int8 quantization statistics per vector.

    Columns: l2_norm, max_abs (largest |component|), q_checksum (sum of the
    quantized int codes — integer, so the oracle match is exact), recon_err
    (mean |normalized − dequantized|, the quantization loss a retrieval
    pipeline would pay).

    All per-row fold expressions (``aggregate``/``transform`` HOFs): a
    single narrow scan, no shuffle, no UDF. Folds run left-to-right in both
    Spark and DuckDB over identical doubles, so even the float outputs are
    bit-deterministic before rounding.
    """
    d = f"CAST(size({vec_col}) AS DOUBLE)"
    sumsq = f"aggregate({vec_col}, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    with_norm = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.expr(f"sqrt({sumsq})").alias("__norm"),
    )
    qcode = f"floor(CAST(x AS DOUBLE) / __norm * {levels} + 0.5)"
    return with_norm.select(
        id_col,
        rnd(F.col("__norm"), 4).alias("l2_norm"),
        rnd(
            F.expr(f"aggregate({vec_col}, 0.0D, (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"),
            4,
        ).alias("max_abs"),
        F.expr(f"CAST(aggregate({vec_col}, 0.0D, (a, x) -> a + {qcode}) AS BIGINT)").alias(
            "q_checksum"
        ),
        # each |normalized − dequantized| term is floored onto a 1e-9 grid so
        # the SUM is integer-exact in any order — engines may sum floats
        # pairwise vs left-fold (1-ulp drift that flips the rounded digit)
        rnd(
            F.expr(
                f"aggregate({vec_col}, 0.0D,"
                # floor() yields BIGINT in Spark and BIGINT / 127.0 is DECIMAL
                # division (scale-truncated ~1e-7) — force a double divide
                f" (a, x) -> a + floor(abs(CAST(x AS DOUBLE) / __norm"
                f" - CAST({qcode} AS DOUBLE) / CAST({levels} AS DOUBLE))"
                f" * 1000000000.0))"
            )
            / F.lit(1.0e9)
            / F.expr(d),
            5,
        ).alias("recon_err"),
    )


def sequence_packing(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 512,
    shards: int = 8,
) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences.

    Contiguous-fill packing: docs are ordered by id within a shard and
    assigned to bin ``floor(tokens_before_me / budget)`` — each bin holds
    consecutive docs until the running token count crosses the budget.
    Deterministic (same bins on any engine/cluster/retry) and oracle-exact:
    the running sum is ``SUM() OVER (PARTITION BY shard ORDER BY id)`` in
    any SQL engine.

    Scale shape: ONE window shuffle, partitioned by ``id % shards`` — the
    shard count bounds every window partition to corpus/shards regardless of
    skew, and packing within a shard is exactly what a sharded tokenizer
    job wants (each output shard is independently consumable). A global
    (unsharded) running sum would funnel 100 TB through one partition.

    Docs longer than the budget get a bin of their own (the fill rule
    naturally isolates them); downstream chunking (queries/text.py) splits
    them further.
    """
    from pyspark.sql import Window

    n_tok = F.size(T.tokens(text_col))
    shard = F.col(id_col) % shards
    with_tok = df.select(
        F.col(id_col), shard.alias("shard"), n_tok.alias("n_tok")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    return with_tok.select(
        id_col,
        "shard",
        "n_tok",
        F.floor((cum - F.col("n_tok")) / budget).cast("bigint").alias("bin_id"),
    )


# PII patterns chosen for cross-engine regex portability: character
# classes, bounded quantifiers and \b only — identical semantics in Java
# regex (Spark) and RE2 (DuckDB). Replacement order is part of the
# contract (emails contain dots that the IPv4 pattern must never see
# first).
PII_PATTERNS: "tuple[tuple[str, str], ...]" = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+\d{9,15}\b"),
)


def redact_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: "tuple[tuple[str, str], ...]" = PII_PATTERNS,
    token: str = "[PII]",
) -> DataFrame:
    """Scrub personally identifiable substrings before a corpus ships to
    training: per-pattern match counts plus the redacted text, as pure
    Column expressions (``regexp_count`` + a chained ``regexp_replace``) —
    zero UDFs, map-side only, no shuffle; at 100 TB this is a narrow
    projection pipelined into whatever scan feeds it.

    Returns (id, n_<name> per pattern, orig_len, redacted_len,
    redacted_text). Counting uses the pre-redaction text for every pattern
    (so overlapping pattern families don't hide each other), while
    replacement applies in ``patterns`` order.
    """
    out = df.select(F.col(id_col), F.col(text_col))
    redacted = F.col(text_col)
    counts = []
    for name, pat in patterns:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}"))
        redacted = F.regexp_replace(redacted, pat, token)
    return out.select(
        F.col(id_col),
        *counts,
        F.length(F.col(text_col)).alias("orig_len"),
        F.length(redacted).alias("redacted_len"),
        redacted.alias("redacted_text"),
    )


def _word_windows(text_col: str, window: int):
    """Column of non-overlapping ``window``-word chunks of ``text_col``
    (last chunk may be short) — one in-row higher-order fold, no UDF."""
    return F.expr(
        f"transform("
        f"  sequence(1, cast(ceil(size(split({text_col}, ' ')) / {window}.0) as int)),"
        f"  i -> array_join(slice(split({text_col}, ' '), (i-1)*{window}+1, {window}), ' '))"
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
    max_doc_freq: int = 3,
    strategy: str = "broadcast",
    max_broadcast_chunks: int = 1_000_000,
) -> DataFrame:
    """Corpus-level boilerplate removal (the RefinedWeb / CCNet frequent-line
    filter): chunk every document into non-overlapping ``window``-word
    spans, find the spans that occur in more than ``max_doc_freq`` DISTINCT
    documents (headers, footers, cookie banners — content no model should
    memorize), and strip every occurrence, reassembling each document
    in-place.

    Scale shape: pass 1 shuffles (chunk, doc_id) pairs once for the
    document-frequency aggregate — the only shuffle, and it carries chunks,
    never whole documents. The surviving frequent-chunk set is SMALL by
    construction (each member appears in >``max_doc_freq`` docs, so there
    are at most total_chunks/max_doc_freq of them, and in practice far
    fewer), so it travels as one broadcast array row and pass 2 is a pure
    map-side rebuild — documents are never shuffled or regrouped.

    ``strategy`` picks pass 2 (VERDICT r6 #4 — the fallback is now code,
    not a docstring promise):

    - ``"broadcast"`` (default): the frequent set collapses to ONE array
      row cross-joined in — zero extra shuffles, the whole operator stays
      a single lazy plan (q_pipeline_corpus_prep plan-asserts this).
    - ``"antijoin"``: posexplode → anti-join chunks against the frequent
      set → groupBy(doc) positional reassembly. One extra chunk-level
      shuffle, but NO driver-sized structure anywhere — the escape hatch
      for a pathological corpus whose frequent set outgrows a broadcast.
      Byte-equal to the broadcast path (differential-tested).
    - ``"auto"``: one cheap count of the frequent set picks a path
      (``<= max_broadcast_chunks`` → broadcast). Costs one extra job, so
      it is opt-in rather than the default.

    Returns (id, clean_text, n_removed) — clean_text with every frequent
    chunk excised, n_removed = how many chunk occurrences were dropped.
    """
    if strategy not in ("broadcast", "antijoin", "auto"):
        raise ValueError(f"remove_boilerplate: unknown strategy {strategy!r}")
    from pontem_spark.operators.util import ensure_parallelism

    # rebalance the (narrow) documents before chunking (r14): a single-file
    # corpus scans as ONE partition, so the chunk explode + document-frequency
    # partial aggregation AND the map-side rebuild ran on one core while the
    # rest idled (guide §2.5). No-op on healthy multi-split input.
    df = ensure_parallelism(df.select(id_col, text_col))
    windows = _word_windows(text_col, window)
    chunks = df.select(F.col(id_col), F.explode(windows).alias("__chunk"))
    frequent_set = (
        chunks.groupBy("__chunk")
        .agg(F.count_distinct(id_col).alias("__dfreq"))
        .filter(F.col("__dfreq") > max_doc_freq)
        .select("__chunk")
    )
    if strategy == "auto":
        strategy = (
            "broadcast" if frequent_set.count() <= max_broadcast_chunks else "antijoin"
        )
    if strategy == "antijoin":
        pos = df.select(
            F.col(id_col), F.posexplode(windows).alias("__pos", "__chunk")
        )
        kept = pos.join(frequent_set, "__chunk", "left_anti")
        rebuilt = kept.groupBy(id_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__chunk"))),
                    lambda s: s["__chunk"],
                ),
                " ",
            ).alias("__clean"),
            F.count(F.lit(1)).alias("__n_kept"),
        )
        totals = df.select(
            F.col(id_col), F.coalesce(F.size(windows), F.lit(0)).alias("__n_total")
        )
        # left join restores docs whose EVERY chunk was frequent (or null
        # text): they vanish from the groupBy but must come back as ('', n)
        return totals.join(rebuilt, id_col, "left").select(
            F.col(id_col),
            F.coalesce(F.col("__clean"), F.lit("")).alias("clean_text"),
            (F.col("__n_total") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    frequent = frequent_set.agg(F.array_sort(F.collect_list("__chunk")).alias("__bl"))
    # null text → ('', 0): the coalesces make the contract total (and match
    # the oracle, where DuckDB's array_to_string([]) is NULL, not '')
    return (
        df.crossJoin(F.broadcast(frequent))
        .select(
            F.col(id_col),
            F.coalesce(
                F.array_join(
                    F.filter(windows, lambda c: ~F.array_contains(F.col("__bl"), c)),
                    " ",
                ),
                F.lit(""),
            ).alias("clean_text"),
            F.coalesce(
                F.size(
                    F.filter(windows, lambda c: F.array_contains(F.col("__bl"), c))
                ),
                F.lit(0),
            ).alias("n_removed"),
        )
    )


def dup_ngram_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Duplicated-n-gram repetition signals as a PURE PROJECTION — the
    Gopher "rep-n" family member :func:`repetition_metrics` lacks, computed
    without its doc×gram shuffle.

    Per document (docs with >= ``n`` tokens): ``n_grams`` (total n-grams),
    ``n_distinct``, ``top_share`` (most frequent n-gram's share) and
    ``dup_frac`` (fraction of n-gram occurrences whose gram appears more
    than once — the repeated-n-gram signal Gopher applies at n=5..10).

    Run-length form (the q_text_entropy generalization, SCALE.md): sort the
    gram array once, find run boundaries, derive every distinct gram's
    count from consecutive boundary positions — O(m log m) per row versus
    O(m x distinct) filter-per-distinct, and zero Exchanges versus the
    explode + two-level groupBy pipeline. All statistics here are integer
    counts and maxima (order-independent), divided once at the end, so no
    float-summation-order caveat applies and a DuckDB unnest/group-by
    oracle hashes identically.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    # 0-based positions where a run of equal grams ends in the sorted
    # array; try_element_at is NULL past the end so the final run closes
    # via coalesce(..., true) without an ANSI out-of-bounds error
    ends = (
        "filter(sequence(0, size(__s) - 1), "
        "i -> coalesce(try_element_at(__s, i + 2) != element_at(__s, i + 1), true))"
    )
    cnts = (
        "transform(__ends, (e, j) -> "
        "CAST(e - if(j = 0, -1, element_at(__ends, j)) AS BIGINT))"
    )
    dup = "aggregate(__cnts, CAST(0 AS BIGINT), (acc, c) -> acc + if(c > 1, c, CAST(0 AS BIGINT)))"
    return (
        df.select(F.col(id_col), T.tokens(text_col).alias("__toks"))
        .filter(F.size("__toks") >= n)
        .withColumn("__s", F.array_sort(T.shingles("__toks", n)))
        .withColumn("__ends", F.expr(ends))
        .withColumn("__cnts", F.expr(cnts))
        .select(
            id_col,
            F.size("__s").cast("bigint").alias("n_grams"),
            F.size("__ends").cast("bigint").alias("n_distinct"),
            rnd(F.expr("array_max(__cnts)") / F.size("__s"), 6).alias("top_share"),
            rnd(F.expr(dup) / F.size("__s"), 6).alias("dup_frac"),
        )
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    keep_cols: "Sequence[str]",
    smoothing: float = 0.0,
    round_digits: int = 6,
) -> DataFrame:
    """Leakage-safe (leave-one-out) target encoding — the standard
    categorical feature for tabular training sets: each row's category
    is replaced by the mean target of the OTHER rows in that category,
    optionally shrunk toward the global mean by ``smoothing`` pseudo-
    observations (the classic high-cardinality regularizer).

    encoded = (sum_cat - y + smoothing * global_mean)
              / (n_cat - 1 + smoothing)

    Excluding the row's own target is what makes the feature safe to
    compute on the training split itself (naive category means leak the
    label). Singleton categories with no smoothing fall back to the
    global mean.

    Plan: one partial-agg groupBy to |categories| rows; the global mean
    derives from THAT frame (zero extra fact scans), and the stats
    broadcast back onto the facts — the fact table is scanned twice and
    never shuffled, same shape as the seasonal/z-score gates.
    """
    y = F.col(target_col).cast("double")
    cats = df.groupBy(F.col(cat_col).alias("__c")).agg(
        F.count(target_col).alias("__n"), F.sum(y).alias("__s")
    )
    # Global mean from the category frame (window over |cats| rows) —
    # not a second scan, and no agg+join diamond on the facts.
    w_all = Window.orderBy("__c").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cats = cats.select(
        "__c", "__n", "__s",
        (F.sum("__s").over(w_all) / F.sum("__n").over(w_all)).alias("__g"),
    )
    joined = df.join(
        F.broadcast(cats), df[cat_col] == F.col("__c")
    )
    m = F.lit(float(smoothing))
    denom = F.col("__n") - F.lit(1) + m
    enc = F.when(
        denom > 0,
        (F.col("__s") - y + m * F.col("__g")) / denom,
    ).otherwise(F.col("__g"))
    return joined.select(
        *keep_cols, F.col(cat_col), rnd(enc, round_digits).alias("encoded")
    )
