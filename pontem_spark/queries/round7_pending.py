"""Round-8 query candidates, written and locally oracle-proven in round 7.

NOT registered: the r7 driver window is budgeted exactly (3 never-green
derived-output queries + the 47 r4-stale queries = 50 slots), and a new
registration sorts FIRST and would evict an r4 query from its freshness
re-check (registry.py evidence-age ordering). Round 8 flips these on by
wrapping each (fn, oracle) pair with ``registry.register`` — the pairs
are already exercised against DuckDB by tests/test_pending_queries.py, so
they arrive green.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pontem_spark.sources.tables import load_table

# (name, fn, oracle) triples for round-8 registration.
PENDING: "list[tuple[str, object, str]]" = []


def _pending(name: str, oracle: str):
    def deco(fn):
        from pontem_spark.functions.compat import portable_round_sql

        PENDING.append((name, fn, portable_round_sql(oracle)))
        return fn

    return deco


@_pending(
    "q_api_interpolate_ffill",
    oracle="""
    WITH seq AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE CAST(o_totalprice AS DOUBLE) END AS v,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) AS pos
        FROM orders WHERE o_orderkey <= 2000
    ), scan AS (
        SELECT o_orderkey, v, pos,
               last_value(v IGNORE NULLS) OVER (ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
                   OVER (ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
               first_value(v IGNORE NULLS) OVER (ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
                   OVER (ORDER BY pos ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
        FROM seq
    )
    SELECT o_orderkey,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (pos - pp) / CAST(np - pp AS DOUBLE)
             WHEN pv IS NOT NULL THEN pv
           END, 4) AS interpolated,
           ROUND(pv, 4) AS ffilled
    FROM scan
    """,
)
def q_api_interpolate_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.interpolate (positional linear, trailing ffill per pandas'
    limit_direction='forward') and Series.ffill over a deterministic
    missing pattern (every 7th orderkey nulled) — the oracle replays the
    identical two ignore-nulls window scans in SQL."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("o_totalprice").cast("double"))
            .alias("v"),
        )
    )
    s = from_spark(base, index_col="o_orderkey")["v"]  # no driver collect
    interp = s.interpolate().to_spark(value_name="interpolated")
    ff = s.ffill().to_spark(value_name="ffilled")
    iname = interp.columns[0]
    return (
        interp.join(ff.withColumnRenamed(ff.columns[0], iname), iname)
        .select(
            F.col(iname).alias("o_orderkey"),
            rnd(F.col("interpolated"), 4).alias("interpolated"),
            rnd(F.col("ffilled"), 4).alias("ffilled"),
        )
    )


@_pending(
    "q_api_ewm_mean",
    oracle="""
    WITH seq AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS v,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS i
        FROM orders WHERE o_orderkey <= 800
    )
    SELECT o_orderkey,
           ROUND(
             SUM(v * pow(0.9, -i)) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / SUM(pow(0.9, -i)) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           , 4) AS ewm_mean
    FROM seq
    """,
)
def q_api_ewm_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.ewm(alpha=0.1, adjust=True).mean() vs the closed-form SQL
    twin: with adjust, y_t = Σ w^(t-i)·x_i / Σ w^(t-i) = (Σ x_i·w^-i) /
    (Σ w^-i) — two prefix sums. The SQL form overflows for long series
    (w^-i explodes), which is exactly why the engine implementation is an
    Arrow group instead; the bounded 800-row window keeps the oracle in
    double range (0.9^-800 ≈ 3e36) while proving the recurrence."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 800)
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("v"))
    )
    s = from_spark(base, index_col="o_orderkey")["v"]  # no driver collect
    out = s.ewm(alpha=0.1).mean().to_spark(value_name="ewm_mean")
    iname = out.columns[0]
    return out.select(
        F.col(iname).alias("o_orderkey"), rnd(F.col("ewm_mean"), 4).alias("ewm_mean")
    )


def _pagerank_dangling_oracle(damping: float = 0.85, iterations: int = 3) -> str:
    """Unrolled-CTE oracle for DIRECTED pagerank with the dangling-mass
    redistribution term (operators/graph.py::pagerank handle_dangling)."""
    prev = "r0"
    steps = []
    for i in range(1, iterations + 1):
        steps.append(
            f"""d{i} AS (
        SELECT SUM(rank) AS dm FROM {prev} WHERE NOT has_out
    ), r{i} AS (
        SELECT n.node, n.has_out,
               (1 - {damping}) / (SELECT n FROM cnt)
               + {damping} * (SELECT dm FROM d{i}) / (SELECT n FROM cnt)
               + {damping} * COALESCE(c.contrib, 0.0) AS rank
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, SUM(p.rank / e.outdeg) AS contrib
            FROM edges e JOIN {prev} p ON p.node = e.src
            GROUP BY e.dst
        ) c ON c.node = n.node
    )"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH raw AS (
        SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
               'p' || CAST(l_partkey AS VARCHAR) AS dst
        FROM lineitem
    ), deg AS (
        SELECT src, COUNT(*) AS outdeg FROM raw GROUP BY src
    ), edges AS (
        SELECT raw.src, raw.dst, deg.outdeg FROM raw JOIN deg ON raw.src = deg.src
    ), nodes AS (
        SELECT node, MAX(has_out) AS has_out FROM (
            SELECT src AS node, TRUE AS has_out FROM raw
            UNION ALL
            SELECT dst AS node, FALSE AS has_out FROM raw
        ) GROUP BY node
    ), cnt AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (
        SELECT node, has_out, 1.0 / (SELECT n FROM cnt) AS rank FROM nodes
    ),
    {chain}
    SELECT node, ROUND(rank * 1e6, 6) AS rank_ppm FROM {prev}
    """


def _cut_oracle() -> str:
    from pontem_spark.operators.binning import equal_width_bins_oracle_sql

    cte, bucket = equal_width_bins_oracle_sql("orders", "o_totalprice", bins=8)
    return f"WITH {cte} SELECT o_orderkey, {bucket} AS bucket FROM orders, edges"


@_pending("q_api_cut", _cut_oracle())
def q_api_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas.cut(bins=8, labels=False, right=True) over order totals —
    ONE min/max aggregate broadcast as a single row of edges, then a pure
    map-side fold counting internal edges below the value (no window, no
    shuffle of the fact rows). Edges rounded to 1e-6 so both engines
    bucket from identical doubles (operators/binning.py::equal_width_bins)."""
    from pontem_spark.operators.binning import equal_width_bins

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return equal_width_bins(orders, "o_totalprice", bins=8).select(
        "o_orderkey", F.col("bucket").cast("int").alias("bucket")
    )


@_pending(
    "q_api_get_dummies",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderstatus = 'F' AS INTEGER) AS status_F,
           CAST(o_orderstatus = 'O' AS INTEGER) AS status_O,
           CAST(o_orderstatus = 'P' AS INTEGER) AS status_P
    FROM orders
    """,
)
def q_api_get_dummies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas.get_dummies over o_orderstatus: one loudly-guarded distinct
    collect (the indicators BECOME the schema, which cannot be lazy), then
    a pure map-side projection — no shuffle at any scale
    (core/frame.py::get_dummies)."""
    from pontem_spark.core import from_spark, get_dummies

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    f = from_spark(orders, index_col="o_orderkey")
    f = f.rename(columns={"o_orderstatus": "status"})
    out = get_dummies(f, "status").to_spark()
    return out.select(
        F.col(out.columns[0]).alias("o_orderkey"),
        F.col("status_F").cast("int").alias("status_F"),
        F.col("status_O").cast("int").alias("status_O"),
        F.col("status_P").cast("int").alias("status_P"),
    )


@_pending(
    "q_join_bloom_prefilter",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join: build a 2^17-bit filter from the BUILDING
    customers (explode + bit_or aggregation, bounded broadcast literal),
    drop non-matching orders MAP-SIDE before any exchange, then an exact
    semi-join removes the false positives — so the oracle is the plain
    semi-join itself: the pre-filter is proven lossless
    (operators/bloom.py::bloom_semi_join)."""
    from pontem_spark.operators.bloom import bloom_semi_join

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    return bloom_semi_join(orders, cust, "o_custkey", "c_custkey").select(
        "o_orderkey", "o_custkey"
    )


@_pending(
    "q_sketch_cms_counts",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt_exact,
           TRUE AS over_ok,
           TRUE AS bound_ok
    FROM events GROUP BY event_type
    """,
)
def q_sketch_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates with derived deterministic
    outputs (the q_sketch_hll_users pattern): the estimate itself is
    xxhash64-bucketed and so engine-specific, but the CMS guarantees —
    est >= exact always, est <= exact + eps*N (eps = e/width) — are
    computed IN-PLAN as booleans the oracle can hash-match. The state is
    built in two halves and merged, so the green row also certifies merge
    associativity (operators/sketches.py::cms_state/cms_merge/cms_estimate)."""
    from pontem_spark.operators.sketches import cms_estimate, cms_merge, cms_state

    ev = load_table(spark, sf_dir, "events")
    a = cms_state(ev.filter(F.col("event_id") % 2 == 0), "event_type")
    b = cms_state(ev.filter(F.col("event_id") % 2 == 1), "event_type")
    state = cms_merge(a, b)
    est = cms_estimate(state, ev, "event_type")
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt_exact"))
    n_total = ev.agg(F.count(F.lit(1)).alias("__n"))
    eps = 2.718281828459045 / 1024
    return (
        exact.join(est, "event_type")
        .crossJoin(F.broadcast(n_total))
        .select(
            "event_type",
            "cnt_exact",
            (F.col("cnt_est") >= F.col("cnt_exact")).alias("over_ok"),
            (
                F.col("cnt_est")
                <= F.col("cnt_exact") + F.floor(F.lit(eps) * F.col("__n"))
            ).alias("bound_ok"),
        )
    )


@_pending(
    "q_text_bigram_pmi",
    oracle="""
    WITH t AS (
        SELECT string_split_regex(trim(text), '\\s+') AS ts FROM documents
    ), uni AS (
        SELECT unnest(ts) AS w FROM t
    ), cw AS (
        SELECT w, COUNT(*) AS c_w FROM uni GROUP BY w
    ), big AS (
        SELECT unnest(CASE WHEN len(ts) >= 2
                           THEN list_transform(generate_series(1, len(ts) - 1),
                                               i -> ts[i] || ' ' || ts[i+1])
                           ELSE [] END) AS ab
        FROM t
    ), cab AS (
        SELECT ab, COUNT(*) AS c_ab FROM big GROUP BY ab HAVING COUNT(*) >= 5
    ), nt AS (SELECT SUM(c_w) AS n FROM cw),
    nb AS (SELECT COUNT(*) AS n FROM big)
    SELECT cab.ab, cab.c_ab, a.c_w AS c_a, b.c_w AS c_b,
           ROUND(ln((CAST(cab.c_ab AS DOUBLE) / nb.n) /
                    ((CAST(a.c_w AS DOUBLE) / nt.n) * (CAST(b.c_w AS DOUBLE) / nt.n))), 4) AS pmi
    FROM cab
    JOIN cw a ON a.w = string_split(cab.ab, ' ')[1]
    JOIN cw b ON b.w = string_split(cab.ab, ' ')[2]
    CROSS JOIN nt CROSS JOIN nb
    """,
)
def q_text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation detection: pointwise mutual information of adjacent
    word pairs, three integer count tables + two broadcast 1-row totals
    (operators/textstats.py::bigram_pmi). The oracle replays the identical
    count tables and float expression order; PMI rounds at 4 digits like
    the long-green tfidf query."""
    from pontem_spark.operators.textstats import bigram_pmi

    docs = load_table(spark, sf_dir, "documents")
    return bigram_pmi(docs, "text", min_count=5, round_digits=4)


@_pending(
    "q_profile_trend_fit",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority,
               date_diff('day', DATE '1992-01-01', o_orderdate) AS day,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1, 2
    ), s AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(CAST(day AS DOUBLE)) AS sx,
               SUM(CAST(n_orders AS DOUBLE)) AS sy,
               SUM(CAST(day AS DOUBLE) * CAST(n_orders AS DOUBLE)) AS sxy,
               SUM(CAST(day AS DOUBLE) * CAST(day AS DOUBLE)) AS sxx,
               SUM(CAST(n_orders AS DOUBLE) * CAST(n_orders AS DOUBLE)) AS syy
        FROM daily GROUP BY 1
    )
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
           ROUND(CASE WHEN n * sxx - sx * sx <> 0
                      THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
           ROUND(CASE WHEN n * sxx - sx * sx <> 0
                      THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END, 6) AS intercept,
           ROUND(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <> 0
                      THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
    FROM s
    """,
)
def q_profile_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority OLS trend of daily order volume — ONE
    sufficient-statistics aggregation then closed-form algebra
    (operators/profile.py::grouped_linear_trend). Day index and daily
    count are integers, so every sum is exactly representable and the
    mirrored float expression order makes both engines bit-agree before
    rounding."""
    from pontem_spark.operators.profile import grouped_linear_trend

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return grouped_linear_trend(daily, ["o_orderpriority"], "day", "n_orders")


@_pending("q_graph_pagerank_dangling", _pagerank_dangling_oracle())
def q_graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the genuinely DIRECTED supplier→part graph: every
    part vertex is a sink (out-degree 0), so without the per-iteration
    dangling-mass term (d·S/N) the distribution would leak most of its
    mass. The oracle unrolls the same three iterations WITH the term;
    rank mass conservation means ppm values sum to ~1e6."""
    from pontem_spark.functions.compat import rnd
    from pontem_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    # no query-side .distinct(): pagerank() dedupes its edge input as part
    # of its contract, so a distinct here was a SECOND aggregate shuffle of
    # the same rows back-to-back (r15, guide §2.4 — distinct on data the
    # next operator dedupes anyway)
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    ranks = pagerank(edges, damping=0.85, iterations=3, handle_dangling=True)
    return ranks.select("node", rnd(F.col("rank") * 1e6, 6).alias("rank_ppm"))


@_pending(
    "q_chunk_rag_windows",
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, toks, len(toks) AS n FROM t
    ), g AS (
        SELECT doc_id, toks, n,
               unnest(generate_series(0, greatest(n - 1, 0), 24)) AS start
        FROM s
    )
    SELECT doc_id,
           CAST(start // 24 AS INTEGER) AS chunk_id,
           array_to_string(toks[start + 1 : least(start + 32, n)], ' ')
               AS chunk_text,
           CAST(least(start + 32, n) - start AS BIGINT) AS n_tokens
    FROM g
    """,
)
def q_chunk_rag_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-ingestion chunking: 32-token windows with 8-token overlap over
    every document — Project → Generate(posexplode) → Project, zero
    shuffles/UDFs (operators/chunking.py). The oracle replays the
    identical window arithmetic with generate_series + list slicing."""
    from pontem_spark.operators.chunking import chunk_by_tokens

    docs = load_table(spark, sf_dir, "documents")
    return chunk_by_tokens(docs, "doc_id", "text", size=32, overlap=8)


@_pending(
    "q_sample_source_mix",
    oracle="""
    WITH __c AS (
        SELECT source,
               CAST(COUNT(*) AS DOUBLE) AS __cnt,
               CASE source WHEN 'src0' THEN CAST(4.0 AS DOUBLE)
                           WHEN 'src1' THEN CAST(2.0 AS DOUBLE)
                           WHEN 'src2' THEN CAST(1.0 AS DOUBLE)
                           WHEN 'src3' THEN CAST(1.0 AS DOUBLE) END AS __w
        FROM documents GROUP BY source
    ), __r AS (
        SELECT source,
               CAST(FLOOR(MIN(__cnt / __w) OVER () * __w / __cnt * 65536.0)
                    AS BIGINT) AS __thr
        FROM __c WHERE __w IS NOT NULL
    ), kept AS (
        SELECT t.* FROM documents t
        JOIN __r USING (source)
        WHERE (ascii(substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 1)) - 48
               - 39 * CAST(ascii(substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 1)) >= 97 AS INTEGER)) * 4096
            + (ascii(substr(md5(CAST(t.doc_id AS VARCHAR)), 2, 1)) - 48
               - 39 * CAST(ascii(substr(md5(CAST(t.doc_id AS VARCHAR)), 2, 1)) >= 97 AS INTEGER)) * 256
            + (ascii(substr(md5(CAST(t.doc_id AS VARCHAR)), 3, 1)) - 48
               - 39 * CAST(ascii(substr(md5(CAST(t.doc_id AS VARCHAR)), 3, 1)) >= 97 AS INTEGER)) * 16
            + (ascii(substr(md5(CAST(t.doc_id AS VARCHAR)), 4, 1)) - 48
               - 39 * CAST(ascii(substr(md5(CAST(t.doc_id AS VARCHAR)), 4, 1)) >= 97 AS INTEGER))
            < __thr
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS kept_docs,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM kept GROUP BY source
    """,
)
def q_sample_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit target-mix corpus rebalancing (4:2:1:1 over four sources,
    other sources dropped) via deterministic md5 thresholds — one tiny
    count aggregate, a broadcast threshold join and a map-side filter
    (operators/sampling.py::mix_sources). The oracle re-derives the exact
    surviving rows from the identical double-division threshold chain."""
    from pontem_spark.operators.sampling import mix_sources

    docs = load_table(spark, sf_dir, "documents")
    kept = mix_sources(
        docs, "source", "doc_id",
        {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0},
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_docs"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
    )


@_pending(
    "q_quality_dup_ngrams",
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents
    ), f AS (
        SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) >= 3
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, nt - 2),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                   AS gram
        FROM f
    ), c AS (
        SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
               AS top_share,
           ROUND(CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_frac
    FROM c GROUP BY doc_id
    """,
)
def q_quality_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-trigram repetition signals as a pure projection — the
    run-length generalization of q_text_entropy applied to the Gopher
    rep-n family (operators/curation.py::dup_ngram_signals): zero
    Exchanges versus the oracle's doc×gram group-by, identical integer
    counts so the hash matches exactly."""
    from pontem_spark.operators.curation import dup_ngram_signals

    docs = load_table(spark, sf_dir, "documents")
    return dup_ngram_signals(docs, "doc_id", "text", n=3)


@_pending(
    "q_embedding_pca_whiten",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(64 AS INTEGER) AS dim,
           TRUE AS var_ok,
           TRUE AS offdiag_ok
    FROM embeddings
    """,
)
def q_embedding_pca_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA whitening of the embedding corpus, checked by the sketch-family
    derived-output pattern: the whitened covariance is recomputed with a
    second moments pass and reduced to in-plan booleans (every diagonal
    within 2% of 1, max off-diagonal < 0.02) that the oracle asserts as
    literals — a broken eigensolve/projection flips the hash. Both passes
    are per-partition numpy GEMMs; nothing row-scaled reaches the driver
    (operators/pca.py)."""
    import numpy as np

    from pontem_spark.operators.pca import (
        apply_whitening,
        embedding_moments,
        fit_whitening,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    mean, W = fit_whitening(emb, "embedding", eps=1e-9)
    n, wmean, wss = embedding_moments(
        apply_whitening(emb, "embedding", mean, W), "whitened"
    )
    cov = (wss - n * np.outer(wmean, wmean)) / (n - 1)
    diag = np.diag(cov)
    off = cov - np.diag(diag)
    return spark.createDataFrame(
        [
            (
                int(n),
                int(len(diag)),
                bool(np.abs(diag - 1.0).max() < 0.02),
                bool(np.abs(off).max() < 0.02),
            )
        ],
        "n bigint, dim int, var_ok boolean, offdiag_ok boolean",
    )


@_pending(
    "q_graph_triangles",
    oracle="""
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
               GREATEST(a.l_partkey, b.l_partkey) AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST((
               SELECT COUNT(*)
               FROM pairs e1
               JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v
               JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v
           ) AS BIGINT) AS triangles
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph (parts sharing an
    order — non-complete with real community structure at every SF,
    unlike the supplier graph, which is K_n at small SFs) via
    degree-oriented compact-forward counting
    (operators/graph.py::triangle_count) — the oriented out-degree is
    O(sqrt(E)) so the wedge join is bounded; the oracle counts the same
    triangles with the canonical three-way a<b<c join.

    Pair generation is ONE basket shuffle + map-side expansion (r9: the
    self-join shuffled lineitem twice and measured 2.14s vs 1.47s at
    sf0.1 for the identical pair set; pairs-per-order is C(|basket|,2)
    with TPC-H-ish baskets ≤ 7 lines, so the in-map expansion is bounded
    — same discipline as basket_association_rules)."""
    from pontem_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (u, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "v -> struct(u AS src, v AS dst))))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    # with_edge_count reads |E| off the operator's checkpointed edge set —
    # a separate pairs.agg() branch would re-run the expansion + distinct
    return triangle_count(pairs, with_edge_count=True)


def _kcore_oracle(k: int = 3, rounds: int = 6) -> str:
    # Each round references the previous edge CTE several times; without
    # MATERIALIZED DuckDB inlines the chain multiplicatively (observed:
    # "Too many open files" from hundreds of re-opened parquet scans).
    steps = []
    prev = "e0"
    for r in range(1, rounds + 1):
        steps.append(f"""
    d{r} AS MATERIALIZED (
      SELECT n, COUNT(*) AS d FROM (
        SELECT u AS n FROM {prev} UNION ALL SELECT v AS n FROM {prev}
      ) GROUP BY 1
    ),
    k{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE d >= {k}),
    e{r} AS MATERIALIZED (
      SELECT u, v FROM {prev}
      WHERE u IN (SELECT n FROM k{r}) AND v IN (SELECT n FROM k{r})
    )""")
        prev = f"e{r}"
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS u,
                      's' || CAST(l_suppkey AS VARCHAR) AS v
      FROM lineitem WHERE l_quantity >= 48
    ),{",".join(steps)}
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev})
    GROUP BY 1 HAVING COUNT(*) >= {k}
    """


@_pending("q_graph_kcore", _kcore_oracle())
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the sparsified (l_quantity >= 48) part↔supplier graph by
    bounded-round iterative peeling (operators/graph.py::k_core). Peeling
    is monotone and idempotent at the fixpoint, so both engines running
    exactly 6 rounds agree whether or not the data converged earlier
    (probed: fixpoint in 2 rounds at sf0.001 and sf0.01); the oracle
    unrolls the identical 6 degree→filter rounds as CTEs."""
    from pontem_spark.operators.graph import k_core

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    edges = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    return k_core(edges, k=3, max_iterations=6)


@_pending(
    "q_text_bm25_topk",
    oracle="""
    WITH lengths AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM lengths
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
      ) WHERE term IN ('spark', 'join', 'vector')
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY 1),
    contrib AS (
      SELECT t.doc_id,
             ln(CAST(1.0 AS DOUBLE)
                + (s.n - d.dfreq + CAST(0.5 AS DOUBLE))
                  / (d.dfreq + CAST(0.5 AS DOUBLE)))
             * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
             / (CAST(t.tf AS DOUBLE)
                + CAST(1.2 AS DOUBLE)
                  * (CAST(0.25 AS DOUBLE)
                     + CAST(0.75 AS DOUBLE) * l.dl / s.avgdl)) AS c
      FROM tf t
      JOIN dfreq d USING (term)
      JOIN lengths l USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id, ROUND(SUM(c), 4) AS bm25,
           CAST(COUNT(*) AS BIGINT) AS n_terms_hit
    FROM contrib GROUP BY 1
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
    """,
)
def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 documents for the query {spark, join, vector}
    (operators/textstats.py::bm25_topk, k1=1.2 b=0.75): the term filter
    lands before the tf aggregation so only query-term postings shuffle;
    the oracle replays idf/tf/length normalization with every literal cast
    to DOUBLE (the decimal-literal division trap) and ranks on the rounded
    score with doc_id tie-break."""
    from pontem_spark.operators.textstats import bm25_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(docs, "doc_id", "text", ["spark", "join", "vector"], k=10)


@_pending(
    "q_sample_group_split",
    oracle="""
    WITH b AS (
      SELECT user_id, event_type,
             ((ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) * 256 + ascii(substr(md5(CAST(user_id AS VARCHAR)), 2, 1))) % 100) AS bucket
      FROM events
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM b GROUP BY 1
    """,
)
def q_sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 split of events by USER (every row of a user
    lands in one split — row-hash splits would let one user's correlated
    events straddle train/test; operators/sampling.py::group_split, a pure
    map-side projection of the md5 ascii-arithmetic bucket). The oracle
    replays the bucket thresholds; n_users per split also proves no user
    appears twice (sum of per-split distinct users = total users)."""
    from pontem_spark.operators.sampling import group_split

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    return (
        group_split(ev, "user_id", {"train": 80, "val": 10, "test": 10})
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


@_pending(
    "q_ts_time_decay",
    oracle="""
    WITH ref AS MATERIALIZED (
      SELECT user_id, MAX(epoch_us(ts)) AS ref_us FROM events GROUP BY 1
    ),
    wt AS (
      SELECT e.user_id,
             pow(CAST(2.0 AS DOUBLE),
                 -(CAST(r.ref_us - epoch_us(e.ts) AS DOUBLE) / 1e6)
                  / CAST(86400.0 AS DOUBLE)) AS w,
             e.value AS v
      FROM events e JOIN ref r USING (user_id)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(w * v), 4) AS decayed_total,
           ROUND(SUM(w * v) / SUM(w), 4) AS decayed_mean
    FROM wt GROUP BY 1
    """,
)
def q_ts_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential time-decay aggregate (halflife 1 day, aged
    from each user's own latest event — operators/timeseries.py::
    time_decay_agg): the irregular-timestamp complement of ewm, two
    map-side-combinable aggregates and no window/sort. Weights computed in
    double space from unix_micros ages; oracle replays with epoch_us and
    every literal cast to DOUBLE."""
    from pontem_spark.operators.timeseries import time_decay_agg

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return time_decay_agg(ev, "user_id", "ts", "value", halflife_s=86400.0)


def _rrf_oracle() -> str:
    from pontem_spark.queries.similarity import _COS_SQL

    cos = _COS_SQL.format(a="e.embedding", b="p.pe")
    return f"""
    WITH lengths AS MATERIALIZED (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM lengths
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
      ) WHERE term IN ('spark', 'join', 'vector')
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY 1),
    contrib AS (
      SELECT t.doc_id,
             ln(CAST(1.0 AS DOUBLE)
                + (s.n - d.dfreq + CAST(0.5 AS DOUBLE))
                  / (d.dfreq + CAST(0.5 AS DOUBLE)))
             * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
             / (CAST(t.tf AS DOUBLE)
                + CAST(1.2 AS DOUBLE)
                  * (CAST(0.25 AS DOUBLE)
                     + CAST(0.75 AS DOUBLE) * l.dl / s.avgdl)) AS c
      FROM tf t
      JOIN dfreq d USING (term)
      JOIN lengths l USING (doc_id)
      CROSS JOIN stats s
    ),
    bm AS (SELECT doc_id, ROUND(SUM(c), 4) AS s FROM contrib GROUP BY 1),
    bmrank AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
      FROM bm QUALIFY r <= 50
    ),
    probe AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
    cosscore AS (
      SELECT e.vec_id AS doc_id, ROUND({cos}, 6) AS s
      FROM embeddings e, probe p WHERE e.vec_id <> 0
    ),
    cosrank AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
      FROM cosscore QUALIFY r <= 50
    ),
    unioned AS (
      SELECT doc_id, CAST(1.0 AS DOUBLE) / (60 + r) AS c FROM bmrank
      UNION ALL
      SELECT doc_id, CAST(1.0 AS DOUBLE) / (60 + r) AS c FROM cosrank
    )
    SELECT doc_id, ROUND(SUM(c), 6) AS rrf_score,
           CAST(COUNT(*) AS BIGINT) AS n_lists
    FROM unioned GROUP BY 1
    ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
    """


@_pending("q_ann_rrf_fusion", _rrf_oracle())
def q_ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 for {spark, join, vector} fused with
    the embedding-cosine top-50 around doc 0's vector by Reciprocal Rank
    Fusion (operators/similarity.py::rrf_fuse, k0=60) — rank positions
    only, so the lexical and vector scores need no calibration. The
    fusion aggregates only the retrieved candidates (never the corpus);
    the oracle replays both rankings (QUALIFY top-50, id tie-breaks on
    the rounded scores) and the reciprocal sum."""
    from pontem_spark.operators.similarity import brute_force_topk, rrf_fuse
    from pontem_spark.operators.textstats import bm25_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")

    bm = bm25_topk(docs, "doc_id", "text", ["spark", "join", "vector"], k=50)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    bm_ranked = bm.withColumn("rank", F.row_number().over(w)).select("doc_id", "rank")

    cos_ranked = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=50, dim=64
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")

    return rrf_fuse([bm_ranked, cos_ranked], "doc_id", "rank", k0=60, k=10)


def _lpa_oracle(iterations: int = 3) -> str:
    steps = []
    prev = "l0"
    for r in range(1, iterations + 1):
        steps.append(f"""
    l{r} AS MATERIALIZED (
      SELECT u AS node, label FROM (
        SELECT e.u, p.label, COUNT(*) AS c,
               ROW_NUMBER() OVER (
                 PARTITION BY e.u ORDER BY COUNT(*) DESC, p.label DESC
               ) AS rn
        FROM sym e JOIN {prev} p ON p.node = e.v
        GROUP BY e.u, p.label
      ) WHERE rn = 1
    )""")
        prev = f"l{r}"
    return f"""
    WITH und AS MATERIALIZED (
      SELECT DISTINCT LEAST('p' || CAST(a.l_partkey AS VARCHAR),
                            'p' || CAST(b.l_partkey AS VARCHAR)) AS u,
                      GREATEST('p' || CAST(a.l_partkey AS VARCHAR),
                               'p' || CAST(b.l_partkey AS VARCHAR)) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_quantity >= 44 AND b.l_quantity >= 44
    ),
    sym AS MATERIALIZED (
      SELECT u, v FROM und UNION SELECT v, u FROM und
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym),{",".join(steps)}
    SELECT node, label AS community FROM {prev}
    """


@_pending("q_graph_communities", _lpa_oracle())
def q_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities (3 synchronous rounds) on the
    sparsified part co-purchase graph (operators/graph.py::
    label_propagation). Fixed-round synchronous LPA is deterministic even
    where the algorithm oscillates — each round is one |E| join + two
    map-side-combinable aggregates with a struct-max (max count, then max
    label) adoption rule the oracle replays with a windowed
    (COUNT DESC, label DESC) pick."""
    from pontem_spark.operators.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 44)
    pairs = (
        li.alias("a")
        .join(
            li.select(
                F.col("l_orderkey").alias("bo"), F.col("l_partkey").alias("bp")
            ).alias("b"),
            (F.col("a.l_orderkey") == F.col("bo"))
            & (F.col("a.l_partkey") < F.col("bp")),
        )
        .select(
            F.concat(F.lit("p"), F.col("a.l_partkey").cast("string")).alias("src"),
            F.concat(F.lit("p"), F.col("bp").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return label_propagation(pairs, iterations=3)


@_pending(
    "q_profile_skew_report",
    oracle="""
    WITH counts AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS key, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1
    ),
    totals AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS total,
             COUNT(*) AS distinct_keys
      FROM counts
    ),
    top AS (
      SELECT key, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS rank
      FROM counts QUALIFY rank <= 10
    )
    SELECT t.rank, t.key, CAST(t.cnt AS BIGINT) AS cnt,
           ROUND(t.cnt / s.total, 6) AS share,
           ROUND(SUM(t.cnt) OVER (ORDER BY t.rank
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / s.total,
                 6) AS cum_share,
           CAST(s.distinct_keys AS BIGINT) AS distinct_keys
    FROM top t CROSS JOIN totals s
    """,
)
def q_profile_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-key report for lineitem's supplier key — the 'do I need
    salting?' pre-check (operators/profile.py::skew_report): one
    map-side-combinable count aggregate, broadcast totals, TakeOrdered
    top-10 with share and cumulative share; the cumulative window runs
    over the 10 surviving rows, never |keys|."""
    from pontem_spark.operators.profile import skew_report

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    return skew_report(li, "l_suppkey", top_n=10)


@_pending(
    "q_profile_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, e.event_id, CAST(e.value AS DOUBLE) AS value,
             ABS(CAST(e.value AS DOUBLE) - m.med) AS d, m.med
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type, d.event_id, d.value,
           ROUND(CAST(0.6745 AS DOUBLE) * (d.value - d.med) / a.mad, 4) AS robust_z
    FROM dev d JOIN mad a USING (event_type)
    WHERE a.mad > 0
      AND ABS(ROUND(CAST(0.6745 AS DOUBLE) * (d.value - d.med) / a.mad, 4))
          > CAST(3.5 AS DOUBLE)
    """,
)
def q_profile_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers per event type by median absolute deviation
    (operators/profile.py::mad_outliers, modified z > 3.5): two exact-
    percentile aggregates + broadcast joins — no window, no global sort;
    the stddev-based gate hides heavy-tail outliers exactly where this
    doesn't (50% breakdown point). Spark percentile == DuckDB
    quantile_cont (the established exact-interpolation pair)."""
    from pontem_spark.operators.profile import mad_outliers

    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return mad_outliers(ev, "event_type", "event_id", "value", threshold=3.5)


@_pending(
    "q_text_ctfidf_terms",
    oracle="""
    WITH tok AS (
      SELECT source AS cls,
             unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT cls, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    wc AS (SELECT cls, CAST(SUM(tf) AS BIGINT) AS wc FROM tf GROUP BY 1),
    ft AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ft FROM tf GROUP BY 1),
    a AS (SELECT AVG(CAST(wc AS DOUBLE)) AS a FROM wc),
    scored AS (
      SELECT t.cls, t.term, t.tf, f.ft,
             ROUND((CAST(t.tf AS DOUBLE) / w.wc)
                   * ln(CAST(1.0 AS DOUBLE) + a.a / f.ft), 4) AS score
      FROM tf t JOIN wc w USING (cls) JOIN ft f USING (term) CROSS JOIN a
    )
    SELECT cls AS source, term, tf, ft, score, term_rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY cls ORDER BY score DESC, tf DESC, term ASC
      ) AS term_rank
      FROM scored
    ) WHERE term_rank <= 5
    """,
)
def q_text_ctfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per SOURCE by class-based TF-IDF
    (operators/textstats.py::ctfidf_top_terms, the BERTopic c-TF-IDF
    form) — per-class profiling of a training mix, two hash shuffles
    ((class, term) then term), broadcast class totals, tiny per-class
    top-k windows."""
    from pontem_spark.operators.textstats import ctfidf_top_terms

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return ctfidf_top_terms(docs, "source", "text", k=5)


@_pending(
    "q_events_rfm",
    oracle="""
    WITH per_key AS (
      SELECT user_id,
             MAX(epoch_us(ts)) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             ROUND(SUM(CAST(value AS DOUBLE)), 4) AS monetary
      FROM events GROUP BY 1
    ),
    ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events)
    SELECT user_id,
           CAST(FLOOR((r.ref_us - p.last_us) / 86400000000) AS BIGINT)
             AS recency_days,
           frequency, monetary,
           NTILE(5) OVER (ORDER BY
             FLOOR((r.ref_us - p.last_us) / 86400000000) ASC, user_id ASC)
             AS r_score,
           NTILE(5) OVER (ORDER BY frequency DESC, user_id ASC) AS f_score,
           NTILE(5) OVER (ORDER BY monetary DESC, user_id ASC) AS m_score
    FROM per_key p CROSS JOIN ref r
    """,
)
def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user RFM behavioral features with quintile scores
    (operators/timeseries.py::rfm_features): one map-side-combinable
    aggregate carries recency/frequency/monetary, the reference time is a
    broadcast 1-row max, and the three ntile windows run over the
    |users|-row aggregate (total orders with user_id ties, so tile
    boundaries are engine-deterministic) — never over the events."""
    from pontem_spark.operators.timeseries import rfm_features

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return rfm_features(ev, "user_id", "ts", "value", n_tiles=5)


@_pending(
    "q_sample_negatives",
    oracle="""
    WITH pos AS MATERIALIZED (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS p
      FROM documents
    ),
    n AS (SELECT COUNT(*) AS n FROM pos),
    anchors AS (
      SELECT p.doc_id AS anchor_id, s.slot,
             (p.p + s.slot
              * GREATEST(CAST(FLOOR(n.n / (3 + 1.0)) AS BIGINT), 1)) % n.n AS np
      FROM pos p CROSS JOIN n
      CROSS JOIN (SELECT unnest([1, 2, 3]) AS slot) s
      WHERE n.n > 3
    )
    SELECT a.anchor_id, CAST(a.slot AS INTEGER) AS slot,
           q.doc_id AS negative_id
    FROM anchors a JOIN pos q ON q.p = a.np
    """,
)
def q_sample_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negatives: 3 ring-offset negatives per
    document (operators/sampling.py::negative_samples) — positions from
    the engine's distributed enumeration, negatives at (pos + slot·step)
    mod n, so the pairing is reproducible across engines and retries and
    a negative can never equal its anchor. Cast trap pinned in both
    directions: step uses explicit FLOOR because Spark's double→bigint
    cast truncates while DuckDB's ROUNDS."""
    from pontem_spark.operators.sampling import negative_samples

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return negative_samples(docs, "doc_id", k=3)


@_pending(
    "q_api_where_ffill_rolling",
    oracle="""
    WITH seq AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS v,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS pos
      FROM orders WHERE o_orderkey <= 2000
    ),
    gated AS (
      SELECT o_orderkey, pos,
             CASE WHEN v < CAST(100000.0 AS DOUBLE) THEN v END AS v
      FROM seq
    ),
    filled AS (
      SELECT o_orderkey, pos,
             last_value(v IGNORE NULLS) OVER (
               ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS v
      FROM gated
    )
    SELECT o_orderkey,
           ROUND(AVG(v) OVER (
             ORDER BY pos ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS smoothed
    FROM filled
    """,
)
def q_api_where_ffill_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r7 frame-API surface composed end-to-end through the wrapper:
    scalar comparison (df < x, missing-compares-False), where (null out
    the gated cells), ffill (one shared window), rolling(3,
    min_periods=1).mean() (FrameRolling, same shared sort) — the outlier
    null-and-smooth idiom; the oracle replays the identical two window
    scans in SQL."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("v"))
    )
    f = from_spark(base, index_col="o_orderkey")[["v"]]
    smoothed = f.where(f < 100000.0).ffill().rolling(3, min_periods=1).mean()
    out = smoothed.to_spark(index_col="o_orderkey")
    return out.select(
        "o_orderkey", rnd(F.col("v"), 4).alias("smoothed")
    )


_TIME_DECAY_ORACLE = """
    WITH ref AS MATERIALIZED (
      SELECT user_id, MAX(epoch_us(ts)) AS ref_us FROM events GROUP BY 1
    ),
    wt AS (
      SELECT e.user_id,
             pow(CAST(2.0 AS DOUBLE),
                 -(CAST(r.ref_us - epoch_us(e.ts) AS DOUBLE) / 1e6)
                  / CAST(86400.0 AS DOUBLE)) AS w,
             e.value AS v
      FROM events e JOIN ref r USING (user_id)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(w * v), 4) AS decayed_total,
           ROUND(SUM(w * v) / SUM(w), 4) AS decayed_mean
    FROM wt GROUP BY 1
    """


@_pending("q_stream_time_decay", _TIME_DECAY_ORACLE)
def q_stream_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted rollup as a STREAM: events re-written as three
    files, streamed back one file per trigger, each micro-batch folded
    into the decayed monoid state (streaming/events.py::
    run_decayed_rollup) — exponential decay re-anchors by one
    multiplication, so the stream never rescans history. The oracle
    computes the same statistic in one direct pass over all events:
    hash-equality proves the batch×streaming decomposition is exact
    (up to the shared rounding) no matter how rows were sliced."""
    import tempfile

    from pontem_spark.operators.incremental import finalize_decayed
    from pontem_spark.streaming.events import run_decayed_rollup

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    tmp = tempfile.mkdtemp(prefix="pontem_stream_decay_")
    try:
        events.repartition(3).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(tmp)
        )
        state, n_batches = run_decayed_rollup(stream, "user_id", "ts", "value", 86400.0)
        if n_batches < 3:
            raise RuntimeError(f"expected >=3 micro-batches, got {n_batches}")
        return finalize_decayed(state, "user_id")
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


@_pending(
    "q_api_value_counts_xs",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS count
    FROM documents WHERE lang = 'en' GROUP BY source
    """,
)
def q_api_value_counts_xs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r7 frame surface composed: documents (lang, source) →
    value_counts (one hash agg into a struct-indexed Series) → xs('en',
    level='lang') (pushdown filter on the struct field + level drop) —
    the oracle is the equivalent filtered GROUP BY."""
    from pontem_spark.core import from_spark

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    f = from_spark(docs, index_col="doc_id")[["lang", "source"]]
    vc = f.value_counts()
    en = vc.xs("en", level="lang")
    out = en.to_spark(value_name="count")
    idx = [c for c in out.columns if c != "count"][0]
    return out.select(F.col(idx).alias("source"), F.col("count"))


@_pending(
    "q_api_groupby_skew_sem",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             CAST(COUNT(o_totalprice) AS DOUBLE) AS n,
             SUM(CAST(o_totalprice AS DOUBLE)) AS s1,
             SUM(CAST(o_totalprice AS DOUBLE) * CAST(o_totalprice AS DOUBLE)) AS s2,
             SUM(CAST(o_totalprice AS DOUBLE) * CAST(o_totalprice AS DOUBLE)
                 * CAST(o_totalprice AS DOUBLE)) AS s3
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority,
           ROUND(
             CASE WHEN n >= 3 THEN
               CASE WHEN (s2/n - (s1/n)*(s1/n)) > 0 THEN
                 ((s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n))
                  / pow(s2/n - (s1/n)*(s1/n), CAST(1.5 AS DOUBLE)))
                 * sqrt(n*(n-1.0)) / (n-2.0)
               ELSE CAST(0.0 AS DOUBLE) END
             END, 6) AS skew,
           ROUND(
             CASE WHEN n >= 2 THEN
               sqrt(greatest(s2 - s1*s1/n, CAST(0.0 AS DOUBLE)) / (n-1.0)) / sqrt(n)
             END
           , 6) AS sem
    FROM m
    """,
)
def q_api_groupby_skew_sem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped skewness (adjusted Fisher-Pearson G1) and standard error
    of the mean per order priority — both derived from raw moment sums
    (n, Σx, Σx², Σx³) on BOTH engines (core/groupby.py::_COMPOSITE_AGGS;
    engine-native skewness()/stddev accumulations differ, the
    derive-from-sums discipline does not)."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_totalprice").cast("double").alias("v")
    )
    f = from_spark(orders, index_col="o_orderkey")
    agg = f.groupby("o_orderpriority").agg({"v": ["skew", "sem"]})
    out = agg.to_spark(index_col="o_orderpriority")
    return out.select(
        "o_orderpriority",
        rnd(F.col("v_skew"), 6).alias("skew"),
        rnd(F.col("v_sem"), 6).alias("sem"),
    )


@_pending(
    "q_pipeline_feature_store",
    oracle="""
    WITH per_key AS (
      SELECT user_id,
             MAX(epoch_us(ts)) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             ROUND(SUM(CAST(value AS DOUBLE)), 4) AS monetary
      FROM events GROUP BY 1
    ),
    ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events),
    rfm AS (
      SELECT user_id,
             CAST(FLOOR((r.ref_us - p.last_us) / 86400000000) AS BIGINT)
               AS recency_days,
             frequency, monetary
      FROM per_key p CROSS JOIN ref r
    ),
    decay AS (
      SELECT e.user_id,
             ROUND(SUM(pow(CAST(2.0 AS DOUBLE),
                   -(CAST(k.last_us - epoch_us(e.ts) AS DOUBLE) / 1e6)
                    / CAST(86400.0 AS DOUBLE)) * e.value), 4) AS decayed_total
      FROM events e JOIN per_key k USING (user_id)
      GROUP BY 1
    )
    SELECT r.user_id, r.recency_days, r.frequency, r.monetary,
           d.decayed_total,
           CASE WHEN {bucket} < 80 THEN 'train'
                WHEN {bucket} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM rfm r JOIN decay d USING (user_id)
    """.format(
        bucket="((ascii(substr(md5(CAST(r.user_id AS VARCHAR)), 1, 1)) * 256 "
        "+ ascii(substr(md5(CAST(r.user_id AS VARCHAR)), 2, 1))) % 100)"
    ),
)
def q_pipeline_feature_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-store pipeline composed end-to-end: RFM behavioral
    block (one aggregate pass) × exponential time-decay totals (two
    map-side-combinable aggregates) × leakage-safe split assignment (a
    free map-side projection) — all joined on the user key, so the whole
    pipeline is two aggregate shuffles plus key-joins of |users|-row
    frames. The oracle replays every leg as CTEs over the same events."""
    from pontem_spark.operators.sampling import group_split
    from pontem_spark.operators.timeseries import rfm_features, time_decay_agg

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    rfm = rfm_features(ev, "user_id", "ts", "value").select(
        "user_id", "recency_days", "frequency", "monetary"
    )
    decay = time_decay_agg(ev, "user_id", "ts", "value", 86400.0).select(
        "user_id", "decayed_total"
    )
    feats = rfm.join(decay, "user_id")
    return group_split(feats, "user_id", {"train": 80, "val": 10, "test": 10})
