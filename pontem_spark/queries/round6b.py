"""Round-6 (continued): corpus curation, mergeable sketches, and pandas tails.

Everything here is a north-star LLM-pipeline extension — the reference has
none of this surface (SURVEY §2.G); each query pairs a Spark-first
implementation with a DuckDB oracle that replays the same rule exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table

# the window-list expression both engines share for boilerplate removal:
# non-overlapping 5-word chunks, last chunk may be short
_WIN_LIST = (
    "[array_to_string(string_split(text,' ')[(i-1)*5+1:i*5],' ') "
    "for i in generate_series(1, CAST(ceil(len(string_split(text,' '))/5.0) AS BIGINT))]"
)


@register(
    "q_curation_boilerplate_removal",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, unnest({_WIN_LIST}) AS chunk FROM documents
    ),
    bl AS (
      SELECT coalesce(list(chunk ORDER BY chunk), []) AS b FROM (
        SELECT chunk FROM chunks GROUP BY chunk HAVING COUNT(DISTINCT doc_id) > 3
      )
    )
    SELECT d.doc_id,
      -- a fully-boilerplate doc becomes '' (Spark's array_join([]) = '';
      -- DuckDB's array_to_string([]) is NULL — align on '')
      coalesce(
        array_to_string(list_filter({_WIN_LIST}, c -> NOT list_contains(bl.b, c)), ' '),
        '') AS clean_text,
      CAST(coalesce(len(list_filter({_WIN_LIST}, c -> list_contains(bl.b, c))), 0)
        AS INTEGER) AS n_removed
    FROM documents d, bl
    """,
    tags=("curation", "dedup", "text", "boilerplate"),
)
def q_curation_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-chunk boilerplate removal (the RefinedWeb/CCNet line filter):
    5-word spans occurring in >3 distinct documents are stripped from every
    document, which is reassembled in place. One shuffle total (the
    chunk document-frequency aggregate — chunks travel, documents don't);
    the frequent set rides a single broadcast array row into a pure
    map-side rebuild (operators/curation.py:remove_boilerplate). The hash
    check proves both engines rebuild every cleaned document byte-equal."""
    from pontem_spark.operators.curation import remove_boilerplate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_boilerplate(docs, id_col="doc_id", text_col="text", window=5, max_doc_freq=3)


def _hist_quantile_oracle() -> str:
    from pontem_spark.operators.sketches import histogram_quantiles_sql

    items = ",\n      ".join(
        histogram_quantiles_sql(
            "bins", {"p50": 0.5, "p90": 0.9, "p99": 0.99}, lo=0.0, hi=640.0, n_bins=32
        )
    )
    return f"""
    WITH binned AS (
      SELECT event_type,
             LEAST(31, GREATEST(0, CAST(floor((value - 0.0) / 20.0) AS INTEGER))) AS b
      FROM events WHERE value IS NOT NULL
    ),
    grid AS (
      SELECT et.event_type, gs.i
      FROM (SELECT DISTINCT event_type FROM binned) et,
           (SELECT unnest(generate_series(0, 31)) AS i) gs
    ),
    cnts AS (SELECT event_type, b, COUNT(*) AS c FROM binned GROUP BY 1, 2),
    hstate AS (
      SELECT g.event_type, list(CAST(coalesce(c.c, 0) AS BIGINT) ORDER BY g.i) AS bins
      FROM grid g LEFT JOIN cnts c ON g.event_type = c.event_type AND g.i = c.b
      GROUP BY 1
    )
    SELECT event_type,
      {items}
    FROM hstate
    """


@register(
    "q_sketch_histogram_quantiles",
    oracle=_hist_quantile_oracle(),
    tags=("sketch", "quantile", "incremental", "mergeable"),
)
def q_sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles via fixed-bin histogram states — the
    exactly-checkable sketch: per-(event_type, day) count arrays are built,
    split into two frames, key-wise MERGED back (in-row fold over collected
    blobs), and p50/p90/p99 finalized read-time by deterministic
    integer-rank interpolation (operators/sketches.py). Because histogram
    merge is exact, the oracle rebuilds the state directly from raw rows
    and every interpolated double must hash-match — proving the whole
    build → merge → finalize pipeline, which HLL's probabilistic estimates
    never could."""
    from pontem_spark.operators.sketches import (
        histogram_quantiles,
        histogram_state,
        merge_histograms,
    )

    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = histogram_state(
        events, ["event_type", "day"], "value", lo=0.0, hi=640.0, n_bins=32
    )
    even = daily.filter(F.dayofmonth("day") % 2 == 0)
    odd = daily.filter(F.dayofmonth("day") % 2 == 1)
    merged = merge_histograms(even, odd, ["event_type"], n_bins=32)
    return histogram_quantiles(
        merged,
        ["event_type"],
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
        lo=0.0,
        hi=640.0,
        n_bins=32,
    )


@register(
    "q_api_rank",
    oracle="""
    WITH c AS (
      SELECT c_acctbal AS v, COUNT(*) AS n, min(c_custkey) AS dummy
      FROM customer GROUP BY 1
    ),
    r AS (
      SELECT v,
             CAST(SUM(n) OVER (ORDER BY v) - n + (n + 1) / 2.0 AS DOUBLE) AS rnk
      FROM c
    )
    SELECT cu.c_custkey, r.rnk
    FROM customer cu JOIN r ON cu.c_acctbal = r.v
    """,
    tags=("api", "rank", "window"),
)
def q_api_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas Series.rank (method='average') over customer balances,
    per-customer — computed on the distinct-value frame (groupBy shuffle at
    value_counts cardinality + one window over the K distinct balances +
    join back), never a global sort of the raw rows (core/series.py::rank).
    The oracle derives the same average rank relationally."""
    from pontem_spark.core import from_spark

    df = from_spark(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ).set_index("c_custkey")
    r = df["c_acctbal"].rank()
    out = r.to_spark(value_name="rnk")
    return out.select(F.col("c_custkey").cast("long").alias("c_custkey"), "rnk")


def _weighted_sample_oracle() -> str:
    from pontem_spark.operators.sampling import weighted_sample_key_sql

    key = weighted_sample_key_sql("doc_id", "n_chars")
    return f"""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY {key} DESC, doc_id ASC
             ) AS rn
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ) WHERE rn <= 10
    """


@register(
    "q_sample_weighted",
    oracle=_weighted_sample_oracle(),
    tags=("sampling", "weighted", "deterministic"),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sampling without replacement, per language: the
    Efraimidis–Spirakis exponential race with a deterministic md5-derived
    uniform, so DuckDB re-runs the identical race and must select the
    identical winners (operators/sampling.py::weighted_sample).
    Deterministic across engines because the uniform u is a DISCRETE
    16-bit md5-derived value — adjacent priority keys differ by far more
    than the ≤1-ulp skew two engines' ln() could introduce — with doc_id
    as the total-order tie-break (priorities are NOT rounded; rounding
    would create ties exactly at the top-k boundary)."""
    from pontem_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample(docs, "doc_id", "n_chars", k=10, strata=["lang"])


def _pagerank_oracle(damping: float = 0.85, iterations: int = 3) -> str:
    prev = "r0"
    steps = []
    for k in range(1, iterations + 1):
        steps.append(f"""
    r{k} AS (
      SELECT nd.node AS node,
             CAST({1.0 - damping!r} AS DOUBLE) / nn.n
             + CAST({damping!r} AS DOUBLE) * coalesce(s.c, CAST(0 AS DOUBLE)) AS rank
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank / d.outdeg) AS c
        FROM edges e
        JOIN {prev} r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY 1
      ) s ON s.node = nd.node
    )""")
        prev = f"r{k}"
    return f"""
    WITH pairs AS (
      SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS p,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem
    ),
    edges AS (
      SELECT p AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, p AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM edges GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes, nn),{",".join(steps)}
    SELECT node, ROUND(rank * 1e6, 6) AS rank_ppm
    FROM {prev}
    """


@register(
    "q_graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative", "pagerank"),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 3 power iterations) over the bipartite
    part↔supplier graph from lineitem — the iterative-algorithm pattern as
    driver-looped joins+aggregates with lineage checkpoints
    (operators/graph.py::pagerank). The oracle unrolls the identical three
    iterations as CTEs; ranks are scaled to parts-per-million and rounded
    so the two engines' summation orders cannot flip the hash."""
    from pontem_spark.functions.compat import rnd
    from pontem_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("p"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
    ).distinct()
    edges = pairs.select(F.col("p").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("p").alias("dst"))
    )
    # the union above symmetrizes the graph, so every vertex has out-degree
    # ≥ 1 by construction — the dangling-mass probes (one scalar agg per
    # iteration) would sum an empty filter three times for nothing
    ranks = pagerank(edges, damping=0.85, iterations=3, handle_dangling=False)
    return ranks.select(
        "node", rnd(F.col("rank") * 1e6, 6).alias("rank_ppm")
    )


@register(
    "q_profile_mutual_info",
    oracle="""
    WITH cells AS (
      SELECT coalesce(CAST(lang AS VARCHAR), '__null__') AS x,
             coalesce(CAST(source AS VARCHAR), '__null__') AS y,
             COUNT(*) AS nxy
      FROM documents GROUP BY 1, 2
    ),
    m AS (
      SELECT x, y, nxy,
             SUM(nxy) OVER (PARTITION BY x) AS nx,
             SUM(nxy) OVER (PARTITION BY y) AS ny,
             SUM(nxy) OVER () AS n
      FROM cells
    ),
    agg AS (
      SELECT MAX(n) AS n,
             SUM((nxy / CAST(n AS DOUBLE))
                 * ln((nxy / CAST(n AS DOUBLE))
                      / ((nx / CAST(n AS DOUBLE)) * (ny / CAST(n AS DOUBLE))))) AS mi,
             SUM((nxy - CAST(nx AS DOUBLE) * ny / CAST(n AS DOUBLE))
                 * (nxy - CAST(nx AS DOUBLE) * ny / CAST(n AS DOUBLE))
                 / (CAST(nx AS DOUBLE) * ny / CAST(n AS DOUBLE))) AS chi2,
             -SUM(((nx / CAST(n AS DOUBLE)) * ln(nx / CAST(n AS DOUBLE)))
                  * (nxy / CAST(nx AS DOUBLE))) AS hx,
             -SUM(((ny / CAST(n AS DOUBLE)) * ln(ny / CAST(n AS DOUBLE)))
                  * (nxy / CAST(ny AS DOUBLE))) AS hy
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(mi, 6) AS mi_nats,
           CASE WHEN hx > 0 AND hy > 0
                THEN ROUND(mi / sqrt(hx * hy), 6) END AS nmi,
           ROUND(chi2, 6) AS chi2
    FROM agg
    """,
    tags=("profile", "association", "mutual-information"),
)
def q_profile_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information / normalized MI / chi-squared between lang and
    source — the two-column association screen beside PSI's one-column
    drift screen, from ONE contingency-table pass with windowed marginals
    (operators/profile.py::categorical_association)."""
    from pontem_spark.operators.profile import categorical_association

    docs = load_table(spark, sf_dir, "documents")
    return categorical_association(docs, "lang", "source")


@register(
    "q_stream_histogram_quantiles",
    oracle=_hist_quantile_oracle(),
    tags=("streaming", "sketch", "quantile", "incremental"),
)
def q_stream_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous quantiles end to end: events re-written as three parquet
    files, streamed back one file per trigger, each micro-batch's histogram
    state merged into the accumulated state via foreachBatch
    (streaming/events.py::run_histogram_rollup). Histogram merge is EXACT,
    so the final p50/p90/p99 hash-match the same direct-build oracle as the
    batch query — proving the streaming composition loses nothing no
    matter how the rows were sliced into batches."""
    import shutil
    import tempfile

    from pontem_spark.operators.sketches import histogram_quantiles
    from pontem_spark.streaming.events import run_histogram_rollup

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    tmp = tempfile.mkdtemp(prefix="pontem_stream_hist_")
    try:
        events.repartition(3).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(tmp)
        )
        state, n_batches = run_histogram_rollup(
            stream, ["event_type"], "value", lo=0.0, hi=640.0, n_bins=32
        )
        if n_batches < 3:
            raise RuntimeError(
                f"expected >=3 micro-batches, got {n_batches} — the"
                " multi-batch merge path was not exercised"
            )
        return histogram_quantiles(
            state,
            ["event_type"],
            {"p50": 0.5, "p90": 0.9, "p99": 0.99},
            lo=0.0,
            hi=640.0,
            n_bins=32,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "q_embedding_dim_profile",
    oracle="""
    WITH x AS (
      SELECT CAST(u.i - 1 AS INTEGER) AS dim, CAST(embedding[u.i] AS DOUBLE) AS v
      FROM embeddings,
      LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(v) / COUNT(*), 4) AS mean,
           ROUND(sqrt(GREATEST((SUM(v * v) - SUM(v) * SUM(v) / COUNT(*))
                               / (COUNT(*) - 1), CAST(0 AS DOUBLE))), 4) AS sd,
           ROUND(MIN(v), 4) AS lo,
           ROUND(MAX(v), 4) AS hi
    FROM x GROUP BY dim
    """,
    tags=("profile", "embedding", "vector"),
)
def q_embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding QA profile: posexplode + map-side-combined
    groupBy(pos), so the shuffle carries ~dims×partitions partial rows,
    never rows×dims; stddev from (n, Σx, Σx²) mirrored term-for-term in
    the oracle (operators/profile.py::embedding_dimension_profile)."""
    from pontem_spark.operators.profile import embedding_dimension_profile

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dimension_profile(emb, "embedding")


def _grouped_qcut_oracle() -> str:
    from pontem_spark.operators.binning import grouped_quantile_bins_oracle_sql

    cte, bucket = grouped_quantile_bins_oracle_sql("orders", "o_orderpriority", "o_totalprice", q=4)
    return f"""
    WITH {cte}
    SELECT o_orderkey, o_orderpriority, {bucket} AS price_bucket
    FROM orders JOIN bnds USING (o_orderpriority)
    """


@register(
    "q_api_grouped_qcut",
    oracle=_grouped_qcut_oracle(),
    tags=("api", "binning", "quantile", "grouped"),
)
def q_api_grouped_qcut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group equal-frequency binning (qcut within each order priority):
    one grouped percentile aggregate, broadcast boundary join on the group
    key, map-side bucket fold — no window, no sort, no per-group job
    (operators/binning.py::grouped_quantile_bins)."""
    from pontem_spark.operators.binning import grouped_quantile_bins

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return grouped_quantile_bins(
        orders, "o_orderpriority", "o_totalprice", q=4, bucket_name="price_bucket"
    ).select("o_orderkey", "o_orderpriority", "price_bucket")


def _pipeline_oracle() -> str:
    from pontem_spark.operators.sampling import hash_bucket_sql

    bucket = hash_bucket_sql("doc_id", 100)
    win = _WIN_LIST
    return f"""
    WITH gated AS (
      SELECT doc_id, text FROM documents
      WHERE lang = 'en' AND len(string_split(text, ' ')) >= 30
    ),
    chunks AS (
      SELECT doc_id, unnest({win}) AS chunk FROM gated
    ),
    bl AS (
      SELECT coalesce(list(chunk ORDER BY chunk), []) AS b FROM (
        SELECT chunk FROM chunks GROUP BY chunk HAVING COUNT(DISTINCT doc_id) > 3
      )
    ),
    cleaned AS (
      SELECT g.doc_id,
             coalesce(array_to_string(
               list_filter({win}, c -> NOT list_contains(bl.b, c)), ' '), '')
               AS clean_text
      FROM gated g, bl
    ),
    survivors AS (
      SELECT MIN(doc_id) AS doc_id, ANY_VALUE(clean_text) AS clean_text
      FROM cleaned GROUP BY md5(clean_text)
    )
    SELECT doc_id,
           CASE WHEN {bucket} < 80 THEN 'train' ELSE 'test' END AS split,
           CAST(len(string_split(clean_text, ' ')) AS INTEGER) AS n_tokens
    FROM survivors
    """


@register(
    "q_pipeline_corpus_prep",
    oracle=_pipeline_oracle(),
    tags=("pipeline", "curation", "dedup", "composition"),
)
def q_pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-prep pipeline as ONE lazy plan — the composition a
    real training-data run executes: language + length gate → corpus-level
    boilerplate removal → exact dedup on the CLEANED text (min-id
    survivorship; boilerplate-only differences collapse) → deterministic
    80/20 split → per-doc token count. Every stage reuses the registered
    operator (curation.remove_boilerplate, dedup-style md5 groupBy,
    sampling.hash_bucket), and the oracle replays the identical chain as
    CTEs — hash equality proves the stages compose losslessly, not just
    pass individually.

    Scale: the stages add shuffles only where their standalone forms do
    (chunk agg; md5 groupBy); the gate/split/count are map-side.
    Catalyst pipelines the whole chain — no materialization between
    stages."""
    from pontem_spark.operators.curation import remove_boilerplate
    from pontem_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    gated = docs.filter(
        (F.col("lang") == "en") & (F.size(F.split(F.col("text"), " ")) >= 30)
    ).select("doc_id", "text")
    cleaned = remove_boilerplate(
        gated, id_col="doc_id", text_col="text", window=5, max_doc_freq=3
    ).select("doc_id", "clean_text")
    survivors = cleaned.groupBy(F.md5("clean_text")).agg(
        F.min("doc_id").alias("doc_id"), F.any_value("clean_text").alias("clean_text")
    )
    return survivors.select(
        "doc_id",
        F.when(hash_bucket("doc_id", 100) < 80, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
        F.size(F.split(F.col("clean_text"), " ")).alias("n_tokens"),
    )


_COS_SQL = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(generate_series(1, len({b})), "
    "i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
)


@register(
    "q_ann_filtered_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({_COS_SQL.format(a='q.embedding', b='c.embedding')}, 6) AS cos_sim
        FROM embeddings q
        JOIN embeddings c
          ON q.vec_id < 10 AND c.vec_id != q.vec_id AND c.label IN (0, 1)
    ), ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
    tags=("similarity", "ann", "filtered", "topk"),
)
def q_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — the production ANN shape almost every
    retrieval system needs (metadata predicate AND nearest-neighbor): the
    label predicate is applied to the corpus BEFORE pair scoring, so it
    reaches the parquet scan as a pushed filter and the similarity work is
    proportional to the filtered subset, not the corpus. Post-filtering
    top-k instead (score all, then filter) would both waste the scoring
    work and silently return < k results."""
    from pontem_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("label").isin(0, 1))
    return S.brute_force_topk(corpus, queries, k=5, dim=64)


@register(
    "q_window_percent_rank",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice), 6) AS cume
    FROM orders
    """,
    tags=("window", "percent_rank", "cume_dist"),
)
def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per priority partition — the two remaining
    analytic window functions; both share ONE partitioned sort (no second
    Exchange). Relative ranks are what feature pipelines feed models
    instead of raw amounts."""
    from pyspark.sql import Window

    from pontem_spark.functions.compat import rnd

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q_api_topk_per_group_agg",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
    tags=("api", "topk", "agg", "no-window"),
)
def q_api_topk_per_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group WITHOUT a window, as a SALTED two-phase aggregate:
    phase 1 takes top-3 within (group, salt) — the collect_list buffer is
    bounded by group_size/n_salt, the knob that keeps the worst key's
    buffer small at any scale — and phase 2 re-ranks the ≤ 3·n_salt
    survivors per group (top-3 of per-salt top-3s is exactly the global
    top-3). Replaces the window's partition-wide SORT with two hash
    aggregates whose second input is provably tiny. The oracle is the
    window formulation — value equality proves the two plans are
    semantically interchangeable."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)

    def top3(df, keys):
        # ascending (-price, key): the slice head IS the top by price with
        # the deterministic key tie-break
        return df.groupBy(*keys).agg(
            F.slice(F.array_sort(F.collect_list("__t")), 1, 3).alias("top")
        )

    packed = j.select(
        "c_mktsegment",
        F.pmod(F.col("o_orderkey"), F.lit(8)).alias("__salt"),
        F.struct(
            (-F.col("o_totalprice")).alias("np"), F.col("o_orderkey").alias("k")
        ).alias("__t"),
    )
    local = top3(packed, ["c_mktsegment", "__salt"]).select(
        "c_mktsegment", F.explode("top").alias("__t")
    )
    final = top3(local, ["c_mktsegment"])
    return final.select("c_mktsegment", F.explode("top").alias("t")).select(
        "c_mktsegment",
        F.col("t.k").alias("o_orderkey"),
        (-F.col("t.np")).alias("o_totalprice"),
    )
