"""Scalar-function family queries (string / date / math), statistics,
conditional aggregation, pivot, grouping sets — the SURVEY §2.G built-in
surface, each oracle-checked. All pure Column expressions; per-row work
stays in WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table, register_views


@register(
    "q_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                       AS up,
           lower(c_mktsegment)                 AS lo,
           length(c_name)                      AS n_chars,
           substr(c_name, 1, 8)                AS prefix,
           c_name || '/' || c_mktsegment       AS joined,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key
    FROM customer
    WHERE c_name LIKE 'Customer%'
    """,
    tags=("scalar", "string"),
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_name").like("Customer%")).select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").alias("n_chars"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("joined"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
    )


@register(
    "q_date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                   AS y,
           month(o_orderdate)                  AS m,
           day(o_orderdate)                    AS d,
           quarter(o_orderdate)                AS q,
           dayofweek(o_orderdate)              AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)::VARCHAR   AS due_date
    FROM orders
    WHERE year(o_orderdate) = 1997
    """,
    tags=("scalar", "date"),
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date parts + truncation + arithmetic. Convention note: Spark
    dayofweek is 1=Sunday, DuckDB 0=Sunday — normalized here."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.year("o_orderdate") == 1997).select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.quarter("o_orderdate").cast("bigint").alias("q"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
    )


@register(
    "q_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(sqrt(l_quantity), 6)                 AS sq,
           ROUND(ln(l_extendedprice), 6)              AS log_price,
           ROUND(log10(l_extendedprice), 6)           AS log10_price,
           ROUND(exp(l_discount), 6)                  AS exp_disc,
           CAST(ceil(l_extendedprice) AS BIGINT)      AS ceil_price,
           CAST(floor(l_extendedprice) AS BIGINT)     AS floor_price,
           ROUND(pow(l_quantity, 2), 2)               AS qty_sq,
           ROUND(abs(l_discount - 0.05), 6)           AS disc_dev
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey < 1000
    """,
    tags=("scalar", "math"),
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") < 1000)).select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.sqrt("l_quantity"), 6).alias("sq"),
        rnd(F.log(F.col("l_extendedprice")), 6).alias("log_price"),
        rnd(F.log10("l_extendedprice"), 6).alias("log10_price"),
        rnd(F.exp("l_discount"), 6).alias("exp_disc"),
        F.ceil("l_extendedprice").cast("bigint").alias("ceil_price"),
        F.floor("l_extendedprice").cast("bigint").alias("floor_price"),
        rnd(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        rnd(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont). The approximate variant (percentile_approx) is in
    q_approx_aggregates as a rows-only check — sketch outputs are
    engine-specific by nature."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE percentile buffer computing all three quantiles (array form) —
    # three separate aggregates would each collect and sort the group's
    # values independently (3x memory, 3x sort)
    pcts = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(pcts.alias("__ps"))
        .select(
            "l_returnflag",
            rnd(F.col("__ps")[0], 4).alias("p25"),
            rnd(F.col("__ps")[1], 4).alias("p50"),
            rnd(F.col("__ps")[2], 4).alias("p90"),
        )
    )


@register(
    "q_stats_corr",
    oracle="""
    SELECT l_linestatus,
           ROUND(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           ROUND(stddev_samp(l_quantity), 6)                 AS qty_std,
           ROUND(var_samp(l_discount), 8)                    AS disc_var
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg", "statistics"),
)
def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        rnd(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        rnd(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        rnd(F.stddev_samp("l_quantity"), 6).alias("qty_std"),
        rnd(F.var_samp("l_discount"), 8).alias("disc_var"),
    )


@register(
    "q_conditional_agg",
    oracle="""
    SELECT o_custkey,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F')                    AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O')                    AS n_open,
           ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice ELSE 0 END), 2)               AS urgent_spend,
           ROUND(SUM(o_totalprice), 2)                                    AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) FILTER (WHERE o_orderstatus = 'F') > 2
    """,
    tags=("agg", "conditional"),
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    n_finished = F.count(F.when(F.col("o_orderstatus") == "F", 1))
    return (
        orders.groupBy("o_custkey")
        .agg(
            n_finished.alias("n_finished"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
            rnd(
                F.sum(
                    F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).otherwise(0.0)
                ),
                2,
            ).alias("urgent_spend"),
            rnd(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .filter(F.col("n_finished") > 2)
    )


@register(
    "q_pivot_event_types",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events
    GROUP BY user_id
    """,
    tags=("pivot", "agg"),
)
def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an EXPLICIT value list — never let pivot run
    its hidden distinct-scan job at scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .fillna(0)
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    tags=("groupingsets", "agg", "sql"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL entry point (spark.sql over
    registered views) — same single-shuffle expansion as rollup/cube."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(FLOOR(SUM(l_quantity) * 100.0 + 0.5) / 100.0 AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "q_approx_aggregates",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_supps,
           1 AS parts_ok, 1 AS supps_ok, 1 AS median_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB workhorses: HLL++ count-distinct
    (constant memory vs exact's shuffle of every key) and KLL-style
    percentile_approx.

    The sketch VALUES are engine-specific, but the query emits derived
    columns any engine must agree on (VERDICT r6 #1): the exact twins
    themselves, plus in-plan booleans asserting each estimate lands inside
    its published guarantee — HLL++ within 3x its rsd (default 0.05), and
    approx median (accuracy 1000 → rank error ≤ 0.1%) between the exact
    47th and 53rd percentiles. The oracle computes the exact twins and
    asserts the booleans as literal 1s — an out-of-bounds sketch on EITHER
    engine hash-mismatches. The booleans are robust to partition-merge
    order, which the raw estimates are not guaranteed to be.
    (The exact twins here are the proof harness; at 100 TB you run only
    the sketch side — the whole point is never shuffling every key.)"""
    li = load_table(spark, sf_dir, "lineitem")
    # (r14 probes, both kept OUT: (a) an ensure_parallelism rebalance before
    # the aggregates measured flat — unlike winsorize, the cost here is not
    # the partial buffering, and the rebalance ships every value an extra
    # time; (b) splitting the two count_distincts into single-distinct aggs
    # to avoid the Expand measured 1.9->4.2 s — three scan subtrees beat the
    # 2x Expand soundly. Original shape kept deliberately.)
    # TWO aggregation passes joined on the tiny group key instead of one:
    # mixing count_distinct with the percentile buffers in a single agg
    # makes Catalyst Expand every row once per distinct column, tripling
    # the rows the (sort-heavy) exact-percentile buffer ingests — measured
    # 4.5 s fused vs 1.4 s split at sf0.1. The join side is |groups| rows.
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("approx_median"),
        F.percentile("l_extendedprice", F.array(F.lit(0.47), F.lit(0.53))).alias("__p"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_suppkey").alias("exact_supps"),
    )
    agg = sketches.join(exact, "l_returnflag")
    tol = 3 * 0.05  # 3x the default approx_count_distinct rsd
    ok = lambda est, exact: (  # noqa: E731
        (F.abs(F.col(est) - F.col(exact)) <= tol * F.col(exact)).cast("int")
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        ok("approx_parts", "exact_parts").alias("parts_ok"),
        ok("approx_supps", "exact_supps").alias("supps_ok"),
        (
            (F.col("approx_median") >= F.col("__p")[0])
            & (F.col("approx_median") <= F.col("__p")[1])
        )
        .cast("int")
        .alias("median_ok"),
    )


@register(
    "q_text_bpe_tokens",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
           len(list_distinct(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS n_unique_tokens,
           length(text) AS n_chars
    FROM documents
    """,
    tags=("text", "tokenize", "bpe"),
)
def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (letter-runs / digit-runs / single
    punctuation) — the pretokenizer shape GPT-style BPE vocabularies use,
    all in JVM regexp functions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


@register(
    "q_udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udaf", "pandas_udf", "agg"),
)
def q_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (UDAF): quantity-weighted mean price per
    return flag. Arrow moves each group's columns to Python ONCE as numpy
    arrays — the legitimate UDAF shape when the aggregate has no built-in
    (this one does; the point is proving the surface against an exact
    oracle)."""
    from pontem_spark.functions.udaf import weighted_avg_price

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rnd(weighted_avg_price("l_extendedprice", "l_quantity"), 4).alias("w_avg_price")
    )
