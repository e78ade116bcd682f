"""Second TPC-H-style wave: the planner-heavy shapes — correlated EXISTS,
scalar subqueries, IN-subqueries with HAVING, OR-of-ANDs predicate pushdown.
These exercise Catalyst's subquery decorrelation (rewritten to joins) and
complex-predicate handling; each documents the plan it should produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table, register_views


@register(
    "q4_priority_with_discounted_items",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_discount > 0.08
      )
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "exists", "subquery"),
)
def q4_priority_with_discounted_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS. Catalyst decorrelates it into a
    LEFT SEMI join — existence checks never duplicate order rows."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    discounted = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return (
        orders.join(discounted, orders.o_orderkey == discounted.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q12_priority_split_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    tags=("tpch", "join", "conditional"),
)
def q12_priority_split_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE aggregation split."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    tags=("tpch", "join", "ratio"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue percentage — conditional / total in one agg."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(rnd(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_share_pct"))
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_size IN (5, 10, 15, 20) AND p_type != 'PROMO'
    GROUP BY p_brand, p_size
    """,
    tags=("tpch", "join", "distinct-agg"),
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count aggregation over a filtered join;
    the IN and != predicates push to the part scan."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 10, 15, 20) & (F.col("p_type") != "PROMO")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c_name, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, total_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN (
        SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    ) big ON o_orderkey = big.l_orderkey
    """,
    tags=("tpch", "subquery", "having"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate subquery as join input (the IN-subquery
    form decorrelates to exactly this)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 150)
        .select("l_orderkey", rnd(F.col("__qty"), 2).alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", rnd(F.col("o_totalprice"), 2).alias("o_totalprice"), "total_qty")
    )


@register(
    "q19_or_of_ands_predicate",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("tpch", "predicate", "or-of-ands"),
)
def q19_or_of_ands_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive ranges. Catalyst extracts
    the common sub-predicates it can push (brand/size to part's scan) and
    evaluates the residual on the joined rows."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#33") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q22_rich_quiet_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
    tags=("tpch", "scalar-subquery", "anti"),
)
def q22_rich_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average) + correlated NOT
    EXISTS (→ LEFT ANTI join). Expressed via spark.sql so the oracle SQL and
    the Spark plan come from the SAME text — Catalyst decorrelates both
    subqueries."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS numcust,
               CAST(FLOOR(SUM(c_acctbal) * 100.0 + 0.5) / 100.0 AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_totalprice > 400000)
        GROUP BY c_mktsegment
        """
    )
