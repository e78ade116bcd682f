"""Third TPC-H-style wave: the remaining classic shapes — min-over-group
correlated lookup (Q2), nation-pair volume (Q7), market share (Q8),
product profit (Q9), scalar-subquery HAVING (Q11), left-join count
distribution (Q13), max-over-aggregate view (Q15), correlated-average
filter (Q17), nested IN with HAVING (Q20), and the EXISTS/NOT-EXISTS
self-join (Q21).

The driver fixtures have no ``partsupp`` table and lineitem has no
receipt/commit dates (FIXTURES.md §2), so Q2/Q9/Q11/Q20/Q21 are adapted to
the available star schema while keeping the *plan shape* that makes each
query interesting: the decorrelation, the self-joins, the two-level
aggregations. Reference scope note: none of these exist in the reference
(SURVEY.md §2.G "joins/group-by/subqueries: absent") — this wave is part of
the beyond-parity relational surface.

Scale notes (100 TB): every query here keeps dimension joins broadcast-able
(nation/region/supplier/part filters applied before the join), pushes date
and attribute predicates into the parquet scan, and expresses existence
checks as semi/anti joins so rows are never duplicated ahead of aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table


def _european_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH eur_supp AS (
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ), cost AS (
        SELECT l_partkey, s_name, MIN(l_extendedprice / l_quantity) AS unit_price
        FROM lineitem JOIN eur_supp ON l_suppkey = s_suppkey
        GROUP BY 1, 2
    )
    SELECT p_partkey, p_name, s_name, ROUND(unit_price, 4) AS min_unit_price
    FROM cost JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'STANDARD' AND p_size <= 15
      AND unit_price = (SELECT MIN(unit_price) FROM cost c2
                        WHERE c2.l_partkey = cost.l_partkey)
    """,
    tags=("tpch", "correlated-min", "window"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: unit price from lineitem stands in for
    ps_supplycost): for each STANDARD small part, the European supplier(s)
    offering the minimum unit price. The correlated ``= (SELECT MIN ...)``
    is expressed as a window-min over the part key — one shuffle on
    l_partkey instead of a rejoined aggregate, and the part filter prunes
    before the window."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    cost = (
        li.join(F.broadcast(_european_suppliers(spark, sf_dir)), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "s_name")
        .agg(F.min("unit").alias("unit_price"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("__min", F.min("unit_price").over(w)).filter(
        F.col("unit_price") == F.col("__min")
    )
    return (
        best.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .select("p_partkey", "p_name", "s_name", rnd(F.col("unit_price"), 4).alias("min_unit_price"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
            OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "nation-pair", "multi-join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship year.
    Both nation joins are broadcast; the OR-of-pairs predicate is applied
    after attaching the two nation names, and the date range pushes to the
    lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.withColumnRenamed("n_name", "supp_nation").withColumnRenamed("n_nationkey", "sn_key")
    n2 = nation.withColumnRenamed("n_name", "cust_nation").withColumnRenamed("n_nationkey", "cn_key")
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("tpch", "market-share", "conditional-ratio"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of ECONOMY-part revenue sold into the
    European market, by order year. Seven-table join; every dimension side
    (part filtered, supplier, customer→nation→region, nation) broadcasts,
    so the only shuffle is the final tiny group-by on year."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(eur_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            rnd(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year,
           ROUND(SUM(CAST(FLOOR(amount * 10000.0 + 0.5) AS BIGINT)) / 10000.0, 2) AS profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.2 * l_quantity * p_retailprice AS amount
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("tpch", "profit", "multi-join"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: 20% of retail price stands in for
    ps_supplycost): profit on widget parts by supplier nation and order
    year. The LIKE filter prunes part before its broadcast join, so the
    lineitem scan is filtered by the semi-joined part keys.

    Float discipline: the per-row amount mixes signs (revenue minus cost),
    so engine-dependent summation order can leave the total within an ulp
    of a rounding boundary. Each row's amount is quantized to an exact
    1e-4 integer grid first — integer sums are order-independent, so both
    engines produce bit-identical totals."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.2 * F.col(
        "l_quantity"
    ) * F.col("p_retailprice")
    amount_q = F.floor(amount * 10000.0 + F.lit(0.5)).cast("long")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(rnd(F.sum(amount_q) / 10000.0, 2).alias("profit"))
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH partval AS (
        SELECT l_partkey, SUM(l_extendedprice) AS part_value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(part_value, 2) AS part_value
    FROM partval
    WHERE part_value > (SELECT 1.5 * AVG(part_value) FROM partval)
    """,
    tags=("tpch", "scalar-subquery", "having"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: lineitem revenue stands in for partsupp
    stock value): parts whose total revenue exceeds 1.5x the mean part
    revenue — a scalar subquery over the same aggregate. The aggregate is
    computed once and reused for both the threshold and the output (the
    threshold is a 1-row broadcast cross join, not a recomputation). The
    relative threshold keeps the query meaningful at any scale factor."""
    partval = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("part_value"))
    )
    threshold = partval.agg((F.avg("part_value") * 1.5).alias("__thr"))
    return (
        partval.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("__thr"))
        .select("l_partkey", rnd(F.col("part_value"), 2).alias("part_value"))
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "left-join", "distribution"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of non-urgent order counts per customer,
    zeros included — the left join keeps customers with no matching orders
    and COUNT(col) ignores the nulls they produce. Two-level aggregation;
    the second group-by is tiny (distinct counts), so the only real shuffle
    is on c_custkey."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "max-over-aggregate", "view"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue. The
    ``= (SELECT MAX ...)`` over the view becomes a window-max over the
    (already small) per-supplier aggregate — no second scan of lineitem."""
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    top = rev.withColumn(
        "__max", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("__max"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", rnd(F.col("total_revenue"), 2).alias("total_revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    tags=("tpch", "correlated-avg", "subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of one brand. The
    correlated per-part average decorrelates to a per-part aggregate joined
    back on l_partkey; the brand filter semi-joins lineitem down before the
    per-part average is even needed on the probe side. AVG over
    integral-valued quantities is exact in IEEE doubles, so the strict
    comparison is engine-portable."""
    li = load_table(spark, sf_dir, "lineitem")
    brand_parts = (
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    )
    # per-part average computed only for the brand's parts (semi-join first)
    brand_li = li.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    avg_qty = brand_li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("__half_avg"))
    return (
        brand_li.withColumnRenamed("l_partkey", "__pk")
        .join(avg_qty, F.col("__pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("__half_avg"))
        .agg(rnd(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q20_part_promotion_suppliers",
    oracle="""
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 50
    )
    """,
    tags=("tpch", "nested-in", "having"),
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: shipped quantity stands in for available
    stock): suppliers who moved more than 50 units of any 'small%' part.
    Both IN-subqueries become semi joins — part keys broadcast into the
    lineitem scan, qualifying supplier keys semi-join the supplier table —
    so no row is ever duplicated."""
    small_parts = (
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    )
    movers = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 50)
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 1200 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
    tags=("tpch", "exists", "anti", "self-join"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: 'late' = shipped >1200 days after the
    order, since the fixtures carry no receipt/commit dates): suppliers who
    were the SOLE late shipper on a multi-supplier order. The correlated
    EXISTS becomes a left-semi self-join and NOT EXISTS a left-anti
    self-join, both on l_orderkey with a supplier-inequality residual."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        load_table(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 1200 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.select(F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("s_key"))
    other_exists = l1.join(
        li,
        (F.col("o_key") == li.l_orderkey) & (F.col("s_key") != li.l_suppkey),
        "left_semi",
    )
    sole_late = other_exists.join(
        late,
        (F.col("o_key") == late.l_orderkey) & (F.col("s_key") != late.l_suppkey),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(supp), F.col("s_key") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
