"""Queries exercised THROUGH the pandas-like layer (pontem_spark.core) —
proving the compatibility wrapper emits the same clean Catalyst plans as
hand-written DataFrame code. Each is oracle-checked like every other query."""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame, SparkSession, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table


@register(
    "q_api_column_expression",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charge
    FROM lineitem
    WHERE l_quantity > 45
    """,
    tags=("api", "projection"),
)
def q_api_column_expression(spark: SparkSession, sf_dir: str) -> SparkDataFrame:
    """README-pitch shape: df['charge'] = price*(1-disc)*(1+tax), then a
    boolean-mask filter — all through the pandas-like API. The emitted plan
    is a single Filter+Project over the scan (no joins, no UDFs)."""
    from pontem_spark.core import from_spark

    df = from_spark(load_table(spark, sf_dir, "lineitem"))
    df["charge"] = df["l_extendedprice"] * (1 - df["l_discount"]) * (1 + df["l_tax"])
    out = df[df["l_quantity"] > 45]
    sdf = out.to_spark().select(
        "l_orderkey", "l_linenumber", rnd(F.col("charge"), 2).alias("charge")
    )
    return sdf


@register(
    "q_api_groupby_agg",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS o_totalprice,
           COUNT(o_orderkey) AS o_orderkey
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("api", "groupby"),
)
def q_api_groupby_agg(spark: SparkSession, sf_dir: str) -> SparkDataFrame:
    """groupby().agg() through the wrapper → one hash-aggregate pass."""
    from pontem_spark.core import from_spark

    df = from_spark(load_table(spark, sf_dir, "orders"))
    out = df.groupby("o_orderpriority", as_index=False).agg(
        {"o_totalprice": "sum", "o_orderkey": "count"}
    )
    sdf = out.to_spark().select(
        F.col("o_orderpriority"),
        rnd(F.col("o_totalprice"), 2).alias("o_totalprice"),
        F.col("o_orderkey"),
    )
    return sdf


@register(
    "q_api_merge_filter",
    oracle="""
    SELECT o_orderkey, c_mktsegment, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'MACHINERY' AND o_totalprice > 300000
    """,
    tags=("api", "merge"),
)
def q_api_merge_filter(spark: SparkSession, sf_dir: str) -> SparkDataFrame:
    """merge() through the wrapper == a Catalyst equi-join; the segment and
    price predicates still push below the join."""
    from pontem_spark.core import from_spark

    orders = from_spark(load_table(spark, sf_dir, "orders"))[
        ["o_orderkey", "o_custkey", "o_totalprice"]
    ]
    cust = from_spark(load_table(spark, sf_dir, "customer"))[["c_custkey", "c_mktsegment"]]
    cust = cust.rename({"c_custkey": "o_custkey"})
    merged = orders.merge(cust, on="o_custkey")
    out = merged[(merged["c_mktsegment"] == "MACHINERY") & (merged["o_totalprice"] > 300000)]
    return out.to_spark().select(
        "o_orderkey", "c_mktsegment", rnd(F.col("o_totalprice"), 2).alias("o_totalprice")
    )


@register(
    "q_api_str_accessor",
    oracle="""
    SELECT c_custkey, upper(c_name) AS name_upper, length(c_name) AS name_len
    FROM customer
    WHERE c_name LIKE '%1%'
    """,
    tags=("api", "str"),
)
def q_api_str_accessor(spark: SparkSession, sf_dir: str) -> SparkDataFrame:
    """.str accessor → built-in string functions, zero UDFs."""
    from pontem_spark.core import from_spark

    df = from_spark(load_table(spark, sf_dir, "customer"))
    df["name_upper"] = df["c_name"].str.upper()
    df["name_len"] = df["c_name"].str.len()
    out = df[df["c_name"].str.contains("1", regex=False)]
    return out.to_spark().select("c_custkey", "name_upper", "name_len")
