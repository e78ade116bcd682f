"""Co-located (bucketed) joins: the write-once/shuffle-never strategy,
asserted against the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pontem_spark.operators.bucketing import bucketed_join, write_bucketed
from pontem_spark.plans import physical_plan
from pontem_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderstatus"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8, path=str(base / "li"))
    write_bucketed(orders, "ord_b", "l_orderkey", 8, path=str(base / "ord"))
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # force a non-broadcast join so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "l_orderkey")
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:800]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_results_match_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, "l_orderkey").count()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == want


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = physical_plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan[:800]
