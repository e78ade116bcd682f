"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (TPC-H Q1 shape) on sf0.001.
queries()      — every implemented operator as (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query for the correctness gate.

Implementations live in pontem_spark/queries/*; this module is a thin shim
over the registry so the driver and the local test suite run the same suite.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pontem_spark.queries.registry import oracle_sqls, query_fns  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pontem_spark.queries.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_fns()


def oracle_sql() -> dict[str, str]:
    return oracle_sqls()
