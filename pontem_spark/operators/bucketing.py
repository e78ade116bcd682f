"""Bucketed-table helpers: pre-shuffle data ONCE at write time so every
later equi-join / aggregation on the bucket key runs with ZERO exchanges.

This is the 100 TB co-location strategy: fact tables bucketed by join key
(e.g. lineitem and orders by orderkey) join with no shuffle at all — the
single biggest cost eliminated from the hot path. The price is paid once,
at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) table. Bucket metadata
    lives in the catalog; Spark then plans joins between co-bucketed tables
    without exchanges (and without sorts when ``sort=True``)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
