"""Constructors bridging Spark-native data into the pandas-like layer."""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame, SparkSession, functions as F

from pontem_spark.core.frame import DataFrame
from pontem_spark.core.internal import INDEX_COL, InternalFrame, default_session


def from_spark(sdf: SparkDataFrame, index_col: str | None = None) -> DataFrame:
    """Wrap an existing Spark DataFrame.

    ``index_col``: use that column as the index (no extra work). When None, a
    monotonically-increasing rowid is attached — cheap (no shuffle, no
    global ordering guarantee) and honest about it; we never silently build
    a 0..n-1 positional index over a 100 TB frame (SURVEY §1.4).
    """
    if index_col is not None:
        internal = InternalFrame(sdf, index_col, index_col)
        cols = {c: sdf[c] for c in sdf.columns if c != index_col}
        return DataFrame._from_internal(internal, cols)
    with_id = sdf.withColumn(INDEX_COL, F.monotonically_increasing_id())
    internal = InternalFrame(with_id, INDEX_COL, None)
    return DataFrame._from_internal(internal, {c: with_id[c] for c in sdf.columns})


def read_parquet(
    path: str,
    index_col: str | None = None,
    columns: list[str] | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    spark = spark or default_session()
    sdf = spark.read.parquet(path)
    if columns:
        keep = columns + ([index_col] if index_col and index_col not in columns else [])
        sdf = sdf.select(*keep)
    return from_spark(sdf, index_col)
