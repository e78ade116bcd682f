"""Constructors bridging Spark-native data into the pandas-like layer."""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame, SparkSession, functions as F

from pontem_spark.core.frame import DataFrame
from pontem_spark.core.internal import INDEX_COL, InternalFrame, default_session


def from_spark(
    sdf: SparkDataFrame, index_col: "str | list[str] | None" = None
) -> DataFrame:
    """Wrap an existing Spark DataFrame.

    ``index_col``: use that column as the index (no extra work). A LIST of
    columns builds a struct-backed MultiIndex (the pyspark.pandas
    ``index_col`` list convention) with spec None — the visible order is
    the index sort, so cross-anchor alignment stays on the single-label-
    join big-data path, no window machinery (r14). When None, a
    monotonically-increasing rowid is attached — cheap (no shuffle, no
    global ordering guarantee) and honest about it; we never silently build
    a 0..n-1 positional index over a 100 TB frame (SURVEY §1.4).
    """
    if isinstance(index_col, (list, tuple)):
        if len(index_col) == 1:
            index_col = index_col[0]
        else:
            missing = [c for c in index_col if c not in sdf.columns]
            if missing:
                raise KeyError(missing)
            packed = sdf.withColumn(
                "__midx__", F.struct(*[F.col(c) for c in index_col])
            )
            internal = InternalFrame(packed, "__midx__", tuple(index_col))
            cols = {c: packed[c] for c in sdf.columns if c not in set(index_col)}
            return DataFrame._from_internal(internal, cols)
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
