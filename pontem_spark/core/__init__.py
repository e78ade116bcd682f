"""pandas-like API over Spark DataFrames — the reference's capability surface
(milesgranger/pontem `Series`, plus the `DataFrame` it stubbed but never
built), re-architected:

- **Compose, don't inherit** (the reference subclasses pyspark DataFrame,
  `pontem/series/series.py:18`, leaking index-unaware methods — SURVEY §2.F).
- **One anchor plan, Column expressions on top**: every derived Series keeps
  a reference to the same underlying Spark DataFrame and carries a Column
  expression; ops fuse into one Catalyst plan instead of the reference's
  RDD re-ingestion per op (`series.py:226` → `data_prep.py:78-83`).
- **Real index alignment**: Series⊕Series with different anchors outer-joins
  on the index (pandas semantics) — the reference paired rows positionally
  and silently dropped the index (SURVEY §2.C1).
- **No Python row UDFs** for arithmetic (`series.py:219-224` forced
  FloatType UDFs); native Column ops with Spark SQL coercion.
"""

from pontem_spark.core.series import Series
from pontem_spark.core.frame import DataFrame, concat, get_dummies
from pontem_spark.core.io import from_spark, read_parquet
from pontem_spark.core.sql import sql

__all__ = ["Series", "DataFrame", "concat", "get_dummies", "from_spark", "read_parquet", "sql"]
