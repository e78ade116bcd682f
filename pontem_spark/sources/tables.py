"""Loaders for the driver's deterministic test tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. At 100 TB each
"file" is a directory of many row-groups/files; ``spark.read.parquet`` handles
both identically, and Catalyst pushes filters + prunes columns into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H fixes
# region at 5 rows and nation at 25 rows regardless of SF; supplier/part/
# customer grow with SF and must NOT be assumed broadcastable).
ALWAYS_BROADCAST = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Lazy — no job runs until an action.

    events.ts is stored as TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as raw nanos, which we
    truncate to microsecond timestamps (integer ``div`` — a double division
    would lose precision on ~1.7e18 nano values). DuckDB oracles mirror this
    with ``date_trunc('microseconds', ts)``.
    """
    if name == "events":
        # Runtime-settable; required even when the caller (e.g. the driver)
        # built its own session without pontem_spark.session.get_spark().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.typeName() == "long":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so ``spark.sql`` can use it."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
