"""File readers (parquet / csv / json).

Absent in the reference (SURVEY.md §2.G "file sources/sinks: ∅"); the rebuild
exposes them as thin, explicitly-schema'd wrappers. Explicit schemas matter
twice at scale: they skip the inference pass (a full extra scan for csv/json)
and they keep the scan prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)  # column pruning reaches the scan
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # Inference costs a full pass — acceptable for small/ad-hoc files only.
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.orc(path)
    if columns:
        df = df.select(*columns)
    return df


def read_parquet_evolved(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read a parquet dataset whose files were written under DRIFTING
    schemas (columns added over time — the normal life of a long-lived
    ingest directory).

    ``mergeSchema`` unions the per-file footers at planning time, so files
    written before a column existed surface it as null — no backfill
    rewrite of petabytes of history. The merge reads FOOTERS, not data
    (one metadata pass over the file listing); scans stay prunable and
    filters still push down. Type CONFLICTS (same name, incompatible
    types) fail the read loudly — that is schema corruption, not drift,
    and masking it with a cast would silently null out history.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if columns:
        df = df.select(*columns)
    return df
