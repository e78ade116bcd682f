"""File sinks. Absent in the reference (SURVEY.md §2.A A3)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet, optionally hive-partitioned.

    ``partition_by`` on a low-cardinality column (date, region) gives free
    partition pruning on later reads; ``maxRecordsPerFile`` bounds file size
    so downstream scans parallelize evenly.
    """
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True, **options) -> None:
    """CSV sink — interchange format only; parquet is the analytical store
    (columnar, compressed, pushdown-capable)."""
    df.write.mode(mode).options(header=str(header).lower(), **options).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    """JSON-lines sink."""
    df.write.mode(mode).options(**options).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — the other columnar interchange format (Hive/Trino
    ecosystems); same pruning/pushdown properties as parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
