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


def compact_parquet(
    spark,
    path: str,
    target_files: int,
    sort_by: list[str] | None = None,
) -> int:
    """Small-file compaction — the standing maintenance job every streaming
    ingest needs (each micro-batch lands a file; a day of 30-second batches
    is ~3k files whose open/footer overhead dominates scans).

    Rewrites the directory into ``target_files`` files; with ``sort_by``,
    uses ``repartitionByRange`` + within-partition sort so each output file
    covers a narrow key range — min/max footer stats then let later scans
    skip whole files (poor-man's clustering, no table format needed).
    Writes to a sibling temp dir first and swaps only after success, so a
    failed compaction never destroys the input. Returns the file count.
    """
    import os
    import shutil

    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartitionByRange(target_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(target_files)
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len([f for f in os.listdir(path) if f.endswith(".parquet")])
