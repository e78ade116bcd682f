"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Rebalance a frame that arrived with too few partitions for CPU-dense
    work (hashing, shingling, pairwise scoring).

    A small parquet file scans as ONE partition — and then an operator that
    multiplies work per row (explode to 50x shingles, pairwise cosine) runs
    on one core while 31 idle. The repartition shuffles only the narrow
    input, which is cheap relative to the downstream blow-up. On a healthy
    cluster input (many splits), this is a no-op.

    The parallelism estimate is driver-side METADATA only — ``inputFiles()``
    reads the file index and shuffle-partition conf covers derived frames.
    (``df.rdd.getNumPartitions()`` would be exact but forces the whole plan
    through RDD translation — a real cost on a utility path at scale, and it
    pins the pre-AQE partitioning.)
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        files = len(df.inputFiles())
    except Exception:  # non-file-based plans (streams, local relations)
        files = 0
    if files == 0:
        # Derived / in-memory frame: its width is governed by the shuffle
        # conf; only rebalance when that conf itself is below target.
        try:
            files = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        except ValueError:  # AQE 'auto'
            return df
    if files < target:
        return df.repartition(target)
    return df


def barrier_filter(df: DataFrame, cond) -> DataFrame:
    """Filter WITHOUT letting Catalyst push the predicate down.

    Pushing a filter on an expensive derived column (e.g. a 64-term dot
    product) into a nested-loop join condition makes the join evaluate the
    expression per candidate pair in interpreted mode — and the surviving
    projection evaluates it AGAIN. Catalyst's push-through-project rule
    requires every projected field to be deterministic, so appending a
    nondeterministic throwaway column pins the computation where it is:
    evaluated once, in a codegen'd Project, with the filter on top.
    """
    from pyspark.sql import functions as F

    return df.withColumn("__nd__", F.monotonically_increasing_id()).filter(cond).drop("__nd__")
