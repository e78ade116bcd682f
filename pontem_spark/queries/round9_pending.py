"""Round-9 query candidates, written and locally oracle-proven in round 8.

NOT registered yet (r7 verdict task 5 + the r9 window plan in round8.py):
the r8 window is fully spent on the 54 flipped candidates, so this stages
the WRITE side's first driver-evidence queries for the r9 flip — until
now ``sources/writers.py`` (upsert_parquet, compact_parquet) was the only
major family whose correctness evidence was exclusively local (two-batch
physical-bytes / file-count tests). Round 9 flips both by importing
``round9`` (queries/round9.py, already written — one import line in
registry.all_queries()). Two new registrations leave ~44 slots for the
r5-stale re-checks.

Exercised by tests/test_pending_queries.py at sf0.001 and sf0.01 now, so
it arrives green.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.sources.tables import load_table

# (name, fn, oracle) triples for round-9 registration.
PENDING: "list[tuple[str, object, str]]" = []


def _pending(name: str, oracle: str):
    def deco(fn):
        from pontem_spark.functions.compat import portable_round_sql

        PENDING.append((name, fn, portable_round_sql(oracle)))
        return fn

    return deco


@_pending(
    "q_cdc_upsert_readback",
    oracle="""
    WITH init AS (
        SELECT o_orderkey, o_orderpriority, CAST(1 AS INT) AS version,
               CAST(o_totalprice AS DOUBLE) AS price
        FROM orders WHERE o_orderkey % 5 <> 4
    ), batch AS (
        SELECT o_orderkey, o_orderpriority, CAST(2 AS INT) AS version,
               CAST(o_totalprice AS DOUBLE) + CAST(100.0 AS DOUBLE) AS price
        FROM orders WHERE o_orderkey % 2 = 0
    ), uni AS (
        SELECT * FROM init UNION ALL SELECT * FROM batch
    ), latest AS (
        SELECT o_orderkey, o_orderpriority, version, price,
               ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                  ORDER BY version DESC) AS rn
        FROM uni
    )
    SELECT o_orderpriority, version,
           COUNT(*) AS cnt,
           ROUND(SUM(price), 2) AS total_price
    FROM latest WHERE rn = 1
    GROUP BY o_orderpriority, version
    """,
)
def q_cdc_upsert_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC write path, end to end: an initial snapshot (80% of orders,
    version 1) is written through ``upsert_parquet``, then a CDC batch
    (every even orderkey, version 2, price bumped +100 — overlapping keys
    UPDATE, the even keys excluded from the snapshot INSERT) is MERGED
    into the same hive-partitioned table, and the result is read back
    from DISK and aggregated. The oracle replays latest_by_key over the
    union in SQL (row_number per key by version desc), so hash-equality
    proves the physical merge — dynamic partition overwrite, staging
    swap, read-back — loses and duplicates nothing.

    Scale shape: the merge reads only partitions the batch touches
    (``partitionOverwriteMode=dynamic``; untouched partitions' files are
    byte-identical afterwards, asserted by tests/test_io.py), so a daily
    CDC batch costs O(touched partitions), not O(table). The final
    aggregate is localCheckpoint-materialized so the temp table can be
    removed before the DataFrame is consumed.
    """
    from pontem_spark.functions.compat import rnd
    from pontem_spark.sources.writers import upsert_parquet

    orders = load_table(spark, sf_dir, "orders")
    init = orders.filter(F.col("o_orderkey") % 5 != 4).select(
        "o_orderkey",
        "o_orderpriority",
        F.lit(1).alias("version"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    batch = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        F.lit(2).alias("version"),
        (F.col("o_totalprice").cast("double") + F.lit(100.0)).alias("price"),
    )
    tmp = tempfile.mkdtemp(prefix="pontem_upsert_rb_")
    table = tmp + "/orders_cdc"
    try:
        upsert_parquet(
            spark, init, table,
            key_cols="o_orderkey", order_cols=["version"],
            partition_by=["o_orderpriority"],
        )
        upsert_parquet(
            spark, batch, table,
            key_cols="o_orderkey", order_cols=["version"],
            partition_by=["o_orderpriority"],
        )
        merged = spark.read.parquet(table)
        out = (
            merged.groupBy("o_orderpriority", "version")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                rnd(F.sum("price"), 2).alias("total_price"),
            )
        )
        # materialize the ~10-row aggregate so the returned frame no
        # longer references the temp files (same pattern as the
        # streaming-composition queries)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_pending(
    "q_maintenance_compaction_readback",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(CAST(value AS DOUBLE)), 2) AS total_value,
           CAST(4 AS INT) AS n_files
    FROM events WHERE value >= 100
    GROUP BY event_type
    """,
)
def q_maintenance_compaction_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction, end to end: a filtered events slice is
    deliberately written as 16 small files (a micro-batch landing
    directory in miniature), ``compact_parquet`` rewrites it into
    exactly 4 files through the write-then-swap staging path, and the
    result is read back from DISK and aggregated. The oracle aggregates
    the same slice from the source table and pins ``n_files = 4`` as a
    literal — hash-equality proves the rewrite lost and duplicated
    nothing AND produced exactly the requested file count (the swap
    happened; the operator's return value is the physical ls).

    Scale shape: compaction is one round-robin repartition write — no
    aggregation, no driver materialization; the standing maintenance job
    every streaming ingest needs (sources/writers.py::compact_parquet;
    the sort_by range-clustering variant is pinned by tests/test_io.py).
    """
    import shutil
    import tempfile

    from pontem_spark.functions.compat import rnd
    from pontem_spark.sources.writers import compact_parquet

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value") >= 100)
        .select("event_type", F.col("value").cast("double").alias("value"))
    )
    tmp = tempfile.mkdtemp(prefix="pontem_compact_rb_")
    table = tmp + "/events_slice"
    try:
        ev.repartition(16).write.mode("overwrite").parquet(table)
        n_files = compact_parquet(spark, table, target_files=4)
        back = spark.read.parquet(table)
        out = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                rnd(F.sum("value"), 2).alias("total_value"),
            )
            .withColumn("n_files", F.lit(int(n_files)).cast("int"))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
