"""Round-9 query candidates, written and locally oracle-proven in round 8.

NOT registered yet (r7 verdict task 5 + the r9 window plan in round8.py):
the r8 window is fully spent on the 54 flipped candidates, so this stages
the CDC WRITE path's first driver-evidence query for the r9 flip — until
now ``sources/writers.py::upsert_parquet`` was the only major family whose
correctness evidence was exclusively local (the two-batch physical-bytes
test). Round 9 flips it by importing ``round9`` (to be written, mirroring
queries/round8.py) — or simply registering this module's PENDING triples.

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
