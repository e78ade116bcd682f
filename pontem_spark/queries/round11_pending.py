"""Round-12 query candidates, written and locally oracle-proven in round 11.

NOT registered yet (same staging discipline as rounds 9/10: a new
registration sorts never-green FIRST and evicts a stale re-check from the
50-slot window — the r11 window is already budgeted, see round11.py).
Two candidates, both turning r10 API-tail surface (local evidence only)
into driver rows:

1. q_api_rank_na_option — Series.rank's na_option matrix ('top' /
   'bottom' / 'keep' under method='average', plus dense+top) over a
   lineitem slice with an injected missing block. The oracle replays
   pandas' average-rank as RANK() + (tie_count-1)/2 with the missing
   block steered by NULLS FIRST/LAST — an engine that mishandles the
   missing tie group (or ranks NaN as largest, Spark's default) hash-
   mismatches on every null row.
2. q_api_nextreme_keep — nlargest/nsmallest keep='first'/'last'/'all'
   over the per-date order counts (integer counts → heavy boundary
   ties). keep='all' must return EVERY row tying the n-th value (can
   exceed n); 'first'/'last' break boundary ties by lowest/highest
   index (the engine's documented index-order tie-break), which the
   oracle replays as ORDER BY value, index LIMIT n.

Exercised by tests/test_pending_queries.py at sf0.001 and sf0.01 now, so
both arrive green. Flip module: queries/round11.py (one import line in
registry.all_queries() in r12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.sources.tables import load_table

# (name, fn, oracle) triples for round-12 registration.
PENDING: "list[tuple[str, object, str]]" = []


def _pending(name: str, oracle: str):
    def deco(fn):
        from pontem_spark.functions.compat import portable_round_sql

        PENDING.append((name, fn, portable_round_sql(oracle)))
        return fn

    return deco


@_pending(
    "q_api_rank_na_option",
    oracle="""
    WITH li AS MATERIALIZED (
        -- one row per idx: the synthetic lineitem can repeat an
        -- (orderkey, linenumber) pair, and rank needs unique labels
        SELECT l_orderkey * 10 + l_linenumber AS idx,
               AVG(CASE WHEN l_quantity > 45 THEN NULL
                        ELSE CAST(l_quantity AS DOUBLE) END) AS v
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
          AND l_shipdate < DATE '1995-04-01'
        GROUP BY 1
    )
    SELECT idx,
           ROUND(RANK() OVER (ORDER BY v ASC NULLS FIRST)
                 + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0, 2) AS r_top,
           ROUND(RANK() OVER (ORDER BY v ASC NULLS LAST)
                 + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0, 2) AS r_bottom,
           CASE WHEN v IS NULL THEN NULL
                ELSE ROUND(RANK() OVER (ORDER BY v ASC NULLS LAST)
                           + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0, 2)
           END AS r_keep,
           ROUND(CAST(DENSE_RANK() OVER (ORDER BY v ASC NULLS FIRST)
                      AS DOUBLE), 2) AS r_dense_top
    FROM li
    """,
)
def q_api_rank_na_option(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.rank through the wrapper — driver evidence for the r10
    na_option tail (core/series.py::rank): the missing block ranks as ONE
    tie group before ('top') / after ('bottom') every valid value, or
    stays missing ('keep'); dense+top gives the block its own dense
    bucket. Scale shape: average/dense derive on the DISTINCT-value frame
    (a window over ~46 quantity values, never the raw rows) + one
    equi-join back — the injected NULL block (quantity > 45) rides the
    same path as real missing data."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-04-01"))
        )
        # one row per idx: the synthetic lineitem can repeat an
        # (orderkey, linenumber) pair, and rank needs unique labels
        .groupBy(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("idx")
        )
        .agg(
            F.avg(
                F.when(F.col("l_quantity") > 45, F.lit(None)).otherwise(
                    F.col("l_quantity").cast("double")
                )
            ).alias("v")
        )
    )
    s = from_spark(li).set_index("idx")["v"]
    top = s.rank(na_option="top").to_spark(value_name="r_top")
    bottom = s.rank(na_option="bottom").to_spark(value_name="r_bottom")
    keep = s.rank(na_option="keep").to_spark(value_name="r_keep")
    dense = s.rank(method="dense", na_option="top").to_spark(value_name="r_dense_top")
    j = top.join(bottom, "idx").join(keep, "idx").join(dense, "idx")
    return j.select(
        "idx",
        rnd(F.col("r_top"), 2).alias("r_top"),
        rnd(F.col("r_bottom"), 2).alias("r_bottom"),
        rnd(F.col("r_keep"), 2).alias("r_keep"),
        rnd(F.col("r_dense_top"), 2).alias("r_dense_top"),
    )


@_pending(
    "q_api_nextreme_keep",
    oracle="""
    WITH c AS MATERIALIZED (
        SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1
    ),
    nl_all AS (
        SELECT 'nlargest_all' AS variant, d, cnt FROM c
        WHERE cnt >= (SELECT cnt FROM c ORDER BY cnt DESC LIMIT 1 OFFSET 9)
    ),
    nl_first AS (
        SELECT 'nlargest_first' AS variant, d, cnt FROM c
        ORDER BY cnt DESC, d ASC LIMIT 10
    ),
    ns_last AS (
        SELECT 'nsmallest_last' AS variant, d, cnt FROM c
        ORDER BY cnt ASC, d DESC LIMIT 10
    )
    SELECT variant, strftime(d, '%Y-%m-%d') AS d, cnt FROM nl_all
    UNION ALL SELECT variant, strftime(d, '%Y-%m-%d') AS d, cnt FROM nl_first
    UNION ALL SELECT variant, strftime(d, '%Y-%m-%d') AS d, cnt FROM ns_last
    """,
)
def q_api_nextreme_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.nlargest/nsmallest keep= through the wrapper — driver
    evidence for the r10 keep tail (core/series.py::_n_extreme): integer
    per-date order counts tie heavily at the n-th value, so 'all' must
    return the whole boundary tie group (rows > n), while 'first'/'last'
    pick by lowest/highest index among the ties. Plan shape:
    TakeOrderedAndProject for first/last (k rows per partition move, no
    global sort); 'all' adds one broadcast 1-row threshold join."""
    from pontem_spark.core import from_spark

    cnts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = from_spark(cnts).set_index("d")["cnt"]
    parts = []
    for variant, res in (
        ("nlargest_all", s.nlargest(10, keep="all")),
        ("nlargest_first", s.nlargest(10, keep="first")),
        ("nsmallest_last", s.nsmallest(10, keep="last")),
    ):
        parts.append(
            res.to_spark(value_name="cnt").select(
                F.lit(variant).alias("variant"),
                F.date_format("d", "yyyy-MM-dd").alias("d"),
                F.col("cnt").cast("bigint").alias("cnt"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
