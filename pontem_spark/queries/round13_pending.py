"""Round-14 query candidate, written and locally oracle-proven in round 13.

NOT registered yet (the staging discipline of rounds 9-13: a new
registration sorts never-green FIRST and evicts a stale re-check from the
50-slot window — the r13 window is already budgeted, see round12.py).
TWO candidates: the first turns the r12 duplicate-label alignment
campaign PLUS the r13 same-anchor positional-op rebuild (both local
differential evidence only) into a driver row; the second is first
driver evidence for the r13 frame ⊕ frame / frame ⊕ Series two-axis
alignment surface (q_api_frame_align_arith, worth evicting one r10-stale
re-check per the round13.py window rule):

q_api_rowalign_dup_labels — row-aligned derivation binops over a
duplicate-label slice, entirely IN-ENGINE (from_spark -> sort_values by a
TOTAL key -> Series positional ops -> frame setitem -> to_spark; no
driver-side assembly): ``v - v.shift(1)``, ``v.cumsum()`` and
``v / v.cumsum()`` on a Series whose index (l_orderkey) repeats ~4x per
label. Pre-r12 the alignment fanned the label join out k² per duplicate
label; pre-r13 a NON-total order spec still fanned out inside tie groups
(r13 probe: 1540 rows -> 2294) because shift/cumsum re-anchored on a
fresh materialization and the binop had to join back by label+helpers.
The r13 rebuild keeps window-free positional ops ON THE SOURCE ANCHOR, so
every derivation here composes column-wise — the query's physical plan is
one scan + stacked Window nodes + zero joins.

The oracle replays the recorded visible order as ROW_NUMBER() over the
full sort key (verified unique at sf0.001 and sf0.01) and the positional
ops as LAG() / SUM() OVER that position.

Exercised by tests/test_pending_queries.py at sf0.001 and sf0.01 now, so
it arrives green. Flip module: queries/round13.py (one import line in
registry.all_queries() in r14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.sources.tables import load_table

# (name, fn, oracle) triples for round-14 registration.
PENDING: "list[tuple[str, object, str]]" = []


def _pending(name: str, oracle: str):
    def deco(fn):
        from pontem_spark.functions.compat import portable_round_sql

        PENDING.append((name, fn, portable_round_sql(oracle)))
        return fn

    return deco


@_pending(
    "q_api_rowalign_dup_labels",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, CAST(l_quantity AS DOUBLE) AS v,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber,
                                l_quantity, l_extendedprice, l_partkey,
                                l_suppkey) AS pos
      FROM lineitem WHERE l_orderkey <= 400
    )
    SELECT l_orderkey AS idx, ROUND(v, 2) AS v,
           ROUND(v - LAG(v) OVER (ORDER BY pos), 2) AS delta,
           ROUND(SUM(v) OVER (ORDER BY pos), 2) AS csum,
           ROUND(v / SUM(v) OVER (ORDER BY pos), 6) AS share
    FROM li
    """,
)
def q_api_rowalign_dup_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-label row-aligned derivations, in-engine end to end —
    driver evidence for the r12 aligner campaign (core/internal.py
    rowalign_left_join, core/series.py _rowalign_keys) and the r13
    same-anchor positional rebuild (core/series.py shift/_cum/pct_change
    fast paths + _mat_pair).

    Scale shape: the slice is predicate-bounded before anything else
    happens; the positional ops are Catalyst window functions over the
    recorded order spec (the global total order is the pandas-parity
    semantic — a grouped pipeline would carry partition keys in the
    spec); every binop and the two setitems compose on ONE anchor, so
    the plan is a single scan + Window nodes + zero joins/shuffles
    besides the window sort."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 400)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("v"),
            "l_extendedprice",
            "l_partkey",
            "l_suppkey",
        )
    )
    f = from_spark(li, index_col="l_orderkey")
    # index-level name + columns — a TOTAL key (unique per row), so the
    # visible order is deterministic and the oracle's ROW_NUMBER replays it
    f = f.sort_values(
        ["l_orderkey", "l_linenumber", "v", "l_extendedprice",
         "l_partkey", "l_suppkey"]
    )
    v = f["v"]
    f["delta"] = v - v.shift(1)
    f["csum"] = v.cumsum()
    f["share"] = v / v.cumsum()
    return f.to_spark("idx").select(
        F.col("idx").cast("bigint").alias("idx"),
        rnd(F.col("v"), 2).alias("v"),
        rnd(F.col("delta"), 2).alias("delta"),
        rnd(F.col("csum"), 2).alias("csum"),
        rnd(F.col("share"), 6).alias("share"),
    )


@_pending(
    "q_api_frame_align_arith",
    oracle="""
    WITH a AS (
      SELECT l_orderkey AS k, CAST(SUM(l_quantity) AS DOUBLE) AS qty,
             CAST(SUM(l_extendedprice) AS DOUBLE) AS revenue
      FROM lineitem WHERE l_orderkey <= 2000 GROUP BY l_orderkey
    ), b AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS revenue,
             CAST(o_totalprice AS DOUBLE) * 0.1 AS tax
      FROM orders WHERE o_orderkey <= 2500
    )
    SELECT COALESCE(a.k, b.k) AS idx,
           CAST(NULL AS DOUBLE) AS qty,
           ROUND((a.revenue + b.revenue) / 2.0, 2) AS revenue,
           CAST(NULL AS DOUBLE) AS tax
    FROM a FULL OUTER JOIN b ON a.k = b.k
    """,
)
def q_api_frame_align_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frame ⊕ frame two-axis alignment (r13 surface), in-engine end to
    end: two from_spark frames with different column sets combine through
    ``(f1 + f2) / 2`` — columns align by name (sorted union; one-sided
    columns are all-NaN like pandas), rows align by a full-outer index
    join, and the scalar divide composes on the result anchor.

    Scale shape: both inputs are predicate-bounded aggregates; the
    alignment is ONE full-outer hash equi-join on the index plus
    column-wise Catalyst expressions — no per-column joins, no UDFs, no
    driver materialization."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(
            F.sum("l_quantity").cast("double").alias("qty"),
            F.sum("l_extendedprice").cast("double").alias("revenue"),
        )
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2500)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("double").alias("revenue"),
            (F.col("o_totalprice").cast("double") * 0.1).alias("tax"),
        )
    )
    f1 = from_spark(li, index_col="k")
    f2 = from_spark(od, index_col="k")
    g = (f1 + f2) / 2
    return g.to_spark("idx").select(
        F.col("idx").cast("bigint").alias("idx"),
        F.col("qty").cast("double").alias("qty"),
        rnd(F.col("revenue"), 2).alias("revenue"),
        F.col("tax").cast("double").alias("tax"),
    )
