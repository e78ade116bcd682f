"""Round-15 driver candidates for the round-14 frame-surface work,
staged with oracle proof NOW (tests/test_pending_queries.py runs both at
sf0.001 and sf0.01) so the r15 flip ships them green.

Two queries give first driver evidence for the r14 campaigns:

q_api_frame_axis0_mod — the axis=0 Series broadcast
(``df.div(series, axis=0)`` — the normalize-rows idiom the r13 judge
flagged as missing, core/frame.py _named_op) composed with the
pandas-corrected mod (divisor-sign ``a - floor(a/b)*b``, r14: the frame
dunders previously used Spark's dividend-sign %). Everything same-anchor:
one scan + projections, zero joins.

q_api_multiindex_align_fill — frame ⊕ frame alignment over a
struct-backed MultiIndex with ``fill_value`` (r14: cross-anchor missing
masks resolve dtypes from the pre-join schemas; r14 from_spark grew the
index_col LIST form so both sides stay spec-None and the alignment is
ONE full-outer label join — the big-data path, no window machinery).

NOT imported by registry.all_queries() in r14 — the r14 window is spent
on the two r13-staged flips + the 5 CHANGED_IN_ROUND re-checks + the
r9/r10-stale tier (see queries/round14.py for the r15 window plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.sources.tables import load_table

# (name, fn, oracle) triples for round-15 registration.
PENDING: "list[tuple[str, object, str]]" = []


def _pending(name: str, oracle: str):
    def deco(fn):
        from pontem_spark.functions.compat import portable_round_sql

        PENDING.append((name, fn, portable_round_sql(oracle)))
        return fn

    return deco


@_pending(
    "q_api_frame_axis0_mod",
    oracle="""
    WITH a AS (
      SELECT l_orderkey AS k, CAST(SUM(l_quantity) AS DOUBLE) AS qty,
             CAST(SUM(l_extendedprice) AS DOUBLE) AS rev
      FROM lineitem WHERE l_orderkey <= 2000 GROUP BY l_orderkey
    )
    SELECT k AS idx,
           ROUND(qty / (qty + rev), 6) AS qty_share,
           ROUND(rev / (qty + rev), 6) AS rev_share,
           ROUND((qty - 30.0) - FLOOR((qty - 30.0) / 7.0) * 7.0, 2) AS qty_mod,
           ROUND((rev - 30.0) - FLOOR((rev - 30.0) / 7.0) * 7.0, 2) AS rev_mod
    FROM a
    """,
)
def q_api_frame_axis0_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """axis=0 Series broadcast + pandas-corrected frame mod, in-engine.

    ``f.div(f["qty"] + f["rev"], axis=0)`` broadcasts the row-total
    Series down the INDEX axis (r14 _named_op axis surface); the series
    is derived from the SAME anchor, so the broadcast is a pure
    projection — zero joins, plan-identical to a hand-written select.
    ``(f - 30).mod(7)`` exercises the divisor-sign mod the r14 rewrite
    routed through Series._mod_cols (qty - 30 goes negative on small
    orders, where Spark's native % disagrees with pandas/Python).

    Scale shape: predicate-bounded aggregate in, column-wise Catalyst
    expressions out. One shuffle (the groupBy); no UDFs; no driver
    materialization."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    agg = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(
            F.sum("l_quantity").cast("double").alias("qty"),
            F.sum("l_extendedprice").cast("double").alias("rev"),
        )
    )
    f = from_spark(agg, index_col="k")
    shares = f.div(f["qty"] + f["rev"], axis=0)
    mods = (f - 30.0).mod(7.0)
    out = shares
    out["qty_mod"] = mods["qty"]
    out["rev_mod"] = mods["rev"]
    return out.to_spark("idx").select(
        F.col("idx").cast("bigint").alias("idx"),
        rnd(F.col("qty"), 6).alias("qty_share"),
        rnd(F.col("rev"), 6).alias("rev_share"),
        rnd(F.col("qty_mod"), 2).alias("qty_mod"),
        rnd(F.col("rev_mod"), 2).alias("rev_mod"),
    )


@_pending(
    "q_api_multiindex_align_fill",
    oracle="""
    WITH a AS (
      SELECT l_suppkey AS s, l_partkey AS p,
             CAST(SUM(l_quantity) AS DOUBLE) AS qa
      FROM lineitem WHERE l_orderkey <= 1200 GROUP BY l_suppkey, l_partkey
    ), b AS (
      SELECT l_suppkey AS s, l_partkey AS p,
             CAST(SUM(l_quantity) AS DOUBLE) AS qa
      FROM lineitem WHERE l_orderkey BETWEEN 600 AND 1800
      GROUP BY l_suppkey, l_partkey
    )
    SELECT COALESCE(a.s, b.s) AS s, COALESCE(a.p, b.p) AS p,
           ROUND(COALESCE(a.qa, 0) + COALESCE(b.qa, 0), 2) AS qa
    FROM a FULL OUTER JOIN b ON a.s = b.s AND a.p = b.p
    """,
)
def q_api_multiindex_align_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiIndex frame ⊕ frame alignment with fill_value, in-engine.

    Two overlapping (suppkey, partkey) aggregate slices become
    struct-MultiIndexed frames via the r14 ``from_spark(sdf,
    index_col=["s", "p"])`` list form; ``fa.add(fb, fill_value=0)``
    aligns rows by the struct index with one-sided cells filled before
    the op (the r14 cross-anchor missing-mask fix — dtypes resolve from
    the pre-join schemas, so the fill actually lands).

    Scale shape: both inputs are predicate-bounded aggregates and both
    frames are spec-None (index order), so the alignment compiles to ONE
    full-outer hash equi-join on the struct key — no windows, no
    cartesian risk (group keys are unique per side), no UDFs."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    li = load_table(spark, sf_dir, "lineitem")

    def slice_agg(pred):
        return (
            li.filter(pred)
            .groupBy(
                F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
            )
            .agg(F.sum("l_quantity").cast("double").alias("qa"))
        )

    fa = from_spark(slice_agg(F.col("l_orderkey") <= 1200), index_col=["s", "p"])
    fb = from_spark(
        slice_agg(F.col("l_orderkey").between(600, 1800)), index_col=["s", "p"]
    )
    tot = fa.add(fb, fill_value=0)
    flat = tot.reset_index()
    return flat.to_spark("ridx").select(
        F.col("s").cast("bigint").alias("s"),
        F.col("p").cast("bigint").alias("p"),
        rnd(F.col("qa"), 2).alias("qa"),
    )
