"""Round-13 query candidate, written and locally oracle-proven in round 12.

NOT registered yet (the staging discipline of rounds 9-12: a new
registration sorts never-green FIRST and evicts a stale re-check from the
50-slot window — the r12 window is already budgeted, see round11.py).
One candidate, turning the r11/r12 construction-order machinery (local
differential evidence only) into a driver row:

q_api_ctor_order_positional — positional ops (cumsum running sum, shift)
through the pandas-parity constructors under BOTH order-spec gates:

  * variant 'nonmono_ctor': a Series/DataFrame built from a driver-local
    slice with a NON-MONOTONIC explicit index (top-150 customers keyed by
    c_custkey, constructed in acctbal-descending order). Without the
    ``__ctor__`` helper (core/frame.py, r11 probe 5) the engine would
    feed positional ops the index-sorted order and every csum/prev row
    hash-mismatches.
  * variant 'dup_monotonic': a Series built with a MONOTONIC index with
    DUPLICATE labels (l_orderkey over the l_orderkey <= 400 lineitem
    slice, ~1.6k rows at every SF). This is the r12 ADVICE gate —
    Spark's unstable sort makes intra-duplicate order nondeterministic
    unless construction order is recorded, so pre-fix the query isn't
    just wrong, it's FLAKY.

The oracle replays construction order as ROW_NUMBER() over the recorded
collect order (acctbal DESC / the full lineitem sort key) and the
positional ops as SUM() OVER / LAG() over that position.

Exercised by tests/test_pending_queries.py at sf0.001 and sf0.01 now, so
it arrives green. Flip module: queries/round12.py (one import line in
registry.all_queries() in r13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.sources.tables import load_table

# (name, fn, oracle) triples for round-13 registration.
PENDING: "list[tuple[str, object, str]]" = []


def _pending(name: str, oracle: str):
    def deco(fn):
        from pontem_spark.functions.compat import portable_round_sql

        PENDING.append((name, fn, portable_round_sql(oracle)))
        return fn

    return deco


@_pending(
    "q_api_ctor_order_positional",
    oracle="""
    WITH topc AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS v
      FROM customer
      ORDER BY CAST(c_acctbal AS DOUBLE) DESC, c_custkey ASC LIMIT 150
    ), oa AS (
      SELECT c_custkey, v,
             ROW_NUMBER() OVER (ORDER BY v DESC, c_custkey ASC) AS pos
      FROM topc
    ), li AS (
      SELECT l_orderkey, CAST(l_quantity AS DOUBLE) AS v,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber,
                                l_quantity, l_extendedprice, l_partkey,
                                l_suppkey) AS pos
      FROM lineitem WHERE l_orderkey <= 400
    )
    SELECT 'nonmono_ctor' AS variant, c_custkey AS idx, ROUND(v, 2) AS v,
           ROUND(SUM(v) OVER (ORDER BY pos), 2) AS csum,
           ROUND(LAG(v) OVER (ORDER BY pos), 2) AS prev
    FROM oa
    UNION ALL
    SELECT 'dup_monotonic' AS variant, l_orderkey AS idx, ROUND(v, 2) AS v,
           ROUND(SUM(v) OVER (ORDER BY pos), 2) AS csum,
           ROUND(LAG(v) OVER (ORDER BY pos), 2) AS prev
    FROM li
    """,
)
def q_api_ctor_order_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional cumsum/shift through the pandas-parity constructors —
    driver evidence for the construction-order spec (core/frame.py
    ``__ctor__``, core/internal.py from_local): non-monotonic explicit
    index (r11 fix) and monotonic-with-duplicate-labels (r12 ADVICE fix).

    Scale shape: the CONSTRUCTION path is driver-local by definition
    (pandas parity for `pd.DataFrame(dict, index=...)`), so both slices
    are predicate/limit-bounded (150 rows / l_orderkey<=400 ≈ 1.6k rows
    at every SF) before they touch the driver; the positional ops
    themselves run as Catalyst window sums over the recorded order, not
    driver loops."""
    import pandas as pd

    from pontem_spark.core import DataFrame as PFrame, Series
    from pontem_spark.functions.compat import rnd

    # variant A: non-monotonic unique index; stays in-engine end-to-end
    # (ctor -> setitem composition -> to_spark)
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", F.col("c_acctbal").cast("double").alias("v"))
        .orderBy(F.col("v").desc(), F.col("c_custkey").asc())
        .limit(150)
        .toPandas()
    )
    a = PFrame(
        {"v": cust["v"].tolist()}, index=cust["c_custkey"].tolist(), spark=spark
    )
    a["csum"] = a["v"].cumsum()
    a["prev"] = a["v"].shift(1)
    sa = a.to_spark("idx").select(
        F.lit("nonmono_ctor").alias("variant"),
        F.col("idx").cast("bigint").alias("idx"),
        rnd(F.col("v"), 2).alias("v"),
        rnd(F.col("csum"), 2).alias("csum"),
        rnd(F.col("prev"), 2).alias("prev"),
    )
    # variant B: monotonic index with duplicate labels. Computed through
    # Series positional ops; assembled positionally on the driver because
    # label-joins over duplicate labels fan out (pandas itself refuses
    # duplicate-label alignment) — the slice is predicate-bounded.
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
        .orderBy(
            "l_orderkey", "l_linenumber", "v", "l_extendedprice",
            "l_partkey", "l_suppkey",
        )
        .toPandas()
    )
    s = Series(li["v"].tolist(), index=li["l_orderkey"].tolist(), spark=spark)
    csum = s.cumsum().to_pandas()  # construction order, per the ctor spec
    prev = s.shift(1).to_pandas()
    # Tuples + explicit schema, NOT a pandas frame: pandas coerces the
    # leading shift-NULL to float NaN, and a non-Arrow createDataFrame
    # (the driver's vanilla session) keeps NaN as a double NaN instead of
    # SQL NULL — the portable round then floors NaN to 0.0.
    rows = [
        (
            int(k),
            float(v),
            float(c),
            None if pd.isna(p) else float(p),
        )
        for k, v, c, p in zip(
            li["l_orderkey"], li["v"], csum.values, prev.values
        )
    ]
    sb = spark.createDataFrame(
        rows, "idx bigint, v double, csum double, prev double"
    ).select(
        F.lit("dup_monotonic").alias("variant"),
        F.col("idx"),
        rnd(F.col("v"), 2).alias("v"),
        rnd(F.col("csum"), 2).alias("csum"),
        rnd(F.col("prev"), 2).alias("prev"),
    )
    return sa.unionByName(sb)
