"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime; these explicit forms cover the cases AQE can't see — a build side
that must replicate (skewed key joined to a small dim) and partial-agg
pre-reduction under a hot group key.

Correctness contract: salting NEVER changes the result set — only the
physical row distribution. The oracle for a salted query is therefore the
plain join, which is exactly what makes it checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join a skewed fact side to a small dim side on ``key`` with salting.

    The skewed side gets a uniform salt in [0, salt); the small side is
    replicated ``salt`` times (explode of a sequence — cheap because the
    side is small by assumption). The join key becomes (key, salt), so one
    hot key's rows spread over ``salt`` shuffle partitions instead of one.
    """
    salted_l = skewed.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    salted_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: list,
    salt: int = 16,
):
    """Aggregate under a hot key in two phases: (key, salt) partial agg,
    then final agg on key. Spark's hash aggregate already does map-side
    partials; explicit salting additionally splits a single hot REDUCER.

    ``agg_exprs``: list of (colname, 'sum'|'count'|'min'|'max') — the
    decomposable aggregates (avg = sum/count at the call site).
    """
    fns = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    refns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial = (
        df.withColumn("__salt", (F.rand(7) * salt).cast("int"))
        .groupBy(key, "__salt")
        .agg(*[fns[how](c).alias(f"__p_{c}_{how}") for c, how in agg_exprs])
    )
    return partial.groupBy(key).agg(
        *[refns[how](f"__p_{c}_{how}").alias(f"{c}_{how}") for c, how in agg_exprs]
    )
