"""As-of join: for each left row, the latest right row at-or-before its
timestamp (per key). Spark has no built-in; this is the standard
union-and-window construction — ONE shuffle on (key), no range cross-join.

Semantics match pandas ``merge_asof(direction='backward')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    tolerance_seconds: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join.

    ``on``: timestamp column name (present in both sides).
    ``by``: equality key column name (present in both sides).

    Implementation: tag both sides, union, window-sort by (by, on) and
    ``last(right_value, ignorenulls=True)`` carries the most recent right row
    forward onto each left row. This is a single shuffle on ``by`` — at 100 TB
    it beats any range-join formulation (which Spark would plan as an
    exploded inequality join).
    """
    r_payload = [c for c in right.columns if c not in (on, by)]
    r = right.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__is_right"),
        F.struct(*[F.col(c) for c in [on] + r_payload]).alias("__rdata"),
    )
    l_payload = [c for c in left.columns if c not in (on, by)]
    l = left.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__rdata"].dataType).alias("__rdata"),
        *[F.col(c) for c in l_payload],
    )
    r_full = r.select(by, on, "__is_right", "__rdata", *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload])

    # right rows sort BEFORE left rows at the same timestamp (at-or-before)
    unioned = l.unionByName(r_full)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__rdata", ignorenulls=True).over(w))
    out = matched.filter(F.col("__is_right") == 0)

    if tolerance_seconds is not None:
        within = F.unix_timestamp(F.col(on)) - F.unix_timestamp(F.col(f"__match.{on}")) <= tolerance_seconds
        out = out.withColumn("__match", F.when(within, F.col("__match")))

    cols = [F.col(by), F.col(on), *[F.col(c) for c in l_payload]]
    cols.append(F.col(f"__match.{on}").alias(f"{right_prefix}{on}"))
    for c in r_payload:
        cols.append(F.col(f"__match.{c}").alias(f"{right_prefix}{c}"))
    return out.select(*cols)
