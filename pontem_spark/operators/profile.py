"""Dataset profiling + statistical outlier operators.

The first thing a 100 TB curation job runs is a profile: per-column null
counts, cardinalities, ranges — the dataset-card numbers. Both operators
here are single-aggregation-pass shapes: ONE groupBy-less agg computes every
metric map-side-combinable, then cheap post-processing (an unpivot, a
broadcast join) fans the scalar results back out. No second scan of the
data, no driver-side loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from pontem_spark.functions.compat import rnd


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False, rsd: float = 0.02
) -> DataFrame:
    """Per-column (n_rows, n_nulls, n_distinct) in ONE aggregation pass.

    All metrics for all columns are computed in a single agg (partial
    aggregation absorbs everything map-side); the per-column rows are then
    produced by an unpivot (``stack``) over the 1-row result — a constant-
    size operation regardless of input scale.

    ``approx=True`` is the at-scale toggle: ``approx_count_distinct``
    (HyperLogLog++, default relative error ``rsd`` = 2%) replaces the exact
    distinct. The exact form shuffles one hash per (column, distinct value)
    — fine up to ~10^9 distincts; at 100 TB cardinalities the HLL sketch is
    a few KB per column and the whole profile becomes one map-side pass
    plus a constant-size merge.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"__nd_{c}"))
        else:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', __nn_{c}, __nd_{c}" for c in cols)
    return one.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"),
        F.col("__n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    keep_cols: Sequence[str],
    threshold: float = 2.5,
    round_digits: int = 2,
) -> DataFrame:
    """Rows whose value is more than ``threshold`` population-std-devs from
    the mean — the classic anomaly gate (price errors, length explosions).

    The corpus statistics reduce to ONE row (map-side combinable avg +
    stddev_pop), which then broadcast-joins back onto the data: two narrow
    scans total, zero wide shuffles, no window-over-everything (a global
    window would funnel 100 TB through one partition).
    """
    stats = df.agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_pop(value_col).alias("__sigma"),
    )
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sigma")
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("zscore", rnd(z, round_digits))
        .filter(F.abs(F.col("zscore")) > threshold)
        .select(*keep_cols, "zscore")
    )
