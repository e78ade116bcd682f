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


def population_stability(
    df: DataFrame,
    value_col: str,
    split_cond: Column,
    group_cols: "list[str] | None" = None,
    bin_width: float = 60.0,
    n_bins: int = 10,
    eps: float = 1e-6,
    round_digits: int = 4,
) -> DataFrame:
    """Population Stability Index between two slices of the same frame —
    the standard data-drift monitor (PSI < 0.1 stable, > 0.25 drifted).

    ``split_cond`` marks the REFERENCE slice (e.g. ``ts < '…'``); the rest
    is the CURRENT slice. Values land in ``n_bins`` fixed-width bins (last
    bin catches overflow — fixed literal edges, so both engines and both
    slices bin identically with zero coordination), counts for both slices
    come from ONE aggregation pass (conditional sums — the table is scanned
    once, not once per slice), and ``PSI = Σ (p−q)·ln(p/q)`` with an
    epsilon floor so empty bins don't blow up the log.

    Scale shape: one scan → one shuffle of |groups × bins| partial counts →
    a |groups|-row result. Nothing else.
    """
    group_cols = group_cols or []
    bucket = F.least(
        F.floor(F.col(value_col) / F.lit(float(bin_width))), F.lit(n_bins - 1)
    ).cast("int")
    ref = F.sum(F.when(split_cond, 1).otherwise(0))
    cur = F.sum(F.when(split_cond, 0).otherwise(1))
    binned = (
        df.groupBy(*group_cols, bucket.alias("__bin"))
        .agg(ref.alias("__ref"), cur.alias("__cur"))
    )
    tot = (
        binned.groupBy(*group_cols)
        .agg(F.sum("__ref").alias("__tref"), F.sum("__cur").alias("__tcur"))
    )
    # coalesce BEFORE greatest: a group entirely absent from one slice has
    # total 0 → null share, and the engines disagree on greatest(null, x)
    # (Spark skips nulls, DuckDB propagates) — floor it to eps explicitly
    p = F.greatest(F.coalesce(F.col("__ref") / F.col("__tref"), F.lit(0.0)), F.lit(eps))
    q = F.greatest(F.coalesce(F.col("__cur") / F.col("__tcur"), F.lit(0.0)), F.lit(eps))
    contrib = (p - q) * F.log(p / q)
    joined = binned.join(tot, on=group_cols) if group_cols else binned.crossJoin(
        F.broadcast(tot)
    )
    out = joined.select(*group_cols, contrib.alias("__c"))
    agg = out.groupBy(*group_cols).agg(rnd(F.sum("__c"), round_digits).alias("psi"))
    return agg
