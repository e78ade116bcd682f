"""Incremental aggregation via mergeable partials — how a 100 TB pipeline
maintains rollups without rescanning history.

The pattern: keep per-key PARTIAL aggregates (count, sum, min, max — all
commutative-monoid states) in a compact table; when a new batch of data
lands, aggregate ONLY the batch and merge states key-wise. The merged
result is bit-identical to re-aggregating everything from scratch (floats
excepted by summation order — which is exactly why the states are summed in
a deterministic agg on both engines and rounded at derivation time), so the
cross-engine oracle can check the whole incremental path against a direct
GROUP BY over the full input.

Derived statistics (avg here; stddev needs a sum-of-squares state) come
from the states at READ time — never stored, so they stay consistent under
any merge order.

Scale shape: each increment shuffles only the NEW batch (and the state
table, which is ~|keys| rows, not |history| rows). The reference has no
aggregation surface at all (SURVEY §2.G); this is part of the promised
LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pontem_spark.functions.compat import rnd


def rollup_state(df: DataFrame, keys: "list[str]", value_col: str) -> DataFrame:
    """Per-key mergeable aggregate state: (keys..., n, total, lo, hi)."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    )


def merge_states(a: DataFrame, b: DataFrame, keys: "list[str]") -> DataFrame:
    """Merge two state tables key-wise. Union + one aggregation — the same
    monoid ops, so merging is associative and a tree of merges (one per
    landed batch) equals one big aggregation."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("total").alias("total"),
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )
    )


def finalize(state: DataFrame, keys: "list[str]", round_digits: int = 2) -> DataFrame:
    """Derive read-time statistics from the state (avg = total/n), rounding
    the floats portably so the result is hash-comparable cross-engine."""
    return state.select(
        *keys,
        F.col("n"),
        rnd(F.col("total"), round_digits).alias("total"),
        rnd(F.col("total") / F.col("n"), round_digits).alias("avg"),
        rnd(F.col("lo"), round_digits).alias("lo"),
        rnd(F.col("hi"), round_digits).alias("hi"),
    )
