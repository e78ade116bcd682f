"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark as ``hll_sketch_agg`` / ``hll_union_agg``).

``COUNT(DISTINCT x)`` is the one common aggregate that is NOT mergeable:
daily exact distinct counts cannot be added into a weekly number, so every
re-window re-scans raw history. An HLL sketch IS mergeable — keep one
~2^lgk-byte binary per (key, day) and ANY window's distinct estimate is a
union of the stored sketches, never a rescan. This is the distinct-count
companion to operators/incremental.py's monoid states: same shape
(build partial → merge → finalize), same production pattern (MERGE INTO a
state table), with bounded error (~1.6%/sqrt(2^lgk) relative).

Scale shape: the build shuffles hash partials (not raw values); merges
shuffle |keys| sketch blobs; estimates are a map-side projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hll_rollup(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12, sketch_name: str = "hll"
) -> DataFrame:
    """Per-key HLL sketch state of ``col``'s distinct values."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col, F.lit(lgk)).alias(sketch_name))


def merge_rollups(
    a: DataFrame, b: DataFrame, keys: list[str], sketch_name: str = "hll"
) -> DataFrame:
    """Merge two sketch states key-wise (union of the underlying sets).
    Associative and commutative — any merge tree yields the same estimate
    state a direct build over the union would."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(F.hll_union_agg(sketch_name).alias(sketch_name))
    )


def estimate(state: DataFrame, keys: list[str], sketch_name: str = "hll") -> DataFrame:
    """Read-time distinct estimates from the sketch state."""
    return state.select(
        *keys, F.hll_sketch_estimate(sketch_name).alias("n_distinct_est")
    )


def rollup_over(
    state: DataFrame,
    coarse_keys: list[str],
    sketch_name: str = "hll",
) -> DataFrame:
    """Re-aggregate a fine-grained sketch state to coarser keys (e.g.
    per-day → per-month) by unioning sketches — the operation exact
    distinct counts cannot do."""
    return (
        state.groupBy(*coarse_keys)
        .agg(F.hll_union_agg(sketch_name).alias(sketch_name))
    )
