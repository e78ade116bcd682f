"""Deterministic sampling operators for training-data curation.

Random `df.sample()` is the wrong tool at 100 TB: it is neither reproducible
across runs/engines nor resumable after a partial failure, and per-stratum
rates can't be audited. Everything here derives the keep/drop decision from a
content-independent md5 of the row id, so the SAME rows are selected on every
engine, every cluster size, every retry — and an oracle can re-derive the
sample exactly.

Plan shape: a pure narrow projection + filter (no shuffle, no RNG state, no
driver coordination); the filter sits directly on the scan, so at scale the
sample costs one pass and prunes everything downstream.

Reference parity: the reference has no sampling surface at all
(`pontem/series/series.py` — Series-only); this module is part of the
LLM-pipeline extension the rebuild promises.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(id_col: str, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from the md5 of the id.

    Two hex chars → ``ascii(c1)*256 + ascii(c2)`` mod buckets: only
    ``substr``/``ascii`` arithmetic, so DuckDB reproduces it byte-for-byte
    (no BASE/conv dependency). Not perfectly uniform (hex ascii has 16
    values per char) but deterministic and well-spread — the properties that
    matter for reproducible splits.
    """
    h = F.md5(F.col(id_col).cast("string"))
    c1 = F.ascii(F.substring(h, 1, 1))
    c2 = F.ascii(F.substring(h, 2, 1))
    return (c1 * 256 + c2) % buckets


def hash_bucket_sql(id_expr: str, buckets: int = 100) -> str:
    """The DuckDB twin of :func:`hash_bucket` for oracle SQL."""
    h = f"md5(CAST({id_expr} AS VARCHAR))"
    return f"((ascii(substr({h}, 1, 1)) * 256 + ascii(substr({h}, 2, 1))) % {buckets})"


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    percents: Mapping[str, int],
    default_percent: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sample: keep a row iff its hash bucket is
    below the stratum's percentage.

    The corpus-rebalancing shape (e.g. downsample dominant languages, keep
    all of the rare ones). ``percents`` maps stratum value → keep percent
    [0, 100]; unlisted strata use ``default_percent``.
    """
    bucket = hash_bucket(id_col, 100)
    rate: Column = F.lit(default_percent)
    for value, pct in percents.items():
        rate = F.when(F.col(stratum_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)
