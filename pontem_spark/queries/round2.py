"""Round-2 queries: new operators added this round.

Registered immediately after the previously-unverified tpch2/tpch3/windows/
tpch families so they land inside the driver's 50-row correctness window.

Queries are added here by the operators they exercise:
- bucketed cosine near-dup pairs (LSH buckets -> per-bucket BLAS kernel)
- SimHash banded near-pair candidates (equi-join, no O(n^2) scan)
- public pandas-like API surface for the dedup/similarity operators
"""

from __future__ import annotations

from pontem_spark.queries.registry import register  # noqa: F401
