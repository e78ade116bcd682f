"""Query registry: every engine capability exposed as a named, oracle-checked query.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI-SQL string DuckDB can run over the same parquet tables.
The driver (and ``tests/test_oracle.py``) executes both and compares
row-count + schema + order-insensitive value hash — so column NAMES and TYPES
must match exactly on both sides.

Float discipline: aggregate doubles are ``ROUND()``ed to a fixed number of
decimals on BOTH sides, so the two engines' different summation orders cannot
produce hash mismatches in the last ulp.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over views named like the tables; None = rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        from pontem_spark.functions.compat import portable_round_sql

        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        # ROUND() is not double-portable across engines; rewrite to the
        # deterministic floor form (see functions/compat.py).
        sql = portable_round_sql(oracle) if oracle is not None else None
        _REGISTRY[name] = Query(name, fn, sql, description or (fn.__doc__ or ""), tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all query modules and return the full registry.

    Import order matters: the driver's correctness gate records the FIRST 50
    registrations, so families without a green driver row yet are imported
    first (round-robin rotation across rounds). Round 2 order: tpch2, tpch3,
    windows, tpch (set-ops/cube/rollup/semi/anti/skew tail), then this
    round's new queries, then the families already driver-verified in r01.
    """
    # Imports are deferred so `import pontem_spark` stays cheap.
    from pontem_spark.queries import (  # noqa: F401
        tpch2,
        tpch3,
        windows,
        tpch,
        round2,
        multimodal,
        asof,
        dedup,
        events,
        rangeops,
        scalar,
        series_api,
        similarity,
        streaming_q,
        text,
    )

    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
