"""Physical/optimized plan inspection — the evidence layer for the engine's
scale claims. Every "this pushes down / broadcasts / shares one shuffle"
statement in the operator docstrings is asserted in tests/test_plan_quality.py
through these helpers, so a regression in plan shape fails CI, not a 100 TB
run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    # default maxMetadataStringLength (100) truncates PushedFilters/ReadSchema
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "10000")
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the parquet scan (PushedFilters)."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        frag = m.group(1).strip()
        if frag:
            out.extend(p.strip() for p in frag.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets each scan actually reads (ReadSchema) — column pruning
    evidence. One list per scan."""
    plan = physical_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the physical plan (Exchange nodes, excluding
    broadcast exchanges and reused ones)."""
    plan = physical_plan(df)
    total = len(re.findall(r"\bExchange (hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan))
    return total


def has_node(df: DataFrame, node: str) -> bool:
    return node in physical_plan(df)
