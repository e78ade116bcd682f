"""Declarative data-quality expectations, evaluated in one pass.

The "contract at the pipeline boundary" operator (the shape Great
Expectations / dbt tests standardize, public): a list of rules —
completeness, uniqueness, ranges, accepted values, pattern shares —
compiled into a SINGLE aggregation over the table. One scan, one
partial-agg-combinable job, |rules| output rows; adding a rule never
adds a pass over the data.

Cross-engine: every metric is a ratio of counts (exact integers) or a
min/max of the column's own values; the pass/fail compare runs on the
ROUNDED metric so a last-ulp division difference cannot flip a verdict.

Reference parity: extension surface (SURVEY.md §2.G data-ops); the
reference engine has no expectations operator.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from pontem_spark.functions.compat import rnd

_ROUND = 6


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` is one of:

    - ``not_null``:   fraction of non-null rows        >= threshold
    - ``unique``:     distinct / non-null count        >= threshold
    - ``min_ge``:     column minimum                   >= threshold
    - ``max_le``:     column maximum                   <= threshold
    - ``in_set``:     fraction of rows in ``values``   >= threshold
    - ``matches``:    fraction matching regex ``pattern`` >= threshold
      (keep patterns to the portable common subset — character classes,
      anchors, quantifiers — if an oracle will replay them)
    """

    name: str
    kind: str
    col: str
    threshold: float
    values: tuple = field(default_factory=tuple)
    pattern: str = ""


def _metric(r: Rule) -> Column:
    c = F.col(r.col)
    n = F.count(F.lit(1)).cast("double")
    if r.kind == "not_null":
        return F.count(c) / n
    if r.kind == "unique":
        return F.count_distinct(c).cast("double") / F.count(c)
    if r.kind == "min_ge":
        return F.min(c).cast("double")
    if r.kind == "max_le":
        return F.max(c).cast("double")
    if r.kind == "in_set":
        return F.sum(F.when(c.isin(*r.values), 1).otherwise(0)) / n
    if r.kind == "matches":
        return F.sum(F.when(c.cast("string").rlike(r.pattern), 1).otherwise(0)) / n
    raise ValueError(f"unknown expectation kind: {r.kind!r}")


def run_expectations(df: DataFrame, rules: "list[Rule]") -> DataFrame:
    """Evaluate every rule in ONE aggregation pass.

    Returns (rule_name, metric, threshold, passed) — ``passed`` compares
    the rounded metric (``max_le`` flips the direction).
    """
    if not rules:
        raise ValueError("run_expectations: empty rule list")
    one = df.agg(
        *[rnd(_metric(r), _ROUND).alias(f"__m{i}") for i, r in enumerate(rules)]
    )
    rows = []
    for i, r in enumerate(rules):
        m = F.col(f"__m{i}")
        passed = m <= F.lit(r.threshold) if r.kind == "max_le" else m >= F.lit(r.threshold)
        rows.append(
            F.struct(
                F.lit(r.name).alias("rule_name"),
                m.alias("metric"),
                F.lit(float(r.threshold)).alias("threshold"),
                passed.alias("passed"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("__r")).select(
        "__r.rule_name", "__r.metric", "__r.threshold", "__r.passed"
    )
