"""Vector (embedding) column expressions: dot / norm / cosine over
``array<float>`` columns — pure Column expressions via higher-order
functions, no UDFs, so similarity math runs inside codegen.

``F.aggregate`` folds left-to-right, so summation order is deterministic and
identical on every engine that folds lists sequentially (DuckDB's list_sum
over list_transform does) — which is what lets cosine similarity be
oracle-checked bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is 0."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


# --- fixed-dimension variants ------------------------------------------------
# Spark does NOT whole-stage-codegen higher-order functions (aggregate/
# zip_with are interpreted per row) — a hot pairwise loop pays ~10x for it.
# When the dimension is statically known, expand the fold into a flat
# left-chained sum: bit-identical result (0.0 + x == x, then the same
# left-to-right addition order) but fully codegen'd. The expansion is built
# as ONE SQL string parsed by a single F.expr call — building 64+ Column
# objects through Py4J costs seconds of plan time per expression.
# These take column NAMES (they go into a parsed expression).


def dot_sql(a: str, b: str, dim: int, coeffs: list[float] | None = None) -> str:
    """Left-chained expanded dot product SQL. ``coeffs`` multiplies b's
    components (used for literal hyperplanes where b is omitted)."""
    terms = []
    for i in range(1, dim + 1):
        lhs = f"CAST(element_at({a}, {i}) AS DOUBLE)"
        if coeffs is not None:
            terms.append(f"{lhs} * CAST({coeffs[i - 1]!r} AS DOUBLE)")
        else:
            terms.append(f"{lhs} * CAST(element_at({b}, {i}) AS DOUBLE)")
    return " + ".join(terms)


def dot_fixed(a: str, b: str, dim: int) -> Column:
    return F.expr(dot_sql(a, b, dim))


def norm_fixed(a: str, dim: int) -> Column:
    return F.sqrt(F.expr(dot_sql(a, a, dim)))


def cosine_fixed(a: str, b: str, dim: int) -> Column:
    denom = norm_fixed(a, dim) * norm_fixed(b, dim)
    return F.when(denom > 0, dot_fixed(a, b, dim) / denom)


def cosine_with_norms(a: str, b: str, a_norm: Column, b_norm: Column, dim: int) -> Column:
    """Cosine when per-row norms are precomputed as columns: the pair-level
    expression is ONE expanded dot product instead of five (cosine_fixed
    re-derives each norm twice) — the difference between a codegen-able
    expression and an interpreted monster in pairwise joins."""
    denom = a_norm * b_norm
    return F.when(denom > 0, dot_fixed(a, b, dim) / denom)


# --- DuckDB SQL twins (same fold order, same double math) -------------------

def dot_oracle_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def norm_oracle_sql(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )


def cosine_oracle_sql(a: str, b: str) -> str:
    return f"({dot_oracle_sql(a, b)} / ({norm_oracle_sql(a)} * {norm_oracle_sql(b)}))"
