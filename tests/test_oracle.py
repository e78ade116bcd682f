"""Differential correctness: every registered query vs its DuckDB oracle.

This replicates the driver's t2 gate locally (row count + column names +
order-insensitive values), so a query that passes here passes the gate.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pontem_spark.queries.registry import all_queries

_QUERIES = all_queries()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64") + 0.0  # fold -0.0 → 0.0
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = _QUERIES[name]
    got = q.fn(spark, sf_dir).toPandas()

    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert got is not None
        return

    want = duck.execute(q.oracle).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"

    g, w = _normalize(got), _normalize(want)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            assert w[c].dtype.kind == "f" or w[c].isna().all(), f"{name}.{c}: dtype kind mismatch"
            for i, (a, b) in enumerate(zip(g[c], w[c])):
                both_nan = (isinstance(a, float) and math.isnan(a)) and (
                    isinstance(b, float) and math.isnan(b)
                )
                assert both_nan or a == b, f"{name}.{c}[{i}]: {a!r} != {b!r}"
        else:
            pd.testing.assert_series_equal(
                g[c], w[c], check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


def test_approx_aggregates_within_bounds(spark, duck, sf_dir):
    """The derived-output reformulation (r7) moved the tolerance checks
    IN-PLAN: the query itself emits parts_ok/supps_ok/median_ok booleans
    against its exact twins, and the oracle asserts them as literal 1s.
    This test reads the booleans directly so a tolerance failure reports
    WHICH guarantee broke instead of a bare hash mismatch, and checks the
    exact twins against DuckDB independently."""
    got = _QUERIES["q_approx_aggregates"].fn(spark, sf_dir).toPandas().set_index("l_returnflag")
    exact = duck.execute(
        """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS parts,
               COUNT(DISTINCT l_suppkey) AS supps
        FROM lineitem GROUP BY l_returnflag
        """
    ).fetchdf().set_index("l_returnflag")
    assert sorted(got.index) == sorted(exact.index)
    for flag in exact.index:
        g, e = got.loc[flag], exact.loc[flag]
        assert g["exact_parts"] == e["parts"], flag
        assert g["exact_supps"] == e["supps"], flag
        for b in ("parts_ok", "supps_ok", "median_ok"):
            assert g[b] == 1, (flag, b)
