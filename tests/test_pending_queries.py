"""Round-8 candidates (queries/round7_pending.py) proven against DuckDB
NOW, so flipping them into the registry next round ships them green.
Deliberately NOT part of the registry: the r7 driver window is budgeted
(see round7_pending's module docstring)."""

from __future__ import annotations

import pandas as pd
import pytest

from pontem_spark.queries.round7_pending import PENDING as PENDING_A
from pontem_spark.queries.round8_pending import PENDING as PENDING_B
from pontem_spark.queries.round9_pending import PENDING as PENDING_C
from pontem_spark.queries.round10_pending import PENDING as PENDING_D
from pontem_spark.queries.round11_pending import PENDING as PENDING_E
from pontem_spark.queries.round12_pending import PENDING as PENDING_F
from pontem_spark.queries.round13_pending import PENDING as PENDING_G
from pontem_spark.queries.round14_pending import PENDING as PENDING_H

PENDING = (
    PENDING_A + PENDING_B + PENDING_C + PENDING_D + PENDING_E + PENDING_F + PENDING_G + PENDING_H
)


@pytest.mark.parametrize("name", [n for n, _, _ in PENDING])
def test_pending_query_matches_oracle(name, spark, duck, sf_dir):
    import math

    fn = next(f for n, f, _ in PENDING if n == name)
    oracle = next(o for n, _, o in PENDING if n == name)
    got = fn(spark, sf_dir).toPandas()
    want = duck.execute(oracle).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    g = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(by=sorted(want.columns)).reset_index(drop=True)
    for c in g.columns:
        for i, (a, b) in enumerate(zip(g[c], w[c])):
            # NaT-aware: the driver's astype(str) compare renders NaT as
            # "NaT" on both sides; locally NaT == NaT is False, so treat
            # any pandas missing scalar as missing.
            a_nan = a is None or a is pd.NaT or (isinstance(a, float) and math.isnan(a))
            b_nan = b is None or b is pd.NaT or (isinstance(b, float) and math.isnan(b))
            assert a_nan == b_nan and (a_nan or a == b), (name, c, i, a, b)
