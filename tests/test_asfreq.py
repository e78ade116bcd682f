"""Series/DataFrame.asfreq differential pins vs pandas.

asfreq anchors the grid at the FIRST observation (index[0]), takes
values at EXACT grid timestamps, and fills the rest: NaN, fill_value
(grid-introduced gaps only — a matched NaN survives), or ffill/bfill by
POSITION (an observed NaN propagates under ffill, pandas reindex
semantics).
"""
from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pontem_spark.core import from_spark


def _mk(spark, vals, minutes):
    t0 = dt.datetime(2024, 3, 1, 0, 13)  # deliberately off-midnight anchor
    rows = [
        (t0 + dt.timedelta(minutes=m), None if v is None else float(v))
        for m, v in zip(minutes, vals)
    ]
    base = spark.createDataFrame(rows, "ts timestamp, v double")
    s = from_spark(base, index_col="ts")["v"]
    ws = pd.Series(
        [np.nan if v is None else float(v) for v in vals],
        index=[t0 + dt.timedelta(minutes=m) for m in minutes],
        dtype="float64",
    )
    return s, ws


VALS = [1.0, None, 3.0, 4.0, 5.0]
MINUTES = [0, 30, 60, 150, 240]  # grid hits at 0/60/240 for '1h'


@pytest.mark.parametrize("freq", ["30min", "1h", "45min"])
def test_asfreq_exact(spark, freq):
    s, ws = _mk(spark, VALS, MINUTES)
    got = s.asfreq(freq).to_pandas().sort_index()
    want = ws.asfreq(freq)
    assert got.index.tolist() == want.index.tolist(), freq
    assert got.values.tolist() == pytest.approx(want.values.tolist(), nan_ok=True)


def test_asfreq_fill_value_spares_matched_nan(spark):
    s, ws = _mk(spark, VALS, MINUTES)
    got = s.asfreq("30min", fill_value=-1.0).to_pandas().sort_index()
    want = ws.asfreq("30min", fill_value=-1.0)
    # the observed NaN at +30min is a MATCHED row: stays NaN, not -1
    assert np.isnan(want.iloc[1]) and np.isnan(got.iloc[1])
    assert got.values.tolist() == pytest.approx(want.values.tolist(), nan_ok=True)


@pytest.mark.parametrize("method", ["ffill", "bfill"])
def test_asfreq_method(spark, method):
    s, ws = _mk(spark, VALS, MINUTES)
    got = s.asfreq("45min", method=method).to_pandas().sort_index()
    want = ws.asfreq("45min", method=method)
    assert got.index.tolist() == want.index.tolist()
    assert got.values.tolist() == pytest.approx(want.values.tolist(), nan_ok=True)


def test_asfreq_ffill_propagates_observed_nan(spark):
    # positional fill: the NaN observation at +30min IS the previous
    # value for an unmatched grid point right after it
    s, ws = _mk(spark, VALS, MINUTES)
    got = s.asfreq("40min", method="ffill").to_pandas().sort_index()
    want = ws.asfreq("40min", method="ffill")
    assert got.index.tolist() == want.index.tolist()
    assert got.values.tolist() == pytest.approx(want.values.tolist(), nan_ok=True)


def test_asfreq_errors(spark):
    s, _ = _mk(spark, VALS, MINUTES)
    with pytest.raises(ValueError):
        s.asfreq("2mo")
    with pytest.raises(ValueError):
        s.asfreq("1h", method="cubic")


def test_frame_asfreq(spark):
    t0 = dt.datetime(2024, 3, 1, 0, 13)
    rows = [
        (t0 + dt.timedelta(minutes=m), float(i), f"s{i}")
        for i, m in enumerate(MINUTES)
    ]
    base = spark.createDataFrame(rows, "ts timestamp, x double, tag string")
    df = from_spark(base, index_col="ts")
    pdf = pd.DataFrame(
        {"x": [float(i) for i in range(len(MINUTES))], "tag": [f"s{i}" for i in range(len(MINUTES))]},
        index=[t0 + dt.timedelta(minutes=m) for m in MINUTES],
    )
    for kwargs in ({}, {"method": "ffill"}, {"method": "bfill"}):
        got = df.asfreq("45min", **kwargs).to_pandas().sort_index()
        want = pdf.asfreq("45min", **kwargs)
        assert got.index.tolist() == want.index.tolist(), kwargs
        assert [None if pd.isna(v) else v for v in got["x"]] == [
            None if pd.isna(v) else v for v in want["x"]
        ], kwargs
        assert [None if pd.isna(v) else v for v in got["tag"]] == [
            None if pd.isna(v) else v for v in want["tag"]
        ], kwargs
