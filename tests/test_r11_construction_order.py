"""Construction order IS the pandas row order (r11 probe batch 5).

A fresh Series/DataFrame with a non-monotonic explicit index used to
display index-sorted (spec None = index order) — and positional ops
(shift/cumsum/head/explode) then ran in that order, producing different
VALUES than pandas. Construction now records the pandas order in a
'__ctor__' helper (only when it differs from index order, so RangeIndex
and sorted-index frames stay column-free).
"""
from __future__ import annotations

import pandas as pd
import pytest

from pontem_spark.core import DataFrame, Series


def test_series_unsorted_index_display_order(spark):
    ps = pd.Series([4.0, 1.0, 3.0, 2.0], index=[3, 1, 4, 2])
    gs = Series([4.0, 1.0, 3.0, 2.0], index=[3, 1, 4, 2], spark=spark).to_pandas()
    assert gs.index.tolist() == ps.index.tolist()
    assert gs.tolist() == ps.tolist()


def test_series_unsorted_index_positional_values(spark):
    ps = pd.Series([4.0, 1.0, 3.0, 2.0], index=[3, 1, 4, 2])
    gs = Series([4.0, 1.0, 3.0, 2.0], index=[3, 1, 4, 2], spark=spark)
    # shift/cumsum act on the construction order — VALUES differ if the
    # engine sorts by index first
    assert gs.shift(1).to_pandas().tolist()[1:] == ps.shift(1).tolist()[1:]
    assert gs.cumsum().to_pandas().tolist() == ps.cumsum().tolist()
    assert gs.head(2).to_pandas().tolist() == ps.head(2).tolist()


def test_frame_unsorted_index_display_and_positional(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0]}, index=[30, 10, 20])
    g = DataFrame(pdf, spark=spark)
    got = g.to_pandas()
    assert got.index.tolist() == pdf.index.tolist()
    assert got["a"].tolist() == pdf["a"].tolist()
    assert g.iloc[0:2].to_pandas()["a"].tolist() == pdf.iloc[0:2]["a"].tolist()
    # derived chain keeps construction order
    want = pdf.assign(cs=pdf["a"].cumsum())
    gotc = g.assign(cs=g["a"].cumsum()).to_pandas()
    assert gotc["cs"].tolist() == want["cs"].tolist()


def test_sorted_index_stays_helper_free(spark):
    # monotonic explicit index (and RangeIndex) must NOT grow the helper
    # column — the common path stays as it was
    gs = Series([1.0, 2.0], index=[10, 20], spark=spark)
    assert "__ctor__" not in gs._internal.sdf.columns
    gd = DataFrame(pd.DataFrame({"a": [1, 2]}), spark=spark)
    assert "__ctor__" not in gd._internal.sdf.columns


def test_unsorted_then_sort_index_matches_pandas(spark):
    ps = pd.Series([4.0, 1.0, 3.0], index=[3, 1, 2])
    gs = Series([4.0, 1.0, 3.0], index=[3, 1, 2], spark=spark)
    assert gs.sort_index().to_pandas().tolist() == ps.sort_index().tolist()
    assert (
        gs.sort_values().to_pandas().index.tolist()
        == ps.sort_values().index.tolist()
    )
