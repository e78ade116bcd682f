"""Round-12 probe-batch regression pins (probe_r12_ctor_chains,
probe_r12_resample_reshape):

1. merge column ORDER is pandas': left frame's columns in their original
   positions (keys stay in place), then the right's non-key columns —
   not keys-first.
2. merge row order under DUPLICATE index labels follows each side's
   visible ROW order (the order spec rides through the join), not the
   index value, which ties.
3. assign/setitem of a row-aligned derived Series (shift/cumsum/grouped
   cumsum) over a duplicate-label frame stays positional — the shared
   order-spec helper joins along with the label, so no k-squared fanout.
4. sort_index is stable within duplicate labels (pandas kind='stable';
   the quicksort default's intra-tie order is an artifact) and puts
   missing labels LAST in both directions (na_position='last').
"""
from __future__ import annotations

import pandas as pd
import pytest

from pontem_spark.core import DataFrame, Series


# -- 1. merge column order -------------------------------------------------


def test_merge_column_order(spark):
    left = pd.DataFrame({"u": [1.0, 2.0], "v": [3.0, 4.0], "k": ["x", "y"]})
    right = pd.DataFrame({"k": ["x", "y"], "kw": [10.0, 20.0]})
    want = left.merge(right, on="k")
    got = (
        DataFrame(left, spark=spark)
        .merge(DataFrame(right, spark=spark), on="k")
        .to_pandas()
    )
    assert list(got.columns) == list(want.columns)  # u, v, k, kw


def test_merge_column_order_with_suffixes(spark):
    left = pd.DataFrame({"a": [1], "k": ["x"], "b": [2]})
    right = pd.DataFrame({"b": [9], "k": ["x"], "c": [3]})
    want = left.merge(right, on="k")
    got = (
        DataFrame(left, spark=spark)
        .merge(DataFrame(right, spark=spark), on="k")
        .to_pandas()
    )
    assert list(got.columns) == list(want.columns)  # a, k, b_x, b_y, c


# -- 2. merge row order under duplicate labels -------------------------------


def test_merge_row_order_duplicate_labels(spark):
    left = pd.DataFrame(
        {"u": [1.0, 2.0, 3.0, 4.0], "k": ["x", "y", "x", "y"]},
        index=[7, 7, 5, 5],
    )
    right = pd.DataFrame({"k": ["x", "y"], "kw": [10.0, 20.0]})
    want = left.merge(right, on="k").reset_index(drop=True)
    got = (
        DataFrame(left, spark=spark)
        .merge(DataFrame(right, spark=spark), on="k")
        .reset_index(drop=True)
        .to_pandas()
    )
    assert got["u"].tolist() == want["u"].tolist()
    assert got["kw"].tolist() == want["kw"].tolist()


# -- 3. setitem of derived series under duplicate labels ---------------------


def test_assign_shift_duplicate_labels_no_fanout(spark):
    pdf = pd.DataFrame({"u": [1.0, 2.0, 3.0, 4.0]}, index=[5, 5, 7, 7])
    want = pdf.assign(su=pdf["u"].shift(1))
    df = DataFrame(pdf, spark=spark)
    got = df.assign(su=df["u"].shift(1)).to_pandas()
    assert len(got) == len(want)
    assert got["su"].fillna(-1).tolist() == want["su"].fillna(-1).tolist()


def test_assign_cumsum_duplicate_labels_no_fanout(spark):
    pdf = pd.DataFrame({"u": [4.0, 3.0, 2.0, 1.0]}, index=[9, 3, 9, 3])
    want = pdf.assign(cs=pdf["u"].cumsum())
    df = DataFrame(pdf, spark=spark)
    got = df.assign(cs=df["u"].cumsum()).to_pandas()
    assert len(got) == len(want)
    assert got["cs"].tolist() == want["cs"].tolist()
    assert got.index.tolist() == want.index.tolist()


def test_assign_grouped_cumsum_duplicate_labels(spark):
    pdf = pd.DataFrame(
        {"u": [1.0, 2.0, 3.0, 4.0], "k": ["a", "b", "a", "b"]},
        index=[2, 2, 1, 1],
    )
    want = pdf.assign(gc=pdf.groupby("k")["u"].cumsum())
    df = DataFrame(pdf, spark=spark)
    got = df.assign(gc=df.groupby("k")["u"].cumsum()).to_pandas()
    assert len(got) == len(want)
    assert got["gc"].tolist() == want["gc"].tolist()


# -- 4. sort_index stability + missing-last ----------------------------------


def test_sort_index_stable_within_duplicates(spark):
    # pandas' quicksort default scrambles intra-tie order (an artifact);
    # the engine pins pandas' kind='stable' order instead
    idx = [105, 103, 105, 101, 103, 105]
    u = [1.5, 2.5, 3.5, 4.5, 5.5, 6.5]
    want = pd.DataFrame({"u": u}, index=idx).sort_index(kind="stable")
    got = DataFrame({"u": u}, index=idx, spark=spark).sort_index().to_pandas()
    assert got.index.tolist() == want.index.tolist()
    assert got["u"].tolist() == want["u"].tolist()


def test_sort_index_missing_labels_last(spark):
    vals = ["b-1", None, "a-2", "nomatch"]
    s = Series(vals, spark=spark)
    f = s.str.extract(r"([a-z]+)-(\d+)", expand=True).set_index("0").sort_index()
    pf = (
        pd.Series(vals)
        .str.extract(r"([a-z]+)-(\d+)", expand=True)
        .set_index(0)
        .sort_index()
    )
    got = f.to_pandas()
    assert [x if pd.notna(x) else None for x in got.index] == [
        x if pd.notna(x) else None for x in pf.index
    ]
    assert [x if pd.notna(x) else None for x in got["1"]] == [
        x if pd.notna(x) else None for x in pf[1]
    ]


def test_series_sort_index_nan_last(spark):
    s = Series([10.0, 20.0, 30.0], index=[2.0, float("nan"), 1.0], spark=spark)
    want = pd.Series([10.0, 20.0, 30.0], index=[2.0, float("nan"), 1.0]).sort_index()
    got = s.sort_index().to_pandas()
    assert got.tolist() == want.tolist()
    gi, wi = list(got.index), list(want.index)
    assert [x if pd.notna(x) else None for x in gi] == [
        x if pd.notna(x) else None for x in wi
    ]


def test_sort_values_by_index_level(spark):
    # pandas accepts an index-level name in by= (probe batch 3)
    pdf = pd.DataFrame({"u": [3.0, 1.0, 2.0], "v": [9.0, 8.0, 7.0]})
    want = pdf.set_index("u").sort_values("u")
    got = DataFrame(pdf, spark=spark).set_index("u").sort_values("u").to_pandas()
    assert got.index.tolist() == want.index.tolist()
    assert got["v"].tolist() == want["v"].tolist()


def test_sort_values_ambiguous_key_raises(spark):
    pdf = pd.DataFrame({"a": [1, 2], "v": [3.0, 4.0]})
    df = DataFrame(pdf, spark=spark).set_index("a")
    df["a"] = df["v"]
    with pytest.raises(ValueError, match="both an index level and a column label"):
        df.sort_values("a")


def test_sort_values_unknown_key_raises(spark):
    df = DataFrame({"a": [1, 2]}, spark=spark)
    with pytest.raises(KeyError):
        df.sort_values("nope")


# -- 5. Series dup-label row-aligned derivations (probe batch 4) -------------


def test_series_binop_shift_duplicate_labels(spark):
    ps = pd.Series([1.0, 2.0, 3.0, 4.0], index=[5, 5, 7, 7])
    s = Series([1.0, 2.0, 3.0, 4.0], index=[5, 5, 7, 7], spark=spark)
    want = ps + ps.shift(1)
    got = (s + s.shift(1)).to_pandas()
    assert len(got) == len(want)
    assert got.fillna(-9).tolist() == want.fillna(-9).tolist()
    assert got.index.tolist() == want.index.tolist()


def test_series_where_derived_duplicate_labels(spark):
    ps = pd.Series([1.0, 2.0, 3.0, 4.0], index=[5, 5, 7, 7])
    s = Series([1.0, 2.0, 3.0, 4.0], index=[5, 5, 7, 7], spark=spark)
    want = ps.where(ps.shift(1) > 1.0, -1.0)
    got = s.where(s.shift(1) > 1.0, -1.0).to_pandas()
    assert got.tolist() == want.tolist()


def test_series_update_derived_duplicate_labels(spark):
    ps = pd.Series([1.0, 2.0, 3.0, 4.0], index=[5, 5, 7, 7])
    ps2 = ps.copy()
    ps2.update(ps.shift(2))
    s = Series([1.0, 2.0, 3.0, 4.0], index=[5, 5, 7, 7], spark=spark)
    s.update(s.shift(2))
    assert s.to_pandas().tolist() == ps2.tolist()


def test_series_combine_first_keeps_order(spark):
    # identical visible sequences keep their (non-index) order — the old
    # direct join displayed index-sorted
    ps = pd.Series([3.0, None, 2.0], index=[9, 7, 8])
    want = ps.combine_first(ps.shift(1))
    s = Series([3.0, None, 2.0], index=[9, 7, 8], spark=spark)
    got = s.combine_first(s.shift(1)).to_pandas()
    assert got.index.tolist() == want.index.tolist()
    assert got.fillna(-9).tolist() == want.fillna(-9).tolist()


def test_series_where_after_aligned_binop(spark):
    # the aligned-binop result carries an all-NULL __alunion__ helper;
    # the where join must be NULL-SAFE on helper keys or every row
    # loses its cond match (probe batch 4, case 3:23)
    ps = pd.Series([1.0, 2.0, 3.0, 4.0], index=[7, 7, 5, 5])
    p2 = ps - ps.cumsum()
    want = p2.where(p2.shift(1) > 0.0, -1.0)
    s = Series([1.0, 2.0, 3.0, 4.0], index=[7, 7, 5, 5], spark=spark)
    s2 = s - s.cumsum()
    got = s2.where(s2.shift(1) > 0.0, -1.0).to_pandas()
    assert got.tolist() == want.tolist()


def test_frame_update_derived_duplicate_labels(spark):
    # frame.update(df-derived) is positional under duplicate labels
    pdf = pd.DataFrame(
        {"u": [1.0, 2.0, 3.0, 4.0], "v": [9.0, 8.0, 7.0, 6.0]}, index=[5, 5, 7, 7]
    )
    want = pdf.copy()
    want.update(pdf[["u"]].shift(2))
    df = DataFrame(pdf, spark=spark)
    shifted = df[["u"]].assign(u=df["u"].shift(2))[["u"]]
    df.update(shifted)
    got = df.to_pandas()
    assert len(got) == len(want)
    assert got["u"].tolist() == want["u"].tolist()
    assert got["v"].tolist() == want["v"].tolist()


def test_series_sort_index_stable_descending(spark):
    s = Series([1.0, 2.0, 3.0, 4.0], index=[5, 3, 5, 3], spark=spark)
    want = pd.Series([1.0, 2.0, 3.0, 4.0], index=[5, 3, 5, 3]).sort_index(
        ascending=False, kind="stable"
    )
    got = s.sort_index(ascending=False).to_pandas()
    assert got.tolist() == want.tolist()
    assert got.index.tolist() == want.index.tolist()
