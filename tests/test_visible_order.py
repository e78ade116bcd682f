"""Round-10 composition-probe pins: the VISIBLE order (order_spec) is
the engine's pandas row order, and it must (a) survive every
order-preserving op and (b) drive every positional computation.

The probe (tests/probe_r10_compose.py) found seven composition failures
in one sweep, all in two classes:
1. order-preserving ops (mask filter, dropna, sample, query, setitem,
   drop_duplicates) dropped the order_spec — output silently reverted
   to index order;
2. positional ops (cumsum/shift/ffill/pct_change/rolling/expanding/
   ewm/interpolate/rank/duplicated) ordered their windows by INDEX_COL,
   so a sorted frame COMPUTED in unsorted order — wrong values, not
   just wrong display order — and set_index rebound specs that named
   INDEX_COL (positional slices) to the NEW index.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pontem_spark.core.frame import DataFrame
from pontem_spark.core.series import Series

U = [7.5, -39.5, 33.5, -23.5, -19.5, 38.5, -43.5, -30.5, 32.5]
V = [1.0, None, 3.0, 4.0, None, 6.0, 7.0, 8.0, 9.0]
K = list("xyzxyzxyz")


def _mk():
    return (
        DataFrame({"u": U, "v": V, "k": K}),
        pd.DataFrame({"u": U, "v": pd.Series(V, dtype="float64"), "k": K}),
    )


def _eq_frame(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert list(got.columns) == list(want.columns)
    assert [str(x) for x in got.index] == [str(x) for x in want.index]
    for c in got.columns:
        for a, b in zip(got[c], want[c]):
            if pd.isna(a) or pd.isna(b):
                assert bool(pd.isna(a)) == bool(pd.isna(b)), c
            elif isinstance(a, (int, float, np.floating, np.integer)):
                assert abs(float(a) - float(b)) < 1e-9, c
            else:
                assert a == b, c


@pytest.mark.parametrize(
    "op",
    [
        lambda d: d[d["u"] > -25.0],
        lambda d: d.dropna(),
        lambda d: d.assign(w=d["v"] * 2),
        lambda d: d.query("u > -25.0"),
        lambda d: d.drop_duplicates(subset=["k"]),
    ],
    ids=["mask", "dropna", "assign", "query", "drop_dup"],
)
def test_order_preserving_ops_keep_sort(spark, op):
    df, pdf = _mk()
    got = op(df.sort_values("u", ascending=False)).to_pandas()
    want = op(pdf.sort_values("u", ascending=False))
    _eq_frame(got, want)


def test_positional_ops_follow_visible_order(spark):
    df, pdf = _mk()
    sd, sp = df.sort_values("u"), pdf.sort_values("u")
    for name, g, w in (
        ("cumsum", sd["v"].cumsum(), sp["v"].cumsum()),
        ("shift", sd["v"].shift(1), sp["v"].shift(1)),
        ("ffill", sd["v"].ffill(), sp["v"].ffill()),
        ("pct", sd["u"].pct_change(), sp["u"].pct_change()),
        ("roll", sd["u"].rolling(3).mean(), sp["u"].rolling(3).mean()),
        ("expand", sd["u"].expanding(2).sum(), sp["u"].expanding(2).sum()),
        ("interp", sd["v"].interpolate(), sp["v"].interpolate()),
        ("ewm", sd["u"].ewm(alpha=0.5).mean(), sp["u"].ewm(alpha=0.5).mean()),
        ("cummax", sd["v"].cummax(), sp["v"].cummax()),
    ):
        got, want = g.to_pandas(), w
        assert list(got.index) == list(want.index), name
        gv, wv = list(got.values), list(want.values)
        for a, b in zip(gv, wv):
            if pd.isna(a) or pd.isna(b):
                assert bool(pd.isna(a)) == bool(pd.isna(b)), name
            else:
                assert abs(float(a) - float(b)) < 1e-9, (name, gv, wv)


def test_set_index_keeps_sorted_and_reversed_order(spark):
    df, pdf = _mk()
    _eq_frame(
        df.sort_values("u", ascending=False).set_index("u").to_pandas(),
        pdf.sort_values("u", ascending=False).set_index("u"),
    )
    # the INDEX_COL-rebind case: positional slice spec names the index
    _eq_frame(
        df.tail(4).iloc[::-1].set_index("u").to_pandas(),
        pdf.tail(4).iloc[::-1].set_index("u"),
    )


def test_sort_index_then_set_index(spark):
    df, pdf = _mk()
    got = df[df["u"] > -25.0].sort_index().set_index("u").to_pandas()
    want = pdf[pdf["u"] > -25.0].sort_index().set_index("u")
    _eq_frame(got, want)


def test_duplicated_first_by_visible_order(spark):
    s = Series([2.0, 1.0, 2.0, 3.0, 1.0], name="v")
    ps = pd.Series([2.0, 1.0, 2.0, 3.0, 1.0])
    sorted_s, sorted_p = s.sort_values(ascending=False), ps.sort_values(ascending=False)
    for keep in ("first", "last"):
        got = sorted_s.duplicated(keep=keep).to_pandas()
        want = sorted_p.duplicated(keep=keep)
        assert list(got.index) == list(want.index), keep
        assert list(got.values) == list(want.values), keep
        g2 = sorted_s.drop_duplicates(keep=keep).to_pandas()
        w2 = sorted_p.drop_duplicates(keep=keep)
        assert list(g2.index) == list(w2.index), keep
        assert list(g2.values) == list(w2.values), keep


def test_explode_element_order_stable(spark):
    df = DataFrame({"a": [[3, 1, 2], [9, 8], []], "b": ["p", "q", "r"]})
    pdf = pd.DataFrame({"a": [[3, 1, 2], [9, 8], []], "b": ["p", "q", "r"]})
    got = df.explode("a").to_pandas()
    want = pdf.explode("a")
    assert list(got.index) == list(want.index)
    # dtype differs (Spark int-with-null → float64 vs pandas object) —
    # compare numerically
    gv = [None if pd.isna(x) else float(x) for x in got["a"]]
    wv = [None if pd.isna(x) else float(x) for x in want["a"]]
    assert gv == wv

    s = Series([[3, 1, 2], [9, 8]], name="a")
    ps = pd.Series([[3, 1, 2], [9, 8]])
    assert [float(x) for x in s.explode().to_pandas()] == [
        float(x) for x in ps.explode()
    ]


def test_repeat_keeps_visible_order(spark):
    s = Series([3.0, 1.0, 2.0])
    ps = pd.Series([3.0, 1.0, 2.0])
    got = s.sort_values().repeat(2).to_pandas()
    want = ps.sort_values().repeat(2)
    assert list(got.index) == list(want.index)
    assert list(got.values) == list(want.values)


def test_grouped_windows_follow_visible_order(spark):
    data = {
        "k": list("xyxyxy"),
        "v": [5.0, 1.0, 3.0, 2.0, 4.0, 6.0],
        "u": [10.0, 20.0, 5.0, 8.0, 30.0, 1.0],
    }
    df = DataFrame(data)
    pdf = pd.DataFrame(data)
    sd, sp = df.sort_values("u"), pdf.sort_values("u")
    for name, g, w in (
        ("cumsum", sd.groupby("k")["v"].cumsum(), sp.groupby("k")["v"].cumsum()),
        ("shift", sd.groupby("k")["v"].shift(1), sp.groupby("k")["v"].shift(1)),
        ("diff", sd.groupby("k")["v"].diff(), sp.groupby("k")["v"].diff()),
        ("pct", sd.groupby("k")["v"].pct_change(), sp.groupby("k")["v"].pct_change()),
        ("cumcount", sd.groupby("k")["v"].cumcount(), sp.groupby("k")["v"].cumcount()),
    ):
        got, want = list(g.to_pandas()), list(w)
        assert len(got) == len(want), name
        for a, b in zip(got, want):
            if pd.isna(a) or pd.isna(b):
                assert bool(pd.isna(a)) == bool(pd.isna(b)), name
            else:
                assert abs(float(a) - float(b)) < 1e-9, (name, got, want)
    # positional picks follow the visible order too
    gh = sd.groupby("k").head(1).to_pandas()
    wh = sp.groupby("k").head(1)
    assert list(gh["v"]) == list(wh["v"])
    # grouped rolling / ewm values (result row order is engine-specific)
    gr = sd.groupby("k")["v"].rolling(2).mean().to_pandas()
    wr = sp.groupby("k")["v"].rolling(2).mean()
    assert sorted(round(x, 9) for x in gr if not pd.isna(x)) == sorted(
        round(float(x), 9) for x in wr if not pd.isna(x)
    )
    ge = sd.groupby("k")["v"].ewm(alpha=0.5).mean().to_pandas()
    we = sp.groupby("k")["v"].ewm(alpha=0.5).mean()
    assert sorted(round(x, 9) for x in ge) == sorted(round(float(x), 9) for x in we)


def test_frame_ewm_follows_visible_order(spark):
    data = {"v": [5.0, 1.0, 3.0, 2.0], "u": [10.0, 20.0, 5.0, 8.0]}
    df, pdf = DataFrame(data), pd.DataFrame(data)
    got = df.sort_values("u")[["v"]].ewm(alpha=0.5).mean().to_pandas()
    want = pdf.sort_values("u")[["v"]].ewm(alpha=0.5).mean()
    assert list(got.index) == list(want.index)
    assert [round(x, 9) for x in got["v"]] == [round(float(x), 9) for x in want["v"]]


def test_window_columns_fixed_before_filter(spark):
    """A window-derived column assigned back then FILTERED keeps its
    pre-filter values (pandas evaluates eagerly; a lazy window expression
    would recompute over the filtered rows — r10 probe batch 7b)."""
    data = {
        "u": [-40.5, 8.5, 43.5, 1.5, 4.5, 18.5, 45.5, -14.5, 19.5, -46.5],
        "k": list("xxyyzyzzyy"),
    }
    df, pdf = DataFrame(data), pd.DataFrame(data)
    a = df.assign(dd=lambda d: d.duplicated(subset=["k"]))
    a = a[a["u"] > -20.0]
    b = pdf.assign(dd=lambda p: p.duplicated(subset=["k"]))
    b = b[b["u"] > -20.0]
    got, want = a.to_pandas(), b
    assert list(got.index) == list(want.index)
    assert list(got["dd"]) == list(want["dd"])
    # Series flavor: cumsum then mask
    s = Series([1.0, 2.0, 3.0, 4.0], name="v")
    ps = pd.Series([1.0, 2.0, 3.0, 4.0])
    cs, pcs = s.cumsum(), ps.cumsum()
    got_s = cs[cs > 2.0].to_pandas()
    want_s = pcs[pcs > 2.0]
    assert list(got_s.index) == list(want_s.index)
    assert list(got_s.values) == list(want_s.values)


def test_dropna_after_window_assign(spark):
    """dropna filters on the materialized projection — a grouped-cumsum
    column inside WHERE is illegal in Spark (r10 probe batch 7b)."""
    data = {"u": [5.5, None, 3.5, 2.5], "k": list("xyxy"), "v": [1.0, 2.0, None, 4.0]}
    df, pdf = DataFrame(data), pd.DataFrame(data)
    g = df.ffill().assign(gc=lambda d: d.groupby("k")["u"].cumsum()).dropna().to_pandas()
    w = pdf.ffill().assign(gc=lambda p: p.groupby("k")["u"].cumsum()).dropna()
    assert list(g.index) == list(w.index)
    assert list(g["gc"]) == list(w["gc"])


def test_frame_duplicated_visible_order(spark):
    data = {"u": [5.5, 1.5, 3.5, 2.5, 4.5], "k": list("xyxyx")}
    df, pdf = DataFrame(data), pd.DataFrame(data)
    for keep in ("first", "last"):
        a = df.iloc[::-1].sort_values("u", ascending=False).duplicated(
            subset=["k"], keep=keep
        ).to_pandas()
        b = pdf.iloc[::-1].sort_values("u", ascending=False).duplicated(
            subset=["k"], keep=keep
        )
        assert list(a.index) == list(b.index), keep
        assert list(a.values) == list(b.values), keep


def test_series_binop_keeps_left_order(spark):
    """The LEFT operand's visible order carries through an aligned binop
    (diff = self - self.shift() on a sorted series stays sorted — r10
    probe batch 8)."""
    s = Series([7.25, -12.75, -3.75, 10.25, 26.25], name="v")
    ps = pd.Series([7.25, -12.75, -3.75, 10.25, 26.25])
    got = s.sort_values(ascending=False).diff().to_pandas()
    want = ps.sort_values(ascending=False).diff()
    assert list(got.index) == list(want.index)
    for a, b in zip(got.values, want.values):
        if pd.isna(a) or pd.isna(b):
            assert bool(pd.isna(a)) == bool(pd.isna(b))
        else:
            assert abs(float(a) - float(b)) < 1e-9
