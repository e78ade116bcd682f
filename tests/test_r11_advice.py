"""Round-11 regression pins for the r10 ADVICE findings.

1. Chained explode/repeat: each posexplode appends a UNIQUE position
   helper to the order spec (reusing '__epos__' produced a duplicate
   column → AMBIGUOUS_REFERENCE at materialization).
2. asfreq grid in MICROSECONDS: unix_timestamp's whole-second truncation
   silently NaN'd every sub-second-anchored index; duplicate index
   timestamps now raise like pandas.
3. Aligned binop order: any unmatched row flips the result order to the
   sorted index union (pandas), instead of right-only rows riding
   nulls-first to the FRONT of the left operand's carried order.
4. GroupedEwm sorts by (name, asc) PAIRS — separately filtered
   names/flags shifted surviving columns onto the preceding column's
   direction when a spec column was dropped.

(The 5th finding — asfreq fill_value+method — is pinned as the pandas-2.2
behavior: method wins and fill_value is ignored, asfreq does NOT raise.)
"""
from __future__ import annotations

import pandas as pd
import pytest

from pontem_spark.core import DataFrame, Series


# -- 1. chained explode/repeat -------------------------------------------------


def test_frame_chained_explode_nested(spark):
    pdf = pd.DataFrame({"a": [[[1, 2], [3]], [[4]]]})
    want = pdf.explode("a").explode("a")
    got = DataFrame(pdf, spark=spark).explode("a").explode("a").to_pandas()
    assert list(got["a"]) == list(want["a"])
    assert got.index.tolist() == want.index.tolist()


def test_frame_chained_explode_scalar_noop(spark):
    # first explode flattens to scalars; pandas' second explode is identity
    pdf = pd.DataFrame({"a": [[1, 2], [3]], "b": ["x", "y"]})
    want = pdf.explode("a").explode("a")
    got = DataFrame(pdf, spark=spark).explode("a").explode("a").to_pandas()
    assert list(got["a"]) == list(want["a"])
    assert list(got["b"]) == list(want["b"])
    assert got.index.tolist() == want.index.tolist()


def test_frame_triple_explode(spark):
    pdf = pd.DataFrame({"a": [[[[1], [2]]], [[[3, 4]]]]})
    want = pdf.explode("a").explode("a").explode("a")
    got = (
        DataFrame(pdf, spark=spark).explode("a").explode("a").explode("a").to_pandas()
    )
    assert list(got["a"]) == list(want["a"])
    assert got.index.tolist() == want.index.tolist()


def test_series_chained_explode(spark):
    want = pd.Series([[[1, 2], [3]], [[4]]]).explode().explode()
    got = Series([[[1, 2], [3]], [[4]]], spark=spark).explode().explode().to_pandas()
    assert got.tolist() == want.tolist()
    assert got.index.tolist() == want.index.tolist()


def test_series_chained_repeat(spark):
    want = pd.Series([1, 2]).repeat(2).repeat(2)
    got = Series([1, 2], spark=spark).repeat(2).repeat(2).to_pandas()
    assert got.tolist() == want.tolist()
    assert got.index.tolist() == want.index.tolist()


def test_series_explode_then_repeat(spark):
    want = pd.Series([[1, 2], [3]]).explode().repeat(2)
    got = Series([[1, 2], [3]], spark=spark).explode().repeat(2).to_pandas()
    assert [str(x) for x in got.tolist()] == [str(x) for x in want.tolist()]
    assert got.index.tolist() == want.index.tolist()


# -- 2. asfreq sub-second anchor + duplicate index -----------------------------


def test_asfreq_subsecond_anchor_series(spark):
    idx = pd.to_datetime(
        [
            "2024-01-01 00:00:00.500",
            "2024-01-01 00:01:00.500",
            "2024-01-01 00:02:00.500",
        ]
    )
    want = pd.Series([1.0, 2.0, 3.0], index=idx).asfreq("1min")
    got = Series([1.0, 2.0, 3.0], index=idx, spark=spark).asfreq("1min").to_pandas()
    assert got.tolist() == want.tolist()
    assert got.index.tolist() == want.index.tolist()


def test_asfreq_subsecond_ffill_series(spark):
    idx = pd.to_datetime(["2024-01-01 00:00:00.250", "2024-01-01 00:03:00.250"])
    want = pd.Series([1.0, 2.0], index=idx).asfreq("1min", method="ffill")
    got = (
        Series([1.0, 2.0], index=idx, spark=spark)
        .asfreq("1min", method="ffill")
        .to_pandas()
    )
    assert got.tolist() == want.tolist()
    assert got.index.tolist() == want.index.tolist()


def test_asfreq_subsecond_frame_bfill(spark):
    idx = pd.to_datetime(["2024-01-01 00:00:00.250", "2024-01-01 00:03:00.250"])
    pdf = pd.DataFrame({"x": [1.0, 2.0], "y": [10.0, 20.0]}, index=idx)
    want = pdf.asfreq("1min", method="bfill")
    got = DataFrame(pdf, spark=spark).asfreq("1min", method="bfill").to_pandas()
    assert got.index.tolist() == want.index.tolist()
    assert [str(v) for v in got["y"].tolist()] == [str(v) for v in want["y"].tolist()]


def test_asfreq_duplicate_index_raises(spark):
    dup = pd.to_datetime(["2024-01-01", "2024-01-01"])
    with pytest.raises(Exception, match="duplicate labels"):
        Series([1.0, 2.0], index=dup, spark=spark).asfreq("1D").to_pandas()
    with pytest.raises(Exception, match="duplicate labels"):
        DataFrame(pd.DataFrame({"x": [1.0, 2.0]}, index=dup), spark=spark).asfreq(
            "1D"
        ).to_pandas()


def test_asfreq_method_wins_over_fill_value(spark):
    # pandas 2.2: asfreq(method=, fill_value=) does NOT raise; the in-range
    # grid leaves method no gap for fill_value to touch
    idx = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:03:00"])
    want = pd.Series([1.0, 2.0], index=idx).asfreq("1min", method="ffill", fill_value=0)
    got = (
        Series([1.0, 2.0], index=idx, spark=spark)
        .asfreq("1min", method="ffill", fill_value=0)
        .to_pandas()
    )
    assert got.tolist() == want.tolist()


# -- 3. aligned binop sorted-union order ---------------------------------------


def _chk_add(spark, pl, pr, gl, gr, msg):
    want = pl + pr
    got = (gl + gr).to_pandas()
    assert [str(x) for x in got.index.tolist()] == [
        str(x) for x in want.index.tolist()
    ], msg
    assert [str(x) for x in got.tolist()] == [str(x) for x in want.tolist()], msg


def test_aligned_binop_new_labels_resort(spark):
    pl = pd.Series([5.0, 1.0, 3.0], index=[10, 20, 30]).sort_values()
    pr = pd.Series([1.0, 1.0, 1.0, 1.0], index=[10, 20, 30, 40])
    gl = Series([5.0, 1.0, 3.0], index=[10, 20, 30], spark=spark).sort_values()
    gr = Series([1.0, 1.0, 1.0, 1.0], index=[10, 20, 30, 40], spark=spark)
    _chk_add(spark, pl, pr, gl, gr, "new right-only labels → sorted union")


def test_aligned_binop_left_only_labels_resort(spark):
    pl = pd.Series([5.0, 1.0, 3.0], index=[10, 20, 30]).sort_values()
    pr = pd.Series([1.0, 1.0], index=[20, 30])
    gl = Series([5.0, 1.0, 3.0], index=[10, 20, 30], spark=spark).sort_values()
    gr = Series([1.0, 1.0], index=[20, 30], spark=spark)
    _chk_add(spark, pl, pr, gl, gr, "left-only labels → sorted union")


def test_aligned_binop_identical_index_keeps_left_order(spark):
    # both sides carry a REAL visible order ([20,30,10] via sort_values);
    # identical sequences → pandas preserves that order. (A fresh right
    # operand has index order under the documented construction
    # deviation, so that shape takes the sorted-union path instead —
    # pinned in test_aligned_binop_fresh_right_resorts.)
    pl = pd.Series([5.0, 1.0, 3.0], index=[10, 20, 30]).sort_values()  # [20,30,10]
    pr = pd.Series([9.0, 1.0, 5.0], index=[10, 20, 30]).sort_values()  # [20,30,10]
    gl = Series([5.0, 1.0, 3.0], index=[10, 20, 30], spark=spark).sort_values()
    gr = Series([9.0, 1.0, 5.0], index=[10, 20, 30], spark=spark).sort_values()
    _chk_add(spark, pl, pr, gl, gr, "identical index sequence → left order")


def test_aligned_binop_fresh_right_resorts(spark):
    # right side with NO visible order (fresh = index order): pandas
    # preserves left order only for identical sequences, which would force
    # the left to be index-ordered too — so the sorted union is always
    # correct here (r11 probe 3)
    pl = pd.Series([5.0, 1.0, 3.0, 7.0], index=[10, 20, 30, 40]).sort_values()
    pr = pd.Series([9.0, 9.0, 9.0, 9.0], index=[10, 20, 30, 40])
    gl = Series([5.0, 1.0, 3.0, 7.0], index=[10, 20, 30, 40], spark=spark).sort_values()
    gr = Series([9.0, 9.0, 9.0, 9.0], index=[10, 20, 30, 40], spark=spark)
    _chk_add(spark, pl, pr, gl, gr, "fresh right → sorted union")


def test_aligned_binop_desc_left_overlap_resorts(spark):
    pl = pd.Series([1.0, 2.0, 3.0, 4.0], index=[10, 20, 30, 40]).sort_index(
        ascending=False
    )
    pr = pd.Series([1.0, 1.0, 1.0, 1.0], index=[20, 30, 40, 50])
    gl = Series(
        [1.0, 2.0, 3.0, 4.0], index=[10, 20, 30, 40], spark=spark
    ).sort_index(ascending=False)
    gr = Series([1.0, 1.0, 1.0, 1.0], index=[20, 30, 40, 50], spark=spark)
    _chk_add(spark, pl, pr, gl, gr, "desc left + overlap → sorted union")


# -- 4. grouped ewm (name, asc) pair filtering ---------------------------------


@pytest.mark.parametrize("ascending", [True, False])
def test_grouped_ewm_respects_sorted_frame_order(spark, ascending):
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "a"],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
            "s": [5, 4, 3, 2, 1],
        }
    )
    want = (
        pdf.sort_values("s", ascending=ascending)
        .groupby("k")["v"]
        .ewm(alpha=0.5)
        .mean()
    )
    got = (
        DataFrame(pdf, spark=spark)
        .sort_values("s", ascending=ascending)
        .groupby("k")["v"]
        .ewm(alpha=0.5)
        .mean()
        .to_pandas()
    )
    w = {i: v for (_, i), v in want.items()}
    g = dict(zip(got.index.tolist(), got.tolist()))
    assert set(w) == set(g)
    assert all(abs(w[i] - g[i]) < 1e-12 for i in w), (w, g)


def test_aligned_binop_chains(spark):
    # chained alignments must not collide on the order-helper column
    # (the '__epos__' collision class; found by self-review in r11)
    pl = pd.Series([5.0, 1.0, 3.0], index=[10, 20, 30]).sort_values()
    pr = pd.Series([1.0] * 4, index=[10, 20, 30, 40])
    p3 = pd.Series([2.0] * 5, index=[10, 20, 30, 40, 50])
    gl = Series([5.0, 1.0, 3.0], index=[10, 20, 30], spark=spark).sort_values()
    gr = Series([1.0] * 4, index=[10, 20, 30, 40], spark=spark)
    g3 = Series([2.0] * 5, index=[10, 20, 30, 40, 50], spark=spark)
    want = ((pl + pr) + p3) - pr
    got = (((gl + gr) + g3) - gr).to_pandas()
    assert got.index.tolist() == want.index.tolist()
    assert [str(x) for x in got.tolist()] == [str(x) for x in want.tolist()]
