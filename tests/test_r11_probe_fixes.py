"""Round-11 probe-batch fixes, pinned.

1. Python named-group regex syntax ``(?P<name>...)`` (and the backref
   ``(?P=name)``) is rewritten to Java's ``(?<name>`` / ``\\k<name>``
   before reaching the JVM — pandas patterns use the Python spelling and
   Spark's regex engine rejects it with INVALID_PARAMETER_VALUE.PATTERN.
2. groupby by an INDEX LEVEL name (single index or MultiIndex level)
   works like pandas: the level is exposed as a hidden shadow column for
   grouping and never leaks into row-aligned outputs.
"""
from __future__ import annotations

import pandas as pd
import pytest

from pontem_spark.core import DataFrame, Series


# -- 1. named-group regex ------------------------------------------------------


def test_extract_named_groups(spark):
    vals = ["alpha-10", "beta-7", None, "gamma-3"]
    got = (
        Series(vals, spark=spark)
        .str.extract(r"(?P<name>[a-z]+)-(?P<num>\d+)")
        .to_pandas()
    )
    want = pd.Series(vals).str.extract(r"(?P<name>[a-z]+)-(?P<num>\d+)")
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert [str(x) for x in got[c].fillna("NA")] == [
            str(x) for x in want[c].fillna("NA")
        ]


def test_contains_named_group_and_backref(spark):
    got = Series(["aa", "ab"], spark=spark).str.contains(r"(?P<c>a)(?P=c)")
    want = pd.Series(["aa", "ab"]).str.contains(r"(?P<c>a)(?P=c)")
    assert got.to_pandas().tolist() == want.tolist()


def test_replace_named_group(spark):
    got = (
        Series(["x1y", "x22y"], spark=spark)
        .str.replace(r"(?P<d>\d+)", "#")
        .to_pandas()
        .tolist()
    )
    want = pd.Series(["x1y", "x22y"]).str.replace(r"(?P<d>\d+)", "#", regex=True).tolist()
    assert got == want


def test_findall_named_group(spark):
    got = Series(["a1b2", "c3"], spark=spark).str.findall(r"(?P<d>\d)").to_pandas()
    want = pd.Series(["a1b2", "c3"]).str.findall(r"(?P<d>\d)")
    assert [list(x) for x in got] == [list(x) for x in want]


# -- 2. index-level groupby keys -----------------------------------------------


@pytest.fixture()
def mi_frames():
    pdf = pd.DataFrame(
        {
            "a": ["x", "y", "x", "z", "y"],
            "b": [3, 1, 2, 1, 2],
            "v": [1.0, 2.0, None, 4.0, 5.0],
        }
    )
    return pdf


def test_groupby_multiindex_level_agg(spark, mi_frames):
    pdf = mi_frames
    got = (
        DataFrame(pdf, spark=spark)
        .set_index(["a", "b"])
        .groupby("a")
        .agg({"v": "sum"})
        .sort_index()
        .to_pandas()
    )
    want = pdf.set_index(["a", "b"]).groupby("a").agg({"v": "sum"}).sort_index()
    assert got.index.tolist() == want.index.tolist()
    assert got["v"].tolist() == want["v"].tolist()


def test_groupby_single_index_level_agg(spark, mi_frames):
    pdf = mi_frames
    got = (
        DataFrame(pdf, spark=spark)
        .set_index("a")
        .groupby("a")
        .agg({"v": "mean"})
        .sort_index()
        .to_pandas()
    )
    want = pdf.set_index("a").groupby("a").agg({"v": "mean"}).sort_index()
    assert got.index.tolist() == want.index.tolist()
    assert [str(x) for x in got["v"]] == [str(x) for x in want["v"]]


def test_groupby_level_transform_no_leak(spark, mi_frames):
    pdf = mi_frames
    got = (
        DataFrame(pdf, spark=spark)
        .set_index(["a", "b"])
        .groupby("a")
        .transform({"v": "mean"})
        .to_pandas()
        .sort_index()
    )
    want = pdf.set_index(["a", "b"])
    want = want.assign(v=want.groupby("a")["v"].transform("mean")).sort_index()
    assert list(got.columns) == list(want.columns)
    assert [str(x) for x in got["v"]] == [str(x) for x in want["v"]]


def test_groupby_level_series_transform(spark, mi_frames):
    pdf = mi_frames
    got = (
        DataFrame(pdf, spark=spark)
        .set_index(["a", "b"])
        .groupby("a")["v"]
        .transform("max")
        .to_pandas()
        .sort_index()
    )
    want = pdf.set_index(["a", "b"]).groupby("a")["v"].transform("max").sort_index()
    assert [str(x) for x in got.tolist()] == [str(x) for x in want.tolist()]


def test_groupby_level_head_no_leak(spark, mi_frames):
    pdf = mi_frames
    got = (
        DataFrame(pdf, spark=spark).set_index(["a", "b"]).groupby("a").head(1).to_pandas()
    )
    want = pdf.set_index(["a", "b"]).groupby("a").head(1)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)


def test_groupby_unknown_key_still_raises(spark, mi_frames):
    with pytest.raises(KeyError):
        DataFrame(mi_frames, spark=spark).set_index("a").groupby("nope").agg(
            {"v": "sum"}
        )
