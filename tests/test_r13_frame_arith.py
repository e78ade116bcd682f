"""Round-13 frame-vs-frame / frame-vs-series elementwise arithmetic.

pandas aligns BOTH axes for df ⊕ df: columns by name (sorted union when
the sets differ, one-sided columns become NaN) and rows by index. df ⊕
series broadcasts along axis='columns' (the metadata axis). Same-anchor
frames compose column-wise with zero joins; cross-anchor frames take ONE
full-outer index join with the Series aligner's lazy Index.equals order
stat. Comparisons follow pandas 2.2 as MEASURED in r14: the DUNDER
comparisons require identically-labeled operands (frame-vs-frame raises
'Can only compare identically-labeled (both index and columns) DataFrame
objects' — eagerly for column labels, lazily in-plan for row labels —
and frame-vs-series raises 'Operands are not aligned'); the NAMED
comparisons (eq/ne/lt/le/gt/ge) ALIGN both axes like arithmetic.
Missing compares False (ne True).
"""

from __future__ import annotations

import pandas as pd
import pytest

from pontem_spark.core import DataFrame as PFrame, Series


def _eq(eres, pres):
    g = eres.to_pandas()
    pd.testing.assert_frame_equal(g, pres, check_dtype=False, check_exact=False, rtol=1e-9)


DATA = {"x": [1.0, 2.0, 3.0], "y": [4.0, None, 6.0]}
IDX = [3, 1, 2]  # non-monotonic: exercises the order stat


def test_frame_frame_same_anchor(spark):
    pf = pd.DataFrame(DATA, index=IDX)
    ef = PFrame(DATA, index=IDX, spark=spark)
    _eq(ef + ef, pf + pf)
    _eq(ef * ef, pf * pf)
    _eq(ef.eq(ef), pf.eq(pf))
    _eq(ef.ne(ef), pf.ne(pf))


def test_frame_frame_cross_anchor_identical_labels(spark):
    pf = pd.DataFrame(DATA, index=IDX)
    ef = PFrame(DATA, index=IDX, spark=spark)
    pf2 = pd.DataFrame({"x": [10.0, 20.0, 30.0], "y": [1.0, 2.0, 3.0]}, index=IDX)
    ef2 = PFrame({"x": [10.0, 20.0, 30.0], "y": [1.0, 2.0, 3.0]}, index=IDX, spark=spark)
    _eq(ef + ef2, pf + pf2)  # non-monotonic order survives (Index.equals stat)
    _eq(ef / ef2, pf / pf2)


def test_frame_frame_union_columns_and_labels(spark):
    pf = pd.DataFrame(DATA, index=IDX)
    ef = PFrame(DATA, index=IDX, spark=spark)
    pf3 = pd.DataFrame({"x": [10.0], "z": [5.0]}, index=[1])
    ef3 = PFrame({"x": [10.0], "z": [5.0]}, index=[1], spark=spark)
    _eq(ef + ef3, pf + pf3)  # sorted union columns, NaN one-siders


def test_frame_frame_comparison_requires_identical_columns(spark):
    """r14 correction: pandas' NAMED comparisons ALIGN (outer union both
    axes, missing -> False); only the DUNDER comparisons require
    identically-labeled operands (measured, pandas 2.2.2)."""
    pf = pd.DataFrame(DATA, index=IDX)
    ef = PFrame(DATA, index=IDX, spark=spark)
    pf3 = pd.DataFrame({"x": [10.0], "z": [5.0]}, index=[1])
    ef3 = PFrame({"x": [10.0], "z": [5.0]}, index=[1], spark=spark)
    with pytest.raises(ValueError, match="identically-labeled"):
        ef > ef3
    _eq(ef.gt(ef3), pf.gt(pf3))
    _eq(ef.ne(ef3), pf.ne(pf3))


def test_frame_series_broadcast(spark):
    pf = pd.DataFrame(DATA, index=IDX)
    ef = PFrame(DATA, index=IDX, spark=spark)
    ps = pd.Series({"x": 1.0, "y": 2.0})
    es = Series([1.0, 2.0], index=["x", "y"], spark=spark)
    _eq(ef + es, pf + ps)
    _eq(ef - es, pf - ps)
    _eq(ef > es, pf > ps)
    # union when label sets differ
    ps2 = pd.Series({"x": 1.0, "z": 3.0})
    es2 = Series([1.0, 3.0], index=["x", "z"], spark=spark)
    _eq(ef + es2, pf + ps2)
    # r14 correction: only the DUNDER comparison raises on label
    # mismatch; the named form aligns (measured, pandas 2.2.2)
    with pytest.raises(ValueError, match="not aligned"):
        ef > es2
    _eq(ef.gt(es2), pf.gt(ps2))


def test_series_frame_reflected(spark):
    pf = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0]})
    ef = PFrame({"x": [1.0, 2.0], "y": [3.0, 4.0]}, spark=spark)
    ps = pd.Series({"x": 1.0, "y": 1.0})
    es = Series([1.0, 1.0], index=["x", "y"], spark=spark)
    _eq(es - ef, ps - pf)
    _eq(es + ef, ps + pf)
    _eq(es > ef, ps > pf)


def test_bool_frame_arithmetic_numpy_semantics(spark):
    pb = pd.DataFrame({"a": [True, False], "b": [False, True]})
    eb = PFrame({"a": [True, False], "b": [False, True]}, spark=spark)
    _eq(eb + eb, pb + pb)  # numpy bool add = OR
    _eq(eb * eb, pb * pb)  # numpy bool mul = AND
    with pytest.raises(TypeError, match="boolean subtract"):
        eb - eb
    _eq(eb * 2, pb * 2)  # scalar upcasts to int
    _eq(eb + 1.5, pb + 1.5)
    _eq(eb > 0, pb > 0)  # comparison upcasts too ((df>0)>0 chains)


def test_named_methods_fill_value(spark):
    pf = pd.DataFrame({"x": [1.0, None, 3.0], "y": [4.0, 5.0, None]}, index=[3, 1, 2])
    ef = PFrame({"x": [1.0, None, 3.0], "y": [4.0, 5.0, None]}, index=[3, 1, 2], spark=spark)
    pf3 = pd.DataFrame({"x": [10.0, None], "z": [5.0, 6.0]}, index=[1, 9])
    ef3 = PFrame({"x": [10.0, None], "z": [5.0, 6.0]}, index=[1, 9], spark=spark)
    _eq(ef.add(ef3, fill_value=0), pf.add(pf3, fill_value=0))
    _eq(ef.sub(ef3, fill_value=1), pf.sub(pf3, fill_value=1))
    _eq(ef.add(ef, fill_value=0), pf.add(pf, fill_value=0))  # same-anchor
    _eq(ef.add(2, fill_value=0), pf.add(2, fill_value=0))  # scalar
    _eq(ef.rdiv(ef3, fill_value=2), pf.rdiv(pf3, fill_value=2))


def test_all_missing_ctor_column_is_double(spark):
    """An all-None ctor column must arrive as double (NaN), not Spark
    NullType — 'void' breaks every downstream op (r13 probe seed 104)."""
    ef = PFrame({"a": [1.0, None, 2.0], "b": [None, None, None]}, spark=spark)
    assert dict(ef._materialized().dtypes)["b"] == "double"
    pf = pd.DataFrame({"a": [1.0, None, 2.0], "b": [None, None, None]}, dtype="float64")
    _eq((ef - (ef * 0 + 1)) > 0, (pf - (pf * 0 + 1)) > 0)
    from pontem_spark.core import Series

    es = Series([None, None], index=[1, 2], spark=spark)
    assert str(es.fillna(0.0).to_pandas().dtype) == "float64"


def test_scalar_frame_still_works(spark):
    pf = pd.DataFrame(DATA, index=IDX)
    ef = PFrame(DATA, index=IDX, spark=spark)
    _eq(ef + 1, pf + 1)
    _eq(10 - ef, 10 - pf)
    _eq(ef > 2, pf > 2)
