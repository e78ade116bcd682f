"""Property-based differentials (hypothesis): random inputs, pandas as the
oracle. Few examples per property — each example is a real Spark round-trip
— but the inputs cover corners example-based tests hard-code away (NaNs,
negatives, zero divisors, empty/degenerate slices)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

_finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
_vals = st.lists(st.one_of(_finite, st.just(float("nan"))), min_size=1, max_size=30)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _series(spark, data):
    from pontem_spark.core.series import Series

    return Series(data=data, spark=spark)


@pytest.mark.parametrize("op", ["add", "sub", "mul", "truediv"])
@given(data=_vals, scalar=_finite)
@settings(**_SETTINGS)
def test_scalar_arithmetic_matches_pandas(spark, op, data, scalar):
    import operator as _op

    fn = getattr(_op, op)
    got = fn(_series(spark, data), scalar).to_pandas().reset_index(drop=True)
    want = fn(pd.Series(data), scalar).reset_index(drop=True)
    for g, w in zip(got.tolist(), want.tolist()):
        if w is None or (isinstance(w, float) and math.isnan(w)):
            assert g is None or (isinstance(g, float) and math.isnan(g)), (g, w)
        elif math.isinf(w):  # pandas float div-by-zero → ±inf; Spark agrees
            assert g == w, (g, w)
        else:
            assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (g, w)


@given(
    data=st.lists(st.integers(-100, 100), min_size=1, max_size=25),
    start=st.one_of(st.none(), st.integers(-30, 30)),
    stop=st.one_of(st.none(), st.integers(-30, 30)),
    step=st.one_of(st.none(), st.integers(-5, 5).filter(lambda x: x != 0)),
)
@settings(**_SETTINGS)
def test_positional_slice_matches_pandas(spark, data, start, stop, step):
    got = (
        _series(spark, data)[slice(start, stop, step)]
        .to_pandas()
        .reset_index(drop=True)
    )
    want = pd.Series(data)[slice(start, stop, step)].reset_index(drop=True)
    assert got.tolist() == want.tolist()


@given(data=st.lists(_finite, min_size=8, max_size=60, unique=True))
@settings(**_SETTINGS)
def test_quantile_bins_partition_and_monotone(spark, data):
    """For ANY distinct-value distribution: every row gets a bucket in
    [0, q), and bucket ids are monotone in the value."""
    from pontem_spark.operators.binning import quantile_bins

    df = spark.createDataFrame([(i, v) for i, v in enumerate(data)], "id int, v double")
    out = quantile_bins(df, "v", q=4).toPandas().sort_values("v")
    assert out["bucket"].between(0, 3).all()
    assert (out["bucket"].diff().dropna() >= 0).all()


@given(
    strata=st.lists(st.sampled_from(["a", "b", "c"]), min_size=5, max_size=60),
)
@settings(**_SETTINGS)
def test_temperature_resample_deterministic_and_bounded(spark, strata):
    """For ANY stratum layout: the kept set is a subset, identical across
    runs, and the rarest stratum is kept whole."""
    from pontem_spark.operators.sampling import temperature_resample

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strata)], "id long, s string"
    )
    k1 = sorted(r["id"] for r in temperature_resample(df, "s", "id").collect())
    k2 = sorted(r["id"] for r in temperature_resample(df, "s", "id").collect())
    assert k1 == k2
    assert set(k1) <= set(range(len(strata)))
    counts = pd.Series(strata).value_counts()
    rarest = counts.idxmin()
    kept_rarest = sum(1 for i in k1 if strata[i] == rarest)
    assert kept_rarest == counts.min()


@given(
    idx1=st.lists(st.integers(-20, 20), min_size=1, max_size=15, unique=True),
    idx2=st.lists(st.integers(-20, 20), min_size=1, max_size=15, unique=True),
    op=st.sampled_from(["add", "sub", "mul", "truediv"]),
    data=st.data(),
)
@settings(**_SETTINGS)
def test_aligned_arithmetic_matches_pandas(spark, idx1, idx2, op, data):
    """Series⊕Series across different anchors: pandas index alignment
    (outer join, null-fill) for random overlapping/disjoint/unique index
    sets — fuzzes the _aligned_binop join path incl. zero divisors."""
    import operator as _op

    from pontem_spark.core.series import Series

    v1 = data.draw(
        st.lists(_finite, min_size=len(idx1), max_size=len(idx1)), label="v1"
    )
    v2 = data.draw(
        st.lists(_finite, min_size=len(idx2), max_size=len(idx2)), label="v2"
    )
    fn = getattr(_op, op)
    got = (
        fn(Series(data=v1, index=idx1, spark=spark), Series(data=v2, index=idx2, spark=spark))
        .to_pandas()
        .sort_index()
    )
    want = fn(pd.Series(v1, index=idx1), pd.Series(v2, index=idx2)).sort_index()
    assert list(got.index) == list(want.index)
    for g, w in zip(got.tolist(), want.tolist()):
        if w is None or (isinstance(w, float) and math.isnan(w)):
            assert g is None or (isinstance(g, float) and math.isnan(g)), (g, w)
        elif isinstance(w, float) and math.isinf(w):
            assert g == w, (g, w)
        else:
            assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (g, w)


# Cap at 0x17F (Latin Extended-A): Latin Extended-B (0x180-0x24F) contains
# letters whose UPPERCASE mapping was only added in Unicode 16 (e.g. U+019B
# "ƛ" → U+A7DC), so the JVM (newer tables) and CPython (Unicode 14 in 3.11)
# legitimately disagree — a Unicode-version skew, not an engine bug.
_texts = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Po"),
            whitelist_characters=" ",
            max_codepoint=0x17F,
        ),
        max_size=20,
    ),
    min_size=1,
    max_size=15,
)


@given(texts=_texts)
@settings(**_SETTINGS)
def test_str_accessor_matches_pandas(spark, texts):
    """upper/lower/len/strip/startswith/slice over random unicode text
    (latin + accents + digits + punctuation) vs pandas .str."""
    s = _series(spark, texts)
    p = pd.Series(texts)

    def eq(got, want):
        g = got.to_pandas().reset_index(drop=True)
        w = want.reset_index(drop=True)
        assert g.fillna("\0").tolist() == w.fillna("\0").tolist(), (g, w)

    eq(s.str.upper(), p.str.upper())
    eq(s.str.lower(), p.str.lower())
    eq(s.str.strip(), p.str.strip())
    eq(s.str.slice(1, 4), p.str.slice(1, 4))
    got_len = s.str.len().to_pandas().reset_index(drop=True)
    assert got_len.tolist() == p.str.len().tolist()
    got_sw = s.str.startswith("a").to_pandas().reset_index(drop=True)
    assert got_sw.tolist() == p.str.startswith("a").tolist()


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    weights=st.lists(st.integers(1, 100_000), min_size=40, max_size=40),
    k=st.integers(1, 10),
)
@settings(**_SETTINGS)
def test_weighted_sample_matches_python_replay(spark, ids, weights, k):
    """The A-ES race is content-deterministic: replay it exactly in Python
    (hashlib md5 == Spark md5) and the selected ids must be identical —
    across any weight magnitude (the collapsed-priority regression class)."""
    import hashlib

    from pontem_spark.operators.sampling import weighted_sample

    rows = [(i, float(w)) for i, w in zip(ids, weights[: len(ids)])]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r.id for r in weighted_sample(df, "id", "w", k=k).collect()]

    def h16(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[:4]
        return int(h, 16)

    keyed = sorted(
        ((math.log((h16(i) + 1) / 65537.0) / w, i) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )
    want = [i for _, i in keyed[:k]]
    assert got == want


@given(
    vals=st.lists(
        st.floats(min_value=-50.0, max_value=150.0, allow_nan=False), min_size=2, max_size=60
    ),
    q=st.floats(min_value=0.05, max_value=0.95),
)
@settings(**_SETTINGS)
def test_histogram_quantile_within_bin_width(spark, vals, q):
    """For any data and quantile, the histogram estimate sits within one bin
    width of numpy's inverted-CDF quantile (values clamp to the fixed
    range, so compare against the clamped data)."""
    import numpy as np

    from pontem_spark.operators.sketches import histogram_quantiles, histogram_state

    LO, HI, NB = 0.0, 100.0, 20
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    state = histogram_state(df, [], "v", LO, HI, NB)
    est = histogram_quantiles(state, [], {"p": q}, LO, HI, NB).collect()[0].p
    clamped = np.clip(np.array(vals), LO, HI)
    exact = float(np.quantile(clamped, q, method="inverted_cdf"))
    assert abs(est - exact) <= (HI - LO) / NB + 1e-9, (est, exact)


@given(
    data=st.lists(st.one_of(_finite, st.just(float("nan"))), min_size=1, max_size=20),
    lo=st.one_of(st.none(), _finite),
    hi=st.one_of(st.none(), _finite),
)
@settings(**_SETTINGS)
def test_clip_matches_pandas(spark, data, lo, hi):
    """clip keeps missing values missing — Spark's greatest/least skip
    nulls and order NaN above everything, which silently turned missing
    into the bound (found by this fuzz)."""
    got = _series(spark, data).clip(lo, hi).to_pandas().reset_index(drop=True)
    want = pd.Series(data).clip(lo, hi).reset_index(drop=True)
    for g, w in zip(got.tolist(), want.tolist()):
        if isinstance(w, float) and math.isnan(w):
            assert g is None or (isinstance(g, float) and math.isnan(g)), (g, w)
        else:
            assert g == w, (g, w)


@given(data=st.lists(st.one_of(_finite, st.just(float("nan"))), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_cumulative_ops_skipna_matches_pandas(spark, data):
    """cummax/cummin/cumsum with pandas skipna: missing positions stay
    missing, missing values never enter the running state (Spark's NaN
    sorts above every value and would poison a running max — found by this
    fuzz)."""
    p = pd.Series(data)
    for op in ("cummax", "cummin", "cumsum"):
        got = getattr(_series(spark, data), op)().to_pandas().reset_index(drop=True)
        want = getattr(p, op)().reset_index(drop=True)
        for g, w in zip(got.tolist(), want.tolist()):
            if isinstance(w, float) and math.isnan(w):
                assert g is None or (isinstance(g, float) and math.isnan(g)), (op, g, w)
            else:
                assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (op, g, w)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"),
                # '+-' so SIGNED strings — the classic zfill input, where
                # pandas keeps the sign first ('-1'.zfill(4) == '-001') —
                # are actually drawn (ADVICE r6: the old alphabet masked a
                # sign-unaware zfill)
                whitelist_characters=" +-",
                max_codepoint=0x7F,
            ),
            max_size=15,
        ),
        min_size=1,
        max_size=10,
    ),
    w=st.integers(0, 12),
)
@settings(**_SETTINGS)
def test_str_zfill_pad_never_truncate(spark, texts, w):
    """pandas pads but never truncates; Spark's lpad cuts longer strings
    down to the width (found by this fuzz: zfill(0) emptied every cell)."""
    s = _series(spark, texts)
    p = pd.Series(texts)
    got_z = s.str.zfill(w).to_pandas().reset_index(drop=True).tolist()
    assert got_z == p.str.zfill(w).tolist()
    got_p = s.str.pad(w).to_pandas().reset_index(drop=True).tolist()
    assert got_p == p.str.pad(w).tolist()


@given(
    texts=st.lists(st.text(alphabet="abc XY", max_size=12), min_size=1, max_size=8),
    a=st.integers(-8, 8),
    b=st.one_of(st.none(), st.integers(-8, 8)),
)
@settings(**_SETTINGS)
def test_str_slice_negative_bounds(spark, texts, a, b):
    """Full Python slice semantics incl. negative start/stop (the old
    positive-only substring form returned '' for any negative stop —
    found by this fuzz)."""
    got = _series(spark, texts).str.slice(a, b).to_pandas().reset_index(drop=True)
    want = pd.Series(texts).str.slice(a, b).reset_index(drop=True)
    assert got.fillna("\0").tolist() == want.fillna("\0").tolist()


# every Python-isspace character (what pandas' strip family removes), far
# beyond Spark trim's U+0020 and Java \s's ASCII subset
_PY_WS = (" \t\n\r\x0b\x0c\x1c\x1d\x1e\x1f\x85\xa0\u1680"
          "\u2000\u2005\u200a\u2028\u2029\u202f\u205f\u3000")

_ws_texts = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Po"),
            whitelist_characters=_PY_WS,
            max_codepoint=0x17F,
            # Python's titlecase mapping for U+00DF is 'Ss', per-char upper
            # gives 'SS' — the one documented divergence in str.title
            blacklist_characters="ß",
        ),
        max_size=16,
    ),
    min_size=1,
    max_size=10,
)


@given(texts=_ws_texts)
@settings(**_SETTINGS)
def test_str_strip_family_all_python_whitespace(spark, texts):
    """strip/lstrip/rstrip remove every Python-isspace character, exactly
    like pandas (Spark's trim removes only U+0020; this fuzz found the
    divergence and pins the _PY_SPACE regex-class fix)."""
    s = _series(spark, texts)
    p = pd.Series(texts)
    for name in ("strip", "lstrip", "rstrip"):
        got = getattr(s.str, name)().to_pandas().reset_index(drop=True)
        want = getattr(p.str, name)().reset_index(drop=True)
        assert got.fillna("\0").tolist() == want.fillna("\0").tolist(), name


@given(texts=_ws_texts)
@settings(**_SETTINGS)
def test_str_title_matches_python_semantics(spark, texts):
    """title breaks words on ANY non-cased character — digits, punctuation,
    every whitespace — and lowercases the rest of each word, like Python
    str.title ('foo-bar' -> 'Foo-Bar', '3rd' -> '3Rd'). initcap breaks only
    on whitespace and keeps mid-word capitals; this fuzz found both."""
    got = _series(spark, texts).str.title().to_pandas().reset_index(drop=True)
    want = pd.Series(texts).str.title().reset_index(drop=True)
    assert got.fillna("\0").tolist() == want.fillna("\0").tolist()


@given(texts=_ws_texts)
@settings(**_SETTINGS)
def test_str_split_noarg_matches_python(spark, texts):
    """No-arg str.split = Python str.split(): whitespace-run delimiter, no
    empty tokens, [] for empty/whitespace-only input (the regex form keeps
    '' edge tokens — found by probing, pinned here)."""
    got = _series(spark, texts).str.split().to_pandas().reset_index(drop=True)
    want = pd.Series(texts).str.split().reset_index(drop=True)
    g = [list(x) if x is not None else None for x in got.tolist()]
    assert g == want.tolist(), (g, want.tolist())


@given(data=_vals)
@settings(**_SETTINGS)
def test_nan_aware_methods_match_pandas(spark, data):
    """round (half-even, not Spark's half-up), between/isin (NaN -> False,
    not NULL), pct_change (pandas pads non-leading NaN before differencing),
    idxmax/idxmin (NaN can never be the arg-extreme; Spark sorts NaN as the
    largest double) and value_counts dropna — all found by probing and
    pinned here."""
    s = _series(spark, data)
    p = pd.Series(data)

    def eq_float(got, want):
        for g, w in zip(got.tolist(), want.tolist()):
            if w is None or (isinstance(w, float) and math.isnan(w)):
                assert g is None or (isinstance(g, float) and math.isnan(g)), (g, w)
            elif isinstance(w, float) and math.isinf(w):
                assert g == w, (g, w)
            else:
                assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (g, w)

    eq_float(s.round(0).to_pandas().reset_index(drop=True), p.round(0))
    eq_float(
        s.pct_change().to_pandas().reset_index(drop=True),
        # warning-free pad form (pandas 3 removes the fill_method keyword)
        p.ffill().pct_change(fill_method=None),
    )
    assert (
        s.between(-10, 10).to_pandas().reset_index(drop=True).tolist()
        == p.between(-10, 10).tolist()
    )
    probe = [v for v in data if not math.isnan(v)][:3]
    assert (
        s.isin(probe).to_pandas().reset_index(drop=True).tolist()
        == p.isin(probe).tolist()
    )
    vc_g = s.value_counts().to_pandas().sort_index()
    vc_w = p.value_counts().sort_index()
    assert vc_g.to_dict() == vc_w.to_dict()
    if any(not math.isnan(v) for v in data):
        assert s.idxmax() == p.idxmax()
        assert s.idxmin() == p.idxmin()
    else:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            s.idxmax()


@given(data=st.lists(st.one_of(_finite, st.just(float("nan"))), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_interpolate_linear_matches_pandas(spark, data):
    """Linear interpolate vs pandas under arbitrary NaN runs: interior
    runs fill linearly, leading stay NaN, trailing degrade to ffill
    (pandas' limit_direction='forward' default)."""
    got = _series(spark, data).interpolate().to_pandas().reset_index(drop=True)
    want = pd.Series(data).interpolate().reset_index(drop=True)
    for g, w in zip(got.tolist(), want.tolist()):
        if isinstance(w, float) and math.isnan(w):
            assert g is None or (isinstance(g, float) and math.isnan(g)), (g, w)
        else:
            assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (g, w, data)


@given(
    data=st.lists(st.one_of(_finite, st.just(float("nan"))), min_size=1, max_size=16),
    alpha=st.floats(min_value=0.05, max_value=0.95),
    adjust=st.booleans(),
    ignore_na=st.booleans(),
)
@settings(**_SETTINGS)
def test_ewm_mean_matches_pandas(spark, data, alpha, adjust, ignore_na):
    got = (
        _series(spark, data)
        .ewm(alpha=alpha, adjust=adjust, ignore_na=ignore_na)
        .mean()
        .to_pandas()
        .reset_index(drop=True)
    )
    want = pd.Series(data).ewm(alpha=alpha, adjust=adjust, ignore_na=ignore_na).mean().reset_index(drop=True)
    for g, w in zip(got.tolist(), want.tolist()):
        if isinstance(w, float) and math.isnan(w):
            assert g is None or (isinstance(g, float) and math.isnan(g)), (g, w)
        else:
            assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (g, w, data)


@given(texts=_texts, w=st.integers(0, 10))
@settings(**_SETTINGS)
def test_str_center_just_match_python(spark, texts, w):
    """CPython center's left-bias formula (marg//2 + (marg & width & 1))
    and the no-truncate ljust/rjust under arbitrary text and widths."""
    s = _series(spark, texts)
    p = pd.Series(texts)
    assert s.str.center(w, "*").to_pandas().reset_index(drop=True).tolist() == p.str.center(w, "*").tolist()
    assert s.str.ljust(w, "#").to_pandas().reset_index(drop=True).tolist() == p.str.ljust(w, "#").tolist()
    assert s.str.rjust(w, "#").to_pandas().reset_index(drop=True).tolist() == p.str.rjust(w, "#").tolist()


@pytest.mark.parametrize("seed", [3, 7, 11])
def test_grouped_surface_random_differential(spark, seed):
    """Randomized grouped-surface differential (r8 probe #8 pinned at
    three seeds): NaN/tie-laden random frames through aggregates,
    transforms, window ops, rank, and frame reductions, value-compared
    against pandas. The full 18-seed sweep ran divergence-free in r8;
    these seeds keep the surface honest per-commit."""
    import math

    import numpy as np

    from pontem_spark.core import DataFrame

    nan = float("nan")
    rng = np.random.RandomState(seed)
    n = rng.randint(8, 24)
    nk = rng.randint(2, 5)
    pdf = pd.DataFrame({
        "k": rng.choice([chr(97 + i) for i in range(nk)], n),
        "v": np.where(rng.rand(n) < 0.3, nan,
                      rng.randint(-3, 6, n).astype(float)),
    })
    f = DataFrame(pdf.to_dict("list"), spark=spark)
    sg, psg = f.groupby("k")["v"], pdf.groupby("k")["v"]

    def eq_series(tag, got, want):
        got, want = got.sort_index(), want.sort_index()
        assert len(got) == len(want), (tag, len(got), len(want))
        for g, w in zip(got.tolist(), want.tolist()):
            wn = isinstance(w, float) and math.isnan(w)
            gn = g is None or (isinstance(g, float) and math.isnan(g))
            assert gn == wn, (tag, g, w)
            if not wn:
                assert abs(g - w) <= 1e-8 * max(1.0, abs(w)), (tag, g, w)

    for how in ("sum", "mean", "std", "median", "count", "prod", "sem", "skew"):
        eq_series(f"agg.{how}", getattr(sg, how)().to_pandas(), getattr(psg, how)())
    for how in ("sum", "mean", "max"):
        eq_series(f"tr.{how}", sg.transform(how).to_pandas(), psg.transform(how))
    eq_series("shift", sg.shift(1).to_pandas(), psg.shift(1))
    eq_series("cumsum", sg.cumsum().to_pandas(), psg.cumsum())
    m = ["average", "min", "dense"][seed % 3]
    eq_series(f"rank.{m}", sg.rank(method=m).to_pandas(), psg.rank(method=m))
    eq_series("idxmax", sg.idxmax().to_pandas(), psg.idxmax())
    eq_series("roll2", sg.rolling(2).mean().to_pandas(),
              psg.rolling(2).mean().reset_index(level=0, drop=True))
