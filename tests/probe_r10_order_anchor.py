"""Round-10 probe batch: the two open bug classes from SCALE.md r9 notes.

(a) "plan order overridden at materialization / derived-expression
    rebinding": every sorted-output op must keep its row order BOTH
    across a materialization boundary AND through a derived expression
    (vc * -1 style — the r10 ADVICE bug class: an order_spec keyed on the
    rebindable value alias re-sorts by the DERIVED expression). Swept
    here: sort_values, nlargest/nsmallest, value_counts (series/frame/
    grouped), negative-step slicing, head-after-sort, concat of sorted
    blocks, droplevel/xs after sort.
(b) resample anchor edges: non-day-dividing freqs ('2d', '7min', '90min',
    '45s', '5h') over sub-second-resolution timestamps, several seeds,
    all agg families — pandas anchors at midnight of the first day.
(c) astype error-semantics edges (raise-vs-value parity documented in
    SCALE.md).

Randomized differential vs pandas (probe-then-pin cadence). NOT collected
by pytest (no test_ prefix); run manually:

    python tests/probe_r10_order_anchor.py [seed ...]

Any divergence found here gets a PINNED differential in
tests/test_series_pandas.py / tests/test_frame_pandas.py, or a documented
deviation in SCALE.md.
"""
from __future__ import annotations

import random
import sys

import numpy as np
import pandas as pd

from pontem_spark.core.frame import DataFrame
from pontem_spark.core.series import Series
from pontem_spark.session import get_spark

FAILS: list[str] = []


def check(label: str, got, want) -> None:
    gv = list(got.values) if hasattr(got, "values") else list(got)
    wv = list(want.values) if hasattr(want, "values") else list(want)
    gi = list(got.index) if hasattr(got, "index") else None
    wi = list(want.index) if hasattr(want, "index") else None

    def eq(a, b):
        an = a is None or (isinstance(a, float) and np.isnan(a))
        bn = b is None or (isinstance(b, float) and np.isnan(b))
        if an or bn:
            return an == bn
        if isinstance(a, float) or isinstance(b, float):
            return abs(float(a) - float(b)) < 1e-9
        return a == b

    ok = len(gv) == len(wv) and all(eq(a, b) for a, b in zip(gv, wv))
    if ok and gi is not None:
        ok = all(eq(a, b) for a, b in zip(gi, wi))
    if not ok:
        FAILS.append(label)
        print(f"FAIL {label}\n  got  {gv[:8]} idx {None if gi is None else gi[:8]}"
              f"\n  want {wv[:8]} idx {None if wi is None else wi[:8]}")
    else:
        print(f"ok   {label}")


def canon_sort(w: pd.Series, ascending: bool = True, na_position: str = "last") -> pd.Series:
    """pandas result re-keyed with the ENGINE's documented deterministic
    tie-break (missing block and equal values order by INDEX, not pandas'
    positional order — deviation-by-design, see sort_values docstring).
    Value-order bugs still surface; only tie ambiguity is canonicalized."""
    kf = pd.DataFrame(
        {"m": w.isna().values, "v": w.fillna(0.0).values, "i": list(w.index)},
        index=w.index,
    )
    kf = kf.sort_values(
        ["m", "v", "i"],
        ascending=[na_position == "last", ascending, True],
        kind="stable",
    )
    return w.loc[kf.index]


def probe_order(spark, seed: int) -> None:
    rng = random.Random(seed)
    n = 40
    vals = [
        rng.choice([None, float("nan")]) if rng.random() < 0.12
        else round(rng.uniform(-5, 5), 1)
        for _ in range(n)
    ]
    idx = list(range(n))
    rng.shuffle(idx)
    w = pd.Series(vals, index=idx, dtype="float64")
    s = Series(vals, index=idx, spark=spark)

    # derived-after-sort family: op(...) then a rebinding expression
    for label, sp, pdx in [
        ("sort_values asc", s.sort_values(), canon_sort(w)),
        ("sort_values desc", s.sort_values(ascending=False), canon_sort(w, ascending=False)),
        ("sort_values na_first", s.sort_values(na_position="first"), canon_sort(w, na_position="first")),
        ("nlargest", s.nlargest(7), canon_sort(w, ascending=False).dropna().head(7)),
        ("nsmallest", s.nsmallest(7), canon_sort(w).dropna().head(7)),
        # positional slicing counts over the engine's VISIBLE order (the
        # order_spec; index order for a fresh series) — pandas' positional
        # insertion order is not reproducible distributed, so the
        # expectation is index-ordered pandas (documented stance,
        # series.py __getitem__ docstring)
        ("slice neg step", s[::-2], w.sort_index().iloc[::-2]),
        ("slice rev then take", s[::-1][:5], w.sort_index().iloc[::-1][:5]),
    ]:
        check(f"seed{seed} {label} direct", sp.to_pandas(), pdx)
        check(f"seed{seed} {label} *2", (sp * 2).to_pandas(), pdx * 2)
        check(f"seed{seed} {label} round", sp.round(0).to_pandas(), pdx.round(0))
        check(f"seed{seed} {label} cmp", (sp > 0).to_pandas(), pdx > 0)
        check(f"seed{seed} {label} head", (sp * 2).head(4).to_pandas(), (pdx * 2).head(4))

    # value_counts family (r10 ADVICE regression class). Count ties break
    # by LABEL in the engine (documented — pandas' first-appearance order
    # is positional): canonicalize pandas' tie order the same way.
    vc_s = s.round(0).value_counts()
    vc_w = w.round(0).value_counts().sort_index().sort_values(ascending=False, kind="stable")
    check(f"seed{seed} vc *-1", (vc_s * -1).to_pandas(), vc_w * -1)
    check(f"seed{seed} vc cumsum-style chain", (vc_s * 2 + 1).to_pandas(), vc_w * 2 + 1)

    # frame family
    cols = {
        "a": [rng.randint(0, 5) for _ in range(n)],
        "b": [round(rng.uniform(-3, 3), 1) for _ in range(n)],
    }
    wf = pd.DataFrame(cols, index=idx)
    df = DataFrame(cols, index=idx, spark=spark)
    fs = df.sort_values("b")
    wsorted = wf.loc[canon_sort(wf["b"]).index]
    check(f"seed{seed} frame sort direct", fs.to_pandas()["b"], wsorted["b"])
    check(f"seed{seed} frame sort derived col", (fs["b"] * 3).to_pandas(), wsorted["b"] * 3)
    check(f"seed{seed} frame sort nonmono derived", (fs["b"] > 0).to_pandas(), wsorted["b"] > 0)
    fset = df.sort_values("b")
    fset["b"] = fset["b"] > 0
    wset = wsorted.copy()
    wset["b"] = wset["b"] > 0
    check(f"seed{seed} frame setitem after sort", fset.to_pandas()["a"], wset["a"])
    fnl = df.nlargest(6, "b")
    wnl = wf.loc[canon_sort(wf["b"], ascending=False).index].head(6)
    check(f"seed{seed} frame nlargest nonmono derived", (fnl["b"] < 0).to_pandas(), wnl["b"] < 0)
    wvc = (
        wf.value_counts().reset_index(name="__n")
        .sort_values(["__n", "a", "b"], ascending=[False, True, True])
        .set_index(["a", "b"])["__n"]
    )
    check(f"seed{seed} frame vc *-1", (df.value_counts() * -1).to_pandas(), wvc * -1)
    g = df.groupby("a")["b"]
    pg = wf.groupby("a")["b"]
    pgvc = (
        pg.value_counts().reset_index(name="__n")
        .sort_values(["a", "__n", "b"], ascending=[True, False, True])
        .set_index(["a", "b"])["__n"]
    )
    check(f"seed{seed} grouped vc *-1", (g.value_counts() * -1).to_pandas(), pgvc * -1)

    # concat of sorted blocks keeps per-block order (r9 mono-id fix) even
    # through a derived expression
    from pontem_spark.core.frame import concat

    s1, w1 = s.sort_values(), canon_sort(w)
    s2, w2 = s.sort_values(ascending=False), canon_sort(w, ascending=False)
    check(
        f"seed{seed} concat sorted derived",
        (concat([s1, s2]) * 2).to_pandas(),
        pd.concat([w1, w2]) * 2,
    )


def probe_resample(spark, seed: int) -> None:
    rng = random.Random(seed)
    n = 60
    base = pd.Timestamp("2021-03-04 00:00:00")
    stamps = sorted(
        base
        + pd.Timedelta(seconds=rng.randint(0, 9 * 86400))
        + pd.Timedelta(microseconds=rng.randint(0, 999_999))
        for _ in range(n)
    )
    vals = [
        float("nan") if rng.random() < 0.1 else round(rng.uniform(-10, 10), 2)
        for _ in range(n)
    ]
    w = pd.Series(vals, index=stamps)
    s = Series(vals, index=stamps, spark=spark)
    for rule in ["2d", "3d", "7min", "90min", "45s", "5h", "7h"]:
        for aggn in ["mean", "sum", "count", "min", "max"]:
            if rule == "45s" and aggn not in ("count", "mean"):
                continue  # ~17k buckets; two aggs are plenty
            got = getattr(s.resample(rule), aggn)().to_pandas().sort_index()
            want = getattr(w.resample(rule), aggn)()
            ok = [str(k) for k in got.index] == [str(k) for k in want.index]
            if ok:
                for a, b in zip(got.tolist(), want.tolist()):
                    an = pd.isna(a)
                    if an != pd.isna(b) or (not an and abs(float(a) - float(b)) > 1e-9):
                        ok = False
                        break
            if not ok:
                FAILS.append(f"seed{seed} resample {rule} {aggn}")
                print(f"FAIL seed{seed} resample {rule} {aggn}")
                print("  got ", got.head(4).to_dict())
                print("  want", want.head(4).to_dict())
            else:
                print(f"ok   seed{seed} resample {rule} {aggn}")


def probe_astype(spark) -> None:
    """Raise-vs-value parity on conversion edges. Only REPORTS — the
    deviations-by-design list lives in SCALE.md."""
    cases = [
        ("float nan -> int", [1.5, float("nan")], "int64"),
        ("float inf -> int", [1.5, float("inf")], "int64"),
        ("str non-numeric -> float", ["1.5", "abc"], "float64"),
        ("str non-numeric -> int", ["15", "1.5"], "int64"),
        ("big float -> int32 overflow", [3e10], "int32"),
        ("neg float -> int trunc", [-1.7, 2.7], "int64"),
        ("bool str empty", ["", "x"], "bool"),
    ]
    # deviations-by-design (SCALE.md r9 notes): int-cast of NaN keeps NA
    # instead of pandas' IntCastingNaNError; overflow raises under ANSI
    # instead of pandas' silent wrap. Raise-vs-raise with a different
    # exception TYPE is parity (both loud).
    documented = {"float nan -> int", "big float -> int32 overflow"}
    for label, data, dt in cases:
        try:
            want = repr(pd.Series(data).astype(dt).tolist())
        except Exception as ex:
            want = f"RAISE {type(ex).__name__}"
        try:
            got = repr(Series(data, spark=spark).astype(dt).to_pandas().tolist())
        except Exception as ex:
            got = f"RAISE {type(ex).__name__}"
        same = got == want or (got.startswith("RAISE") and want.startswith("RAISE"))
        mark = "ok  " if same else ("dev " if label in documented else "DIFF")
        if mark == "DIFF":
            FAILS.append(f"astype {label}")
        print(f"{mark} astype {label}: engine={got[:60]} pandas={want[:60]}")


def main() -> None:
    seeds = [int(a) for a in sys.argv[1:]] or [7, 23, 101]
    spark = get_spark(app_name="probe-r10", master="local[8]", shuffle_partitions=8)
    for seed in seeds:
        probe_order(spark, seed)
    probe_resample(spark, seeds[0])
    probe_astype(spark)
    print(f"\n{len(FAILS)} failures: {FAILS}")


if __name__ == "__main__":
    main()
