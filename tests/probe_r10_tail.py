"""Round-10 probe batch 6: missing-marker equivalence / keep variants /
agg naming / positional group picks.

Sweeps duplicated & drop_duplicates over MIXED None/NaN missing markers
(pandas treats them as one missing value; Spark's window partitionBy
separates NULL from NaN), frame drop_duplicates keep variants under the
same mix, groupby.agg naming for mixed str/list specs, groupby.nth with
negative n, Series.searchsorted randomized, between inclusive variants,
clip inverted/NaN bounds, value_counts normalize x dropna x ascending,
isin fed a Series/ndarray, unique() order, against pandas.

Randomized differential vs pandas (probe-then-pin cadence). NOT
collected by pytest (no test_ prefix); run manually:

    python tests/probe_r10_tail.py [seed ...]
"""
from __future__ import annotations

import math
import random
import sys

import numpy as np
import pandas as pd

from pontem_spark.core.frame import DataFrame
from pontem_spark.core.series import Series
from pontem_spark.session import get_spark

FAILS: list[str] = []


def close(a, b) -> bool:
    an = a is None or (isinstance(a, float) and math.isnan(a)) or (a is pd.NA)
    bn = b is None or (isinstance(b, float) and math.isnan(b)) or (b is pd.NA)
    try:
        an = an or bool(pd.isna(a))
        bn = bn or bool(pd.isna(b))
    except (TypeError, ValueError):
        pass
    if an or bn:
        return an == bn
    if isinstance(a, (int, float, np.floating, np.integer)) and isinstance(
        b, (int, float, np.floating, np.integer)
    ):
        fa, fb = float(a), float(b)
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        return abs(fa - fb) < 1e-9 * max(1.0, abs(fb))
    return a == b


def check(label: str, got, want, order: bool = True) -> None:
    gv = list(got.values) if hasattr(got, "values") else list(got)
    wv = list(want.values) if hasattr(want, "values") else list(want)
    if not order:
        gv, wv = sorted(gv, key=str), sorted(wv, key=str)
    ok = len(gv) == len(wv) and all(close(a, b) for a, b in zip(gv, wv))
    if ok and order and hasattr(got, "values") and hasattr(want, "values"):
        gi, wi = list(got.index), list(want.index)
        ok = len(gi) == len(wi) and all(close(a, b) for a, b in zip(gi, wi))
    if not ok:
        FAILS.append(label)
        print(f"FAIL {label}\n  got  {gv[:10]}\n  want {wv[:10]}")
    else:
        print(f"ok   {label}")


def mixed_vals(rng: random.Random, n: int) -> list:
    """Floats with duplicates and BOTH missing markers (None and nan)."""
    pool = [round(rng.uniform(-3, 3), 1) for _ in range(max(2, n // 3))]
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.12:
            out.append(None)
        elif r < 0.24:
            out.append(float("nan"))
        else:
            out.append(rng.choice(pool))
    return out


def probe_duplicated_mixed(spark, seed: int) -> None:
    rng = random.Random(seed)
    vals = mixed_vals(rng, 40)
    ps = pd.Series(vals, dtype="float64")
    ss = Series(vals, name="v")
    for keep in ("first", "last", False):
        check(f"dup_mixed[{seed},{keep}]", ss.duplicated(keep=keep).to_pandas(), ps.duplicated(keep=keep))
    check(f"drop_dup_mixed[{seed}]", ss.drop_duplicates().to_pandas(), ps.drop_duplicates())

    pdf = pd.DataFrame({"a": vals, "b": [rng.randint(0, 2) for _ in vals]})
    df = DataFrame({"a": vals, "b": list(pdf["b"])})
    for keep in ("first", "last", False):
        check(
            f"frame_dup_mixed[{seed},{keep}]",
            df.duplicated(subset=["a"], keep=keep).to_pandas(),
            pdf.duplicated(subset=["a"], keep=keep),
        )
        got = df.drop_duplicates(subset=["a"], keep=keep).to_pandas()
        want = pdf.drop_duplicates(subset=["a"], keep=keep)
        check(f"frame_drop_dup_mixed[{seed},{keep}]a", got["a"], want["a"])
        check(f"frame_drop_dup_mixed[{seed},{keep}]b", got["b"], want["b"])


def probe_agg_naming(spark, seed: int) -> None:
    rng = random.Random(seed)
    n = 30
    ks = [rng.choice("xyz") for _ in range(n)]
    a = mixed_vals(rng, n)
    b = [rng.randint(-5, 5) for _ in range(n)]
    pdf = pd.DataFrame({"k": ks, "a": pd.Series(a, dtype="float64"), "b": b})
    df = DataFrame({"k": ks, "a": a, "b": b})
    spec = {"a": ["sum", "mean", "first", "last"], "b": "max"}
    got = df.groupby("k").agg(spec).to_pandas().sort_index()
    want = pdf.groupby("k").agg(spec)
    want.columns = [c if isinstance(c, str) else "_".join(c) for c in want.columns]
    # pandas flattens ('a','sum')->a_sum but keeps plain 'b' for str spec
    want = want.rename(columns={"b_max": "b"}).sort_index()
    for c in got.columns:
        check(f"agg_naming[{seed},{c}]", got[c], want[c])


def probe_nth(spark, seed: int) -> None:
    rng = random.Random(seed)
    n = 25
    ks = [rng.choice("pq") for _ in range(n)]
    v = [rng.randint(0, 9) for _ in range(n)]
    pdf = pd.DataFrame({"k": ks, "v": v})
    df = DataFrame({"k": ks, "v": v})
    for pos in (0, 1, 2, -1, -2):
        try:
            got = df.groupby("k").nth(pos).to_pandas()
        except Exception as e:  # noqa: BLE001
            FAILS.append(f"nth[{seed},{pos}] raised {e}")
            print(f"FAIL nth[{seed},{pos}] raised {type(e).__name__}: {e}")
            continue
        want = pdf.groupby("k").nth(pos)
        check(f"nth[{seed},{pos}]k", got["k"], want["k"])
        check(f"nth[{seed},{pos}]v", got["v"], want["v"])


def probe_searchsorted(spark, seed: int) -> None:
    rng = random.Random(seed)
    vals = sorted(rng.randint(-10, 10) for _ in range(20))
    ps = pd.Series(vals)
    ss = Series(vals)
    for _ in range(4):
        tgt = rng.randint(-12, 12)
        for side in ("left", "right"):
            check(
                f"searchsorted[{seed},{tgt},{side}]",
                [int(ss.searchsorted(tgt, side=side))],
                [int(ps.searchsorted(tgt, side=side))],
            )


def probe_between_clip(spark, seed: int) -> None:
    rng = random.Random(seed)
    vals = mixed_vals(rng, 30)
    ps = pd.Series(vals, dtype="float64")
    ss = Series(vals)
    lo, hi = sorted((round(rng.uniform(-2, 2), 1), round(rng.uniform(-2, 2), 1)))
    for inc in ("both", "left", "right", "neither"):
        check(
            f"between[{seed},{inc}]",
            ss.between(lo, hi, inclusive=inc).to_pandas(),
            ps.between(lo, hi, inclusive=inc),
        )
    check(f"clip[{seed}]", ss.clip(lo, hi).to_pandas(), ps.clip(lo, hi))
    check(f"clip_inv[{seed}]", ss.clip(hi + 1, lo - 1).to_pandas(), ps.clip(hi + 1, lo - 1))
    check(f"clip_nan_lo[{seed}]", ss.clip(float("nan"), hi).to_pandas(), ps.clip(float("nan"), hi))
    check(f"clip_none_hi[{seed}]", ss.clip(lo, None).to_pandas(), ps.clip(lo, None))


def probe_value_counts(spark, seed: int) -> None:
    rng = random.Random(seed)
    vals = mixed_vals(rng, 40)
    ps = pd.Series(vals, dtype="float64")
    ss = Series(vals)
    for normalize in (False, True):
        for ascending in (False, True):
            for dropna in (True, False):
                got = ss.value_counts(
                    normalize=normalize, ascending=ascending, dropna=dropna
                ).to_pandas()
                want = ps.value_counts(
                    normalize=normalize, ascending=ascending, dropna=dropna
                )
                # cross-engine tie order differs (documented); compare as dict
                gd = {repr(k): v for k, v in got.items()}
                wd = {repr(k): v for k, v in want.items()}
                label = f"vc[{seed},n={normalize},a={ascending},d={dropna}]"
                if len(gd) == len(wd) and all(
                    k in wd and close(v, wd[k]) for k, v in gd.items()
                ):
                    print(f"ok   {label}")
                else:
                    FAILS.append(label)
                    print(f"FAIL {label}\n  got  {gd}\n  want {wd}")


def probe_isin_feeds(spark, seed: int) -> None:
    rng = random.Random(seed)
    vals = mixed_vals(rng, 25)
    ps = pd.Series(vals, dtype="float64")
    ss = Series(vals)
    picks = [v for v in vals if v is not None][:4] + [float("nan")]
    check(f"isin_list[{seed}]", ss.isin(picks).to_pandas(), ps.isin(picks))
    check(
        f"isin_ndarray[{seed}]",
        ss.isin(np.array([p for p in picks if not (isinstance(p, float) and math.isnan(p))])).to_pandas(),
        ps.isin(np.array([p for p in picks if not (isinstance(p, float) and math.isnan(p))])),
    )


def probe_unique(spark, seed: int) -> None:
    rng = random.Random(seed)
    vals = mixed_vals(rng, 30)
    ps = pd.Series(vals, dtype="float64")
    ss = Series(vals)
    got = list(ss.unique())
    want = list(ps.unique())
    # pandas keeps first-appearance order (positional); distributed
    # contract is deterministic order — compare as multisets
    check(f"unique[{seed}]", got, want, order=False)
    check(f"nunique[{seed}]", [ss.nunique()], [ps.nunique()])


def main() -> None:
    seeds = [int(s) for s in sys.argv[1:]] or [7, 21, 42]
    spark = get_spark()
    for seed in seeds:
        probe_duplicated_mixed(spark, seed)
        probe_agg_naming(spark, seed)
        probe_nth(spark, seed)
        probe_searchsorted(spark, seed)
        probe_between_clip(spark, seed)
        probe_value_counts(spark, seed)
        probe_isin_feeds(spark, seed)
        probe_unique(spark, seed)
    print(f"\n{len(FAILS)} failures")
    if FAILS:
        for f in FAILS:
            print(" -", f)
        sys.exit(1)


if __name__ == "__main__":
    main()
