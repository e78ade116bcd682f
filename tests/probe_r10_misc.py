"""Round-10 probe batch 3: cumulative/positional/string-pad differentials.

Sweeps cumsum/cummax/cummin/cumprod (NaN propagation), diff/pct_change
(periods incl. negative), idxmax/idxmin (NaN rows, ties), mode (ties,
all-NaN), combine_first/align (disjoint + overlapping + dup-free
indexes), map (dict with missing keys, na_action), str pad family
(ljust/rjust/center/zfill/pad with multibyte chars), str slice/get
(negative positions) against pandas.

Randomized differential vs pandas (probe-then-pin cadence). NOT
collected by pytest (no test_ prefix); run manually:

    python tests/probe_r10_misc.py [seed ...]
"""
from __future__ import annotations

import random
import string
import sys

import numpy as np
import pandas as pd

from pontem_spark.core.series import Series
from pontem_spark.session import get_spark

FAILS: list[str] = []


def close(a, b) -> bool:
    an, bn = pd.isna(a), pd.isna(b)
    if an or bn:
        return bool(an) == bool(bn)
    if isinstance(a, (int, float, np.floating, np.integer)) and isinstance(
        b, (int, float, np.floating, np.integer)
    ):
        fa, fb = float(a), float(b)
        if np.isinf(fa) or np.isinf(fb):
            return fa == fb
        return abs(fa - fb) < 1e-9 * max(1.0, abs(fb))
    return a == b


def check(label: str, got, want, order: bool = True) -> None:
    gv = list(got.values) if hasattr(got, "values") else list(got)
    wv = list(want.values) if hasattr(want, "values") else list(want)
    if not order:
        gv, wv = sorted(gv, key=str), sorted(wv, key=str)
    ok = len(gv) == len(wv) and all(close(a, b) for a, b in zip(gv, wv))
    if ok and order and hasattr(got, "index") and hasattr(want, "index"):
        ok = all(close(a, b) for a, b in zip(list(got.index), list(want.index)))
    if not ok:
        FAILS.append(label)
        print(f"FAIL {label}\n  got  {gv[:8]}\n  want {wv[:8]}")
    else:
        print(f"ok   {label}")


def probe_cums(spark, seed: int) -> None:
    rng = random.Random(seed)
    n = 25
    vals = [
        float("nan") if rng.random() < 0.2 else round(rng.uniform(-2, 2), 2)
        for _ in range(n)
    ]
    w = pd.Series(vals)
    s = Series(vals, spark=spark)
    for op in ("cumsum", "cummax", "cummin", "cumprod"):
        check(f"seed{seed} {op}", getattr(s, op)().to_pandas(), getattr(w, op)())
    for periods in (1, 2, -1, -3):
        check(f"seed{seed} diff p={periods}", s.diff(periods).to_pandas(), w.diff(periods))
    for periods in (1, 2):
        check(
            f"seed{seed} pct_change p={periods}",
            s.pct_change(periods, fill_method=None).to_pandas(),
            w.pct_change(periods, fill_method=None),
        )


def probe_idx_mode(spark, seed: int) -> None:
    rng = random.Random(seed + 500)
    n = 20
    vals = [
        float("nan") if rng.random() < 0.15 else float(rng.randint(-3, 3))
        for _ in range(n)
    ]
    idx = list(range(100, 100 + n))
    rng.shuffle(idx)
    w = pd.Series(vals, index=idx)
    s = Series(vals, index=idx, spark=spark)
    for op in ("idxmax", "idxmin"):
        got, want = getattr(s, op)(), getattr(w, op)()
        # ties: pandas returns the FIRST POSITION; the engine the lowest
        # index label among the tied rows — canonicalize: engine answer
        # must be a label holding the extreme value
        ext = (w.max() if op == "idxmax" else w.min())
        ok = close(w.get(got), ext)
        if not ok:
            FAILS.append(f"seed{seed} {op}")
            print(f"FAIL seed{seed} {op}: got {got} (value {w.get(got)}) want-extreme {ext} (pandas {want})")
        else:
            print(f"ok   seed{seed} {op}")
    # mode: pandas returns ALL tied values sorted ascending
    check(f"seed{seed} mode", s.mode().to_pandas(), w.mode())
    all_nan = Series([float("nan")] * 3, spark=spark)
    check("mode all-nan", all_nan.mode().to_pandas(), pd.Series([float("nan")] * 3).mode())


def probe_combine_align(spark, seed: int) -> None:
    rng = random.Random(seed + 900)
    ia = sorted(rng.sample(range(30), 12))
    ib = sorted(rng.sample(range(30), 12))
    va = [float("nan") if rng.random() < 0.25 else round(rng.uniform(0, 9), 1) for _ in ia]
    vb = [round(rng.uniform(10, 19), 1) for _ in ib]
    wa, wb = pd.Series(va, index=ia), pd.Series(vb, index=ib)
    sa, sb = Series(va, index=ia, spark=spark), Series(vb, index=ib, spark=spark)
    check(
        f"seed{seed} combine_first",
        sa.combine_first(sb).to_pandas().sort_index(),
        wa.combine_first(wb).sort_index(),
    )
    for join in ("outer", "inner", "left", "right"):
        ga, gb = sa.align(sb, join=join)
        pa, pb = wa.align(wb, join=join)
        check(f"seed{seed} align {join} L", ga.to_pandas().sort_index(), pa.sort_index())
        check(f"seed{seed} align {join} R", gb.to_pandas().sort_index(), pb.sort_index())


def probe_map(spark, seed: int) -> None:
    rng = random.Random(seed + 1300)
    keys = ["a", "b", "c", "d", None]
    vals = [rng.choice(keys) for _ in range(20)]
    w = pd.Series(vals)
    s = Series(vals, spark=spark)
    mapping = {"a": 1.0, "b": 2.0}  # c/d/None unmapped -> NaN
    check(f"seed{seed} map dict", s.map(mapping).to_pandas(), w.map(mapping))
    check(
        f"seed{seed} map callable na_action",
        s.map(lambda x: (x or "") + "!", na_action="ignore").to_pandas(),
        w.map(lambda x: (x or "") + "!", na_action="ignore"),
    )
    lookup = pd.Series([10.0, 20.0, 30.0], index=["a", "b", "c"])
    slookup = Series([10.0, 20.0, 30.0], index=["a", "b", "c"], spark=spark)
    check(f"seed{seed} map series", s.map(slookup).to_pandas(), w.map(lookup))


def probe_str_pad(spark, seed: int) -> None:
    rng = random.Random(seed + 1700)
    alpha = string.ascii_letters + "àéœß"
    vals = [
        None if rng.random() < 0.1
        else "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
        for _ in range(20)
    ]
    w = pd.Series(vals)
    s = Series(vals, spark=spark)
    for op, args in [
        ("ljust", (6, "*")), ("rjust", (6, "*")), ("center", (7, "-")),
        ("zfill", (5,)),
    ]:
        check(
            f"seed{seed} str.{op}{args}",
            getattr(s.str, op)(*args).to_pandas(),
            getattr(w.str, op)(*args),
        )
    for side in ("left", "right", "both"):
        check(
            f"seed{seed} str.pad side={side}",
            s.str.pad(6, side=side, fillchar="+").to_pandas(),
            w.str.pad(6, side=side, fillchar="+"),
        )
    for sl in [(1, 4), (-3, None), (None, -1), (2, None)]:
        check(
            f"seed{seed} str.slice{sl}",
            s.str.slice(*sl).to_pandas(),
            w.str.slice(*sl),
        )
    for i in (0, 2, -1):
        check(f"seed{seed} str.get({i})", s.str.get(i).to_pandas(), w.str.get(i))


def main() -> None:
    seeds = [int(a) for a in sys.argv[1:]] or [13, 77]
    spark = get_spark(app_name="probe-r10m", master="local[8]", shuffle_partitions=8)
    for seed in seeds:
        probe_cums(spark, seed)
        probe_idx_mode(spark, seed)
        probe_combine_align(spark, seed)
        probe_map(spark, seed)
        probe_str_pad(spark, seed)
    print(f"\n{len(FAILS)} failures: {FAILS}")


if __name__ == "__main__":
    main()
