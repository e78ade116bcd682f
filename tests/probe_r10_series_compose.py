"""Round-10 probe batch 8: randomized SERIES composition sweep.

The frame sweep (probe_r10_compose.py) closed the visible-order class
at frame level; this one chains Series→Series ops (sort/mask/window/
dedup/astype/clip/str) 3-4 deep and compares values AND index order
after the whole chain.

NOT collected by pytest; run manually:

    python tests/probe_r10_series_compose.py [seed ...]
"""
from __future__ import annotations

import math
import random
import sys

import numpy as np
import pandas as pd

from pontem_spark.core.series import Series
from pontem_spark.session import get_spark

FAILS: list[str] = []


def close(a, b) -> bool:
    try:
        an, bn = bool(pd.isna(a)), bool(pd.isna(b))
    except (TypeError, ValueError):
        an = bn = False
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


def make_series(rng: random.Random):
    n = rng.randint(8, 14)
    pool = rng.sample(range(-40, 40), n)  # unique → no tie-order noise
    vals = [x + 0.25 for x in pool]
    # sprinkle missing at ~15%
    vals = [None if rng.random() < 0.15 else v for v in vals]
    ps = pd.Series(vals, dtype="float64")
    s = Series(vals, name="v")
    return s, ps


OPS = [
    ("sort", lambda s: s.sort_values(), lambda p: p.sort_values()),
    (
        "sort_desc",
        lambda s: s.sort_values(ascending=False),
        lambda p: p.sort_values(ascending=False),
    ),
    ("head5", lambda s: s.head(5), lambda p: p.head(5)),
    ("mask_pos", lambda s: s[s > -15.0], lambda p: p[p > -15.0]),
    ("fillna0", lambda s: s.fillna(0.0), lambda p: p.fillna(0.0)),
    ("dropna", lambda s: s.dropna(), lambda p: p.dropna()),
    ("cumsum", lambda s: s.cumsum(), lambda p: p.cumsum()),
    ("cummax", lambda s: s.cummax(), lambda p: p.cummax()),
    ("shift", lambda s: s.shift(1), lambda p: p.shift(1)),
    ("rank", lambda s: s.rank(), lambda p: p.rank()),
    ("abs", lambda s: s.abs(), lambda p: p.abs()),
    ("clip", lambda s: s.clip(-10.0, 10.0), lambda p: p.clip(-10.0, 10.0)),
    ("ffill", lambda s: s.ffill(), lambda p: p.ffill()),
    ("bfill", lambda s: s.bfill(), lambda p: p.bfill()),
    ("round", lambda s: s.round(0), lambda p: p.round(0)),
    ("interp", lambda s: s.interpolate(), lambda p: p.interpolate()),
    ("add1", lambda s: s + 1.0, lambda p: p + 1.0),
    ("neg", lambda s: -s, lambda p: -p),
    ("drop_dup", lambda s: s.drop_duplicates(), lambda p: p.drop_duplicates()),
    ("nlargest4", lambda s: s.nlargest(4), lambda p: p.nlargest(4)),
    ("sort_index", lambda s: s.sort_index(), lambda p: p.sort_index()),
    ("diff", lambda s: s.diff(), lambda p: p.diff()),
    ("pct", lambda s: s.pct_change(), lambda p: p.pct_change()),
    ("isin", lambda s: s[s.isin([0.25, 1.25, 2.25, -3.75])], lambda p: p[p.isin([0.25, 1.25, 2.25, -3.75])]),
    ("tail6", lambda s: s.tail(6), lambda p: p.tail(6)),
]


def main() -> None:
    seeds = [int(x) for x in sys.argv[1:]] or [2, 19]
    get_spark()
    for seed in seeds:
        rng = random.Random(seed)
        for trial in range(30):
            s, ps = make_series(rng)
            chain = [rng.randrange(len(OPS)) for _ in range(rng.choice((3, 4)))]
            label = f"[{seed}:{trial}] " + ">".join(OPS[i][0] for i in chain)
            try:
                for i in chain:
                    s = OPS[i][1](s)
                ok_e = True
            except Exception as exc:  # noqa: BLE001
                ok_e, e_exc = False, exc
            try:
                for i in chain:
                    ps = OPS[i][2](ps)
                ok_p = True
            except Exception:  # noqa: BLE001
                ok_p = False
            if ok_e != ok_p:
                FAILS.append(label + (" engine raised" if ok_p else " pandas raised"))
                print(f"FAIL {label}: " + (f"engine raised {e_exc}" if ok_p else "pandas raised, engine didn't"))
                continue
            if not ok_e:
                print(f"ok   {label} (both raised)")
                continue
            got = s.to_pandas()
            gi, wi = list(got.index), list(ps.index)
            gv, wv = list(got.values), list(ps.values)
            vals_ok = len(gv) == len(wv) and all(close(a, b) for a, b in zip(gv, wv))
            idx_ok = vals_ok and all(close(a, b) for a, b in zip(gi, wi))
            if vals_ok and not idx_ok:
                # tie-order deviation is documented (index order vs pandas'
                # unstable quicksort): accept when each tie group holds the
                # same index multiset
                def groups(vals, idxs):
                    out = {}
                    for v, i in zip(vals, idxs):
                        out.setdefault(repr(v), []).append(i)
                    return {k: sorted(map(str, v)) for k, v in out.items()}
                idx_ok = groups(gv, gi) == groups(wv, wi)
            if not (vals_ok and idx_ok):
                FAILS.append(label)
                print(f"FAIL {label}\n  got  {gv[:8]} idx {gi[:8]}\n  want {wv[:8]} idx {wi[:8]}")
            else:
                print(f"ok   {label}")
    print(f"\n{len(FAILS)} failures")
    if FAILS:
        for f in FAILS:
            print(" -", f)
        sys.exit(1)


if __name__ == "__main__":
    main()
