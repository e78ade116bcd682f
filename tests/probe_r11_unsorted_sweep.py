"""Round-11 probe batch 6: randomized composition sweep over frames
built with NON-MONOTONIC explicit indexes — the construction-order fix
(batch 5) under the full r10 chain pool.

Same harness discipline as probe_r10_compose: random chains of 3-4 ops,
unique-valued sort keys (pandas tie order is a documented deviation),
whole-chain comparison of values, index, and column order.

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r11_unsorted_sweep.py [seed ...]
"""
from __future__ import annotations

import math
import random
import sys

import numpy as np
import pandas as pd

from pontem_spark.core.frame import DataFrame
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


def make_frame(rng: random.Random):
    n = rng.randint(8, 14)
    u_pool = rng.sample(range(-50, 50), n)
    u = [x + 0.5 for x in u_pool]
    v = [
        None if rng.random() < 0.2 else round(rng.uniform(-5, 5), 1)
        for _ in range(n)
    ]
    k = [rng.choice("xyz") for _ in range(n)]
    # the point of this sweep: a SHUFFLED unique integer index
    idx = rng.sample(range(100, 100 + 3 * n), n)
    pdf = pd.DataFrame({"u": u, "v": v, "k": k}, index=idx).astype({"v": "float64"})
    df = DataFrame({"u": u, "v": v, "k": k}, index=idx)
    return df, pdf


OPS = [
    ("sort_u", lambda d: d.sort_values("u"), lambda p: p.sort_values("u")),
    (
        "sort_u_desc",
        lambda d: d.sort_values("u", ascending=False),
        lambda p: p.sort_values("u", ascending=False),
    ),
    ("head5", lambda d: d.head(5), lambda p: p.head(5)),
    ("tail4", lambda d: d.tail(4), lambda p: p.tail(4)),
    ("fillna0", lambda d: d.fillna(0.0), lambda p: p.fillna(0.0)),
    ("dropna", lambda d: d.dropna(), lambda p: p.dropna()),
    (
        "assign_w",
        lambda d: d.assign(w=d["v"] * 2 + 1),
        lambda p: p.assign(w=p["v"] * 2 + 1),
    ),
    (
        "filter_pos",
        lambda d: d[d["u"] > -20.0],
        lambda p: p[p["u"] > -20.0],
    ),
    ("nlargest3", lambda d: d.nlargest(3, "u"), lambda p: p.nlargest(3, "u")),
    (
        "reset_index",
        lambda d: d.reset_index(drop=True),
        lambda p: p.reset_index(drop=True),
    ),
    ("sort_index", lambda d: d.sort_index(), lambda p: p.sort_index()),
    (
        "cumsum_v",
        lambda d: d.assign(cs=d["v"].cumsum()),
        lambda p: p.assign(cs=p["v"].cumsum()),
    ),
    (
        "iloc_rev_head",
        lambda d: d.iloc[::-1].head(4),
        lambda p: p.iloc[::-1].head(4),
    ),
    ("rank_u", lambda d: d.assign(r=d["u"].rank()), lambda p: p.assign(r=p["u"].rank())),
    (
        "g_cumsum",
        lambda d: d.assign(gc=d.groupby("k")["u"].cumsum()) if "k" in d.columns else d,
        lambda p: p.assign(gc=p.groupby("k")["u"].cumsum()) if "k" in p.columns else p,
    ),
    (
        "g_shift",
        lambda d: d.assign(gs=d.groupby("k")["u"].shift(1)) if "k" in d.columns else d,
        lambda p: p.assign(gs=p.groupby("k")["u"].shift(1)) if "k" in p.columns else p,
    ),
    ("ffill", lambda d: d.ffill(), lambda p: p.ffill()),
    (
        "shift_v",
        lambda d: d.assign(sv=d["v"].shift(1)),
        lambda p: p.assign(sv=p["v"].shift(1)),
    ),
]


def compare(label: str, df, pdf) -> None:
    got = df.to_pandas()
    if list(got.columns) != list(pdf.columns):
        FAILS.append(f"{label} cols")
        print(f"FAIL {label}: columns {list(got.columns)} vs {list(pdf.columns)}")
        return
    if len(got) != len(pdf):
        FAILS.append(f"{label} len {len(got)} != {len(pdf)}")
        print(f"FAIL {label}: len {len(got)} vs {len(pdf)}")
        return
    if not all(close(a, b) for a, b in zip(got.index, pdf.index)):
        FAILS.append(f"{label} index")
        print(f"FAIL {label}: index {list(got.index)[:8]} vs {list(pdf.index)[:8]}")
        return
    for c in got.columns:
        if not all(close(a, b) for a, b in zip(got[c], pdf[c])):
            FAILS.append(f"{label} col {c}")
            print(
                f"FAIL {label}: col {c}\n  got  {list(got[c])[:8]}\n  want {list(pdf[c])[:8]}"
            )
            return
    print(f"ok   {label}")


def main() -> None:
    seeds = [int(s) for s in sys.argv[1:]] or [5, 23]
    get_spark()
    for seed in seeds:
        rng = random.Random(seed)
        for trial in range(25):
            df, pdf = make_frame(rng)
            chain = [rng.randrange(len(OPS)) for _ in range(rng.choice((3, 4)))]
            label = f"[{seed}:{trial}] " + ">".join(OPS[i][0] for i in chain)
            try:
                for i in chain:
                    df = OPS[i][1](df)
                ok_engine = True
            except Exception as exc:  # noqa: BLE001
                ok_engine = False
                engine_exc = exc
            try:
                for i in chain:
                    pdf = OPS[i][2](pdf)
                ok_pandas = True
            except Exception:  # noqa: BLE001
                ok_pandas = False
            if ok_engine != ok_pandas:
                if ok_pandas:
                    FAILS.append(f"{label} engine raised {engine_exc}")
                    print(
                        f"FAIL {label}: engine raised "
                        f"{type(engine_exc).__name__}: {engine_exc}"
                    )
                else:
                    FAILS.append(f"{label} pandas raised, engine didn't")
                    print(f"FAIL {label}: pandas raised, engine didn't")
                continue
            if not ok_engine:
                print(f"ok   {label} (both raised)")
                continue
            compare(label, df, pdf)
    print()
    print(f"{len(FAILS)} failures")
    if FAILS:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
