"""Round-10 probe batch 7: randomized COMPOSITION sweep.

Single ops are heavily pinned; the bugs that survived nine rounds were
all composition artifacts (derived-rebind re-sorts, helper-column
anchor traps, order specs lost across materialization boundaries). So:
random chains of 3 frame ops from a 16-op pool, applied to random
frames, compared to pandas after the WHOLE chain — values, index, and
column order.

Sort columns draw from a unique-value pool so pandas' positional
tie-order (a documented deviation) can't produce false positives.

NOT collected by pytest (no test_ prefix); run manually:

    python tests/probe_r10_compose.py [seed ...]
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
    n = rng.randint(8, 16)
    # u: unique floats (safe sort key); v: float with missing; k: group key
    u_pool = rng.sample(range(-50, 50), n)
    u = [x + 0.5 for x in u_pool]
    v = [
        None if rng.random() < 0.2 else round(rng.uniform(-5, 5), 1)
        for _ in range(n)
    ]
    k = [rng.choice("xyz") for _ in range(n)]
    pdf = pd.DataFrame({"u": u, "v": pd.Series(v, dtype="float64"), "k": k})
    df = DataFrame({"u": u, "v": v, "k": k})
    return df, pdf


# each op: (label, pontem_fn, pandas_fn) — both take and return a frame
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
        "derive_flag",
        lambda d: d.assign(f=d["u"] > 0),
        lambda p: p.assign(f=p["u"] > 0),
    ),
    (
        "filter_pos",
        lambda d: d[d["u"] > -20.0],
        lambda p: p[p["u"] > -20.0],
    ),
    (
        "nlargest3",
        lambda d: d.nlargest(3, "u"),
        lambda p: p.nlargest(3, "u"),
    ),
    (
        "reset_index",
        lambda d: d.reset_index(drop=True),
        lambda p: p.reset_index(drop=True),
    ),
    (
        "set_index_u",
        lambda d: d.set_index("u"),
        lambda p: p.set_index("u"),
    ),
    (
        "rename",
        lambda d: d.rename(columns={"v": "val"}),
        lambda p: p.rename(columns={"v": "val"}),
    ),
    (
        "sort_index",
        lambda d: d.sort_index(),
        lambda p: p.sort_index(),
    ),
    (
        "cumsum_v",
        lambda d: d.assign(cs=d[[c for c in d.columns if c in ("v", "val")][0]].cumsum()),
        lambda p: p.assign(cs=p[[c for c in p.columns if c in ("v", "val")][0]].cumsum()),
    ),
    (
        "iloc_rev_head",
        lambda d: d.iloc[::-1].head(4),
        lambda p: p.iloc[::-1].head(4),
    ),
    (
        "rank_u",
        lambda d: d.assign(r=d["u"].rank()),
        lambda p: p.assign(r=p["u"].rank()),
    ),
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
    (
        "drop_col",
        lambda d: d[[c for c in d.columns if c != "k"]],
        lambda p: p[[c for c in p.columns if c != "k"]],
    ),
    (
        "ffill_v",
        lambda d: d.ffill(),
        lambda p: p.ffill(),
    ),
    (
        "dup_mask",
        lambda d: d.assign(dd=d.duplicated(subset=["k"])) if "k" in d.columns else d,
        lambda p: p.assign(dd=p.duplicated(subset=["k"])) if "k" in p.columns else p,
    ),
    (
        "interp",
        lambda d: d.assign(iv=d[[c for c in d.columns if c in ("v", "val")][0]].interpolate()) if any(c in d.columns for c in ("v", "val")) else d,
        lambda p: p.assign(iv=p[[c for c in p.columns if c in ("v", "val")][0]].interpolate()) if any(c in p.columns for c in ("v", "val")) else p,
    ),
]


def compare(label: str, df, pdf) -> None:
    got = df.to_pandas()
    if list(got.columns) != list(pdf.columns):
        FAILS.append(f"{label} cols {list(got.columns)} != {list(pdf.columns)}")
        print(f"FAIL {label}: columns {list(got.columns)} vs {list(pdf.columns)}")
        return
    if len(got) != len(pdf):
        FAILS.append(f"{label} len {len(got)} != {len(pdf)}")
        print(f"FAIL {label}: len {len(got)} vs {len(pdf)}")
        return
    gi, wi = list(got.index), list(pdf.index)
    if not all(close(a, b) for a, b in zip(gi, wi)):
        FAILS.append(f"{label} index")
        print(f"FAIL {label}: index {gi[:8]} vs {wi[:8]}")
        return
    for c in got.columns:
        if not all(close(a, b) for a, b in zip(got[c], pdf[c])):
            FAILS.append(f"{label} col {c}")
            print(f"FAIL {label}: col {c}\n  got  {list(got[c])[:8]}\n  want {list(pdf[c])[:8]}")
            return
    print(f"ok   {label}")


def main() -> None:
    seeds = [int(s) for s in sys.argv[1:]] or [3, 17]
    get_spark()
    for seed in seeds:
        rng = random.Random(seed)
        for trial in range(30):
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
                    print(f"FAIL {label}: engine raised {type(engine_exc).__name__}: {engine_exc}")
                else:
                    # engine succeeded where pandas raised — check what
                    FAILS.append(f"{label} pandas raised, engine didn't")
                    print(f"FAIL {label}: pandas raised, engine didn't")
                continue
            if not ok_engine:
                print(f"ok   {label} (both raised)")
                continue
            compare(label, df, pdf)
    print(f"\n{len(FAILS)} failures")
    if FAILS:
        for f in FAILS:
            print(" -", f)
        sys.exit(1)


if __name__ == "__main__":
    main()
