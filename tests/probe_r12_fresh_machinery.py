"""Round-12 probe batch 3: sweep over THIS round's fresh machinery —
the merge order-copy columns (__lo*/__ro*), the setitem shared-helper
join, and the stable sort_index spec — composed with each other and
with positional ops. The r11 lesson: every fresh mechanism gets its own
sweep before the round closes (batch 5's construction-order fix was
found exactly this way).

Shapes stressed here that batches 1-2 didn't reach:
  - CHAINED merges (merge of a merge result): the order-copy loop must
    not clobber a previous merge's __lo*__ spec columns;
  - merge with duplicate KEYS on both sides (fan-out ordering: pandas
    orders matches left-row-major then right row order);
  - merge -> positional ops (cumsum/shift/head) riding the carried spec;
  - sort_index -> setitem-derived (the stable spec must flow into the
    shared-helper join);
  - setitem chains (two derived assigns in a row, each rewrapping).

Random 2-4-op chains, three index shapes, kind='stable' pandas
sort_index (documented deviation), explicit reset_index after merge
(documented deviation).

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r12_fresh_machinery.py [seed ...]
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


def make_index(rng: random.Random, n: int):
    shape = rng.choice(("shuffled_unique", "mono_dup", "shuffled_dup"))
    if shape == "shuffled_unique":
        return rng.sample(range(100, 100 + 3 * n), n), shape
    if shape == "mono_dup":
        return sorted(rng.choices(range(100, 100 + n), k=n)), shape
    return rng.choices(range(100, 100 + n), k=n), shape


def make_frame(rng: random.Random):
    n = rng.randint(6, 10)
    u = [x + 0.5 for x in rng.sample(range(-50, 50), n)]
    v = [
        None if rng.random() < 0.2 else round(rng.uniform(-5, 5), 1)
        for _ in range(n)
    ]
    k = [rng.choice("xy") for _ in range(n)]
    idx, shape = make_index(rng, n)
    pdf = pd.DataFrame({"u": u, "v": v, "k": k}, index=idx).astype({"v": "float64"})
    df = DataFrame({"u": u, "v": v, "k": k}, index=idx)
    return df, pdf, shape


def make_dim(rng: random.Random, dup_keys: bool):
    """A small dim keyed on k — optionally with DUPLICATE keys so the
    merge fans out and pandas' left-row-major/right-row-order contract
    is exercised."""
    if dup_keys:
        kk = ["x", "y", "x"]
        kw = [10.0, 20.0, 30.0]
    else:
        kk = ["x", "y"]
        kw = [10.0, 20.0]
    return (
        DataFrame({"k": kk, "kw": kw}),
        pd.DataFrame({"k": kk, "kw": kw}),
    )


def ops(rng: random.Random):
    d_dim, p_dim = make_dim(rng, dup_keys=False)
    d_dup, p_dup = make_dim(rng, dup_keys=True)
    return [
        (
            "merge_k",
            lambda d: d.merge(d_dim, on="k").reset_index(drop=True)
            if "k" in d.columns
            else d,
            lambda p: p.merge(p_dim, on="k").reset_index(drop=True)
            if "k" in p.columns
            else p,
        ),
        (
            "merge_dupkeys",
            lambda d: d.merge(d_dup, on="k").reset_index(drop=True)
            if "k" in d.columns
            else d,
            lambda p: p.merge(p_dup, on="k").reset_index(drop=True)
            if "k" in p.columns
            else p,
        ),
        (
            "sort_index",
            lambda d: d.sort_index(),
            lambda p: p.sort_index(kind="stable"),
        ),
        (
            "sort_index_desc",
            lambda d: d.sort_index(ascending=False),
            lambda p: p.sort_index(ascending=False, kind="stable"),
        ),
        (
            # documented deviation: sort_values ties break by index (==
            # pandas kind='stable' whenever the index enumerates the
            # visible order, e.g. after reset_index); the quicksort
            # default's tie order is an artifact. Ties only arise here
            # from dup-key merge fan-out duplicating u.
            "sort_u",
            lambda d: d.sort_values("u"),
            lambda p: p.sort_values("u", kind="stable"),
        ),
        (
            "cumsum_v",
            lambda d: d.assign(cs=d["v"].cumsum()),
            lambda p: p.assign(cs=p["v"].cumsum()),
        ),
        (
            "shift_u",
            lambda d: d.assign(su=d["u"].shift(1)),
            lambda p: p.assign(su=p["u"].shift(1)),
        ),
        (
            "double_assign",
            lambda d: (lambda t: t.assign(s2=t["u"].shift(1)))(
                d.assign(c2=d["u"].cumsum())
            ),
            lambda p: (lambda t: t.assign(s2=t["u"].shift(1)))(
                p.assign(c2=p["u"].cumsum())
            ),
        ),
        ("head5", lambda d: d.head(5), lambda p: p.head(5)),
        ("tail4", lambda d: d.tail(4), lambda p: p.tail(4)),
        (
            "set_index_u",
            lambda d: d.set_index("u") if "u" in d.columns else d,
            lambda p: p.set_index("u") if "u" in p.columns else p,
        ),
        (
            "reset_index",
            lambda d: d.reset_index(drop=True),
            lambda p: p.reset_index(drop=True),
        ),
    ]


def compare(label: str, df, pdf) -> None:
    got = df.to_pandas()
    if list(got.columns) != list(pdf.columns):
        FAILS.append(f"{label} cols")
        print(f"FAIL {label}: columns {list(got.columns)} vs {list(pdf.columns)}")
        return
    if len(got) != len(pdf):
        FAILS.append(f"{label} len")
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
    seeds = [int(s) for s in sys.argv[1:]] or [13, 51]
    get_spark()
    for seed in seeds:
        rng = random.Random(seed)
        for trial in range(25):
            df, pdf, shape = make_frame(rng)
            OPS = ops(rng)
            chain = [rng.randrange(len(OPS)) for _ in range(rng.choice((2, 3, 4)))]
            label = f"[{seed}:{trial}:{shape}] " + ">".join(
                OPS[i][0] for i in chain
            )
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
    for f in FAILS:
        print("  -", f)


if __name__ == "__main__":
    main()
