"""Round-12 probe batch 4: SERIES chains over duplicate-label indexes —
the row-aligned-derivation class (s ⊕ s.shift()) through every aligner:
arithmetic dunders, named ops with fill_value, where/mask,
combine_first, update, and the positional/sort tails.

pandas is POSITIONAL whenever the two operands' index sequences are
element-wise identical (Index.equals short-circuits alignment); a label
join fans out k² per duplicate label instead. Round 12 fixed this by
joining on the shared order-spec helper columns; this sweep drives the
fix through 2-3-op random chains.

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r12_series_duplabels.py [seed ...]
"""
from __future__ import annotations

import math
import random
import sys

import numpy as np
import pandas as pd

from pontem_spark.core import Series
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


def make_series(rng: random.Random, spark):
    n = rng.randint(6, 12)
    shape = rng.choice(("shuffled_unique", "mono_dup", "shuffled_dup"))
    if shape == "shuffled_unique":
        idx = rng.sample(range(100, 100 + 3 * n), n)
    elif shape == "mono_dup":
        idx = sorted(rng.choices(range(100, 100 + n), k=n))
    else:
        idx = rng.choices(range(100, 100 + n), k=n)
    vals = [
        None if rng.random() < 0.2 else round(rng.uniform(-5, 5), 1)
        for _ in range(n)
    ]
    pds = pd.Series(vals, index=idx, dtype="float64")
    s = Series(vals, index=idx, spark=spark)
    return s, pds, shape


OPS = [
    ("add_shift", lambda s: s + s.shift(1), lambda p: p + p.shift(1)),
    ("sub_cumsum", lambda s: s - s.cumsum(), lambda p: p - p.cumsum()),
    (
        "add_fill",
        lambda s: s.add(s.shift(2), fill_value=0.5),
        lambda p: p.add(p.shift(2), fill_value=0.5),
    ),
    (
        "where_shift",
        lambda s: s.where(s.shift(1) > 0.0, -1.0),
        lambda p: p.where(p.shift(1) > 0.0, -1.0),
    ),
    (
        "mask_cumsum",
        lambda s: s.mask(s.cumsum() > 2.0, 9.0),
        lambda p: p.mask(p.cumsum() > 2.0, 9.0),
    ),
    (
        "combine_first",
        lambda s: s.combine_first(s.shift(1)),
        lambda p: p.combine_first(p.shift(1)),
    ),
    ("cumsum", lambda s: s.cumsum(), lambda p: p.cumsum()),
    ("shift", lambda s: s.shift(1), lambda p: p.shift(1)),
    ("fillna", lambda s: s.fillna(0.0), lambda p: p.fillna(0.0)),
    ("dropna", lambda s: s.dropna(), lambda p: p.dropna()),
    ("head5", lambda s: s.head(5), lambda p: p.head(5)),
    ("tail4", lambda s: s.tail(4), lambda p: p.tail(4)),
    ("abs", lambda s: s.abs(), lambda p: p.abs()),
    ("mul2", lambda s: s * 2.0, lambda p: p * 2.0),
    (
        # documented deviation: engine sort_index is pandas kind='stable'
        "sort_index",
        lambda s: s.sort_index(),
        lambda p: p.sort_index(kind="stable"),
    ),
    ("ffill", lambda s: s.ffill(), lambda p: p.ffill()),
]


def compare(label: str, s, pds) -> None:
    got = s.to_pandas()
    if len(got) != len(pds):
        FAILS.append(f"{label} len {len(got)} vs {len(pds)}")
        print(f"FAIL {label}: len {len(got)} vs {len(pds)}")
        return
    if not all(close(a, b) for a, b in zip(got.index, pds.index)):
        FAILS.append(f"{label} index")
        print(f"FAIL {label}: index {list(got.index)[:8]} vs {list(pds.index)[:8]}")
        return
    if not all(close(a, b) for a, b in zip(got.values, pds.values)):
        FAILS.append(f"{label} values")
        print(
            f"FAIL {label}:\n  got  {list(got.values)[:8]}\n  want {list(pds.values)[:8]}"
        )
        return
    print(f"ok   {label}")


def main() -> None:
    seeds = [int(x) for x in sys.argv[1:]] or [3, 17]
    spark = get_spark()
    for seed in seeds:
        rng = random.Random(seed)
        for trial in range(25):
            s, pds, shape = make_series(rng, spark)
            chain = [rng.randrange(len(OPS)) for _ in range(rng.choice((2, 3)))]
            label = f"[{seed}:{trial}:{shape}] " + ">".join(
                OPS[i][0] for i in chain
            )
            try:
                for i in chain:
                    s = OPS[i][1](s)
                ok_engine = True
            except Exception as exc:  # noqa: BLE001
                ok_engine = False
                engine_exc = exc
            try:
                for i in chain:
                    pds = OPS[i][2](pds)
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
            compare(label, s, pds)
    print()
    print(f"{len(FAILS)} failures")
    for f in FAILS:
        print("  -", f)


if __name__ == "__main__":
    main()
