"""Round-12 probe batch 1: the construction-order spec (``__ctor__``)
driven through CONCAT / MERGE / SET_INDEX chains — fresh machinery from
r11 batch 5 (non-monotonic) and the r12 ADVICE gate (monotonic with
duplicate labels); the r11 sweep only exercised single-frame chains.

Frames are built with one of three index shapes per trial: shuffled
unique, monotonic-with-duplicates, or shuffled-with-duplicates. Chains
mix structural ops (concat with a second frame, merge on a key,
set_index/reset_index) with positional ops (cumsum/shift/head) whose
results expose any lost construction order.

Same harness discipline as probe_r10_compose: whole-chain comparison of
values, index, and column order; unique sort keys (pandas tie order is a
documented deviation).

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r12_ctor_chains.py [seed ...]
"""
from __future__ import annotations

import math
import random
import sys

import numpy as np
import pandas as pd

from pontem_spark.core import concat as pt_concat
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
        base = sorted(rng.choices(range(100, 100 + n), k=n))
        return base, shape
    base = rng.choices(range(100, 100 + n), k=n)
    return base, shape


def make_frame(rng: random.Random):
    n = rng.randint(6, 12)
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


def make_second(rng: random.Random):
    """A smaller second frame for concat/merge, same columns."""
    n = rng.randint(3, 6)
    u = [x + 0.25 for x in rng.sample(range(60, 120), n)]
    v = [round(rng.uniform(-5, 5), 1) for _ in range(n)]
    k = [rng.choice("xy") for _ in range(n)]
    idx, _ = make_index(rng, n)
    pdf = pd.DataFrame({"u": u, "v": v, "k": k}, index=idx).astype({"v": "float64"})
    df = DataFrame({"u": u, "v": v, "k": k}, index=idx)
    return df, pdf


def ops(second):
    d2, p2 = second
    return [
        ("concat2", lambda d: pt_concat([d, d2]), lambda p: pd.concat([p, p2])),
        (
            # documented deviation: merge renumbers the RangeIndex only
            # via an explicit reset_index (pandas does it implicitly)
            "merge_k",
            lambda d: d.merge(
                DataFrame({"k": ["x", "y"], "kw": [10.0, 20.0]}), on="k"
            ).reset_index(drop=True),
            lambda p: p.merge(
                pd.DataFrame({"k": ["x", "y"], "kw": [10.0, 20.0]}), on="k"
            ).reset_index(drop=True),
        ),
        (
            "set_index_u",
            lambda d: d.set_index("u"),
            lambda p: p.set_index("u"),
        ),
        (
            "reset_index",
            lambda d: d.reset_index(drop=True),
            lambda p: p.reset_index(drop=True),
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
        ("head5", lambda d: d.head(5), lambda p: p.head(5)),
        ("tail4", lambda d: d.tail(4), lambda p: p.tail(4)),
        ("sort_u", lambda d: d.sort_values("u"), lambda p: p.sort_values("u")),
        (
            # documented deviation: the engine's sort_index is pandas'
            # kind='stable' order (the quicksort default's intra-tie
            # order is a partitioning artifact, not a contract)
            "sort_index",
            lambda d: d.sort_index(),
            lambda p: p.sort_index(kind="stable"),
        ),
        ("fillna0", lambda d: d.fillna(0.0), lambda p: p.fillna(0.0)),
        (
            "filter_pos",
            lambda d: d[d["u"] > -20.0],
            lambda p: p[p["u"] > -20.0],
        ),
        (
            "g_cumsum",
            lambda d: d.assign(gc=d.groupby("k")["u"].cumsum())
            if "k" in d.columns
            else d,
            lambda p: p.assign(gc=p.groupby("k")["u"].cumsum())
            if "k" in p.columns
            else p,
        ),
    ]


def _label_multisets(frame: pd.DataFrame):
    groups: dict = {}
    for i in range(len(frame)):
        groups.setdefault(frame.index[i], []).append(
            tuple(str(v) for v in frame.iloc[i])
        )
    return {k: sorted(v) for k, v in groups.items()}


def compare(label: str, df, pdf, tie_ok: bool = False) -> None:
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
            # documented deviation: pandas' default sort_index kind is
            # QUICKSORT (unstable) — intra-duplicate-label order is a
            # partitioning artifact; the engine is deterministically
            # stable. For sort_index chains, compare each label's rows
            # as a multiset instead (values still must match exactly —
            # a wrong cumsum/shift still fails).
            if tie_ok and _label_multisets(got) == _label_multisets(pdf):
                print(f"ok   {label} (intra-tie order: documented deviation)")
                return
            FAILS.append(f"{label} col {c}")
            print(
                f"FAIL {label}: col {c}\n  got  {list(got[c])[:8]}\n  want {list(pdf[c])[:8]}"
            )
            return
    print(f"ok   {label}")


def main() -> None:
    seeds = [int(s) for s in sys.argv[1:]] or [7, 31]
    get_spark()
    for seed in seeds:
        rng = random.Random(seed)
        for trial in range(25):
            df, pdf, shape = make_frame(rng)
            OPS = ops(make_second(rng))
            chain = [rng.randrange(len(OPS)) for _ in range(rng.choice((2, 3)))]
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
