"""Round-10 probe batch 4: merge/reshape randomized differentials.

Sweeps merge (NaN join keys — pandas MATCHES NaN with NaN where Spark's
NULL never equi-joins; multi-key; suffix collisions; all four hows),
stack/unstack with missing combos, where/mask with a cross-anchor cond,
and describe percentiles against pandas.

NOT collected by pytest (no test_ prefix); run manually:

    python tests/probe_r10_merge.py [seed ...]
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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].map(lambda v: "<NA>" if pd.isna(v) else str(v))
    return out.sort_values(cols).reset_index(drop=True)


def check_frame(label: str, got: pd.DataFrame, want: pd.DataFrame) -> None:
    g, w = canon(got), canon(want)
    ok = g.shape == w.shape and sorted(g.columns) == sorted(w.columns) and g.equals(w)
    if not ok:
        FAILS.append(label)
        print(f"FAIL {label}: got {g.shape} want {w.shape}")
        print("  got ", g.head(4).to_dict("list"))
        print("  want", w.head(4).to_dict("list"))
    else:
        print(f"ok   {label}")


def probe_merge(spark, seed: int) -> None:
    rng = random.Random(seed)

    def keyval():
        r = rng.random()
        if r < 0.15:
            return float("nan")
        return float(rng.randint(1, 5))

    la = pd.DataFrame({
        "k": [keyval() for _ in range(12)],
        "k2": [rng.choice(["x", "y"]) for _ in range(12)],
        "v": [round(rng.uniform(0, 9), 1) for _ in range(12)],
    })
    rb = pd.DataFrame({
        "k": [keyval() for _ in range(10)],
        "k2": [rng.choice(["x", "y"]) for _ in range(10)],
        "v": [round(rng.uniform(10, 19), 1) for _ in range(10)],
    })
    fa = DataFrame(la.to_dict("list"), spark=spark)
    fb = DataFrame(rb.to_dict("list"), spark=spark)
    for how in ("inner", "left", "right", "outer"):
        check_frame(
            f"seed{seed} merge k {how} (NaN keys)",
            fa.merge(fb, on="k", how=how).to_pandas(),
            la.merge(rb, on="k", how=how),
        )
        check_frame(
            f"seed{seed} merge multi {how}",
            fa.merge(fb, on=["k", "k2"], how=how).to_pandas(),
            la.merge(rb, on=["k", "k2"], how=how),
        )
    check_frame(
        f"seed{seed} merge suffixes",
        fa.merge(fb, on="k", how="inner", suffixes=("_L", "_R")).to_pandas(),
        la.merge(rb, on="k", how="inner", suffixes=("_L", "_R")),
    )


def probe_stack_unstack(spark, seed: int) -> None:
    rng = random.Random(seed + 400)
    rows = [(g, p) for g in ["a", "b", "c"] for p in ["p", "q"] if rng.random() < 0.8]
    data = {
        "g": [r[0] for r in rows],
        "p": [r[1] for r in rows],
        "v": [round(rng.uniform(0, 9), 1) for _ in rows],
    }
    wf = pd.DataFrame(data)
    df = DataFrame(data, spark=spark)
    wuns = wf.set_index(["g", "p"])["v"].unstack()
    guns = df.set_index(["g", "p"])["v"].unstack()
    check_frame(f"seed{seed} unstack", guns.to_pandas().reset_index(), wuns.reset_index())
    # round-trip: stack drops the missing combos again (pandas 2.x
    # future_stack keeps NaN? default dropna=True shape)
    wst = wuns.stack()
    gst = guns.stack()
    gp = gst.to_pandas().sort_index()
    wp = wst.sort_index()
    ok = len(gp) == len(wp) and all(
        abs(a - b) < 1e-9 for a, b in zip(gp.values, wp.values)
    ) and [tuple(map(str, t)) for t in gp.index] == [tuple(map(str, t)) for t in wp.index]
    if not ok:
        FAILS.append(f"seed{seed} stack roundtrip")
        print(f"FAIL seed{seed} stack roundtrip\n  got  {gp.to_dict()}\n  want {wp.to_dict()}")
    else:
        print(f"ok   seed{seed} stack roundtrip")


def probe_where_mask_cross(spark, seed: int) -> None:
    rng = random.Random(seed + 800)
    idx = list(range(15))
    vals = [round(rng.uniform(-5, 5), 1) for _ in idx]
    cidx = rng.sample(idx, 10) + [99]  # partial overlap + alien label
    cvals = [rng.random() < 0.5 for _ in cidx]
    w = pd.Series(vals, index=idx)
    wc = pd.Series(cvals, index=cidx)
    s = Series(vals, index=idx, spark=spark)
    sc = Series(cvals, index=cidx, spark=spark)
    for name, g, p in [
        ("where", s.where(sc, -1.0), w.where(wc, -1.0)),
        ("mask", s.mask(sc, -1.0), w.mask(wc, -1.0)),
    ]:
        got, want = g.to_pandas().sort_index(), p.sort_index()
        ok = got.index.tolist() == want.index.tolist() and all(
            (pd.isna(a) and pd.isna(b)) or abs(a - b) < 1e-9
            for a, b in zip(got.values, want.values)
        )
        if not ok:
            FAILS.append(f"seed{seed} {name} cross-anchor")
            print(f"FAIL seed{seed} {name} cross-anchor\n  got  {got.to_dict()}\n  want {want.to_dict()}")
        else:
            print(f"ok   seed{seed} {name} cross-anchor")


def probe_describe(spark, seed: int) -> None:
    rng = random.Random(seed + 1200)
    vals = [
        float("nan") if rng.random() < 0.1 else round(rng.uniform(-9, 9), 2)
        for _ in range(30)
    ]
    w = pd.Series(vals)
    s = Series(vals, spark=spark)
    got, want = s.describe(), w.describe()
    ok = list(got.index) == list(want.index) and all(
        (pd.isna(a) and pd.isna(b)) or abs(a - b) < 1e-6
        for a, b in zip(got.values, want.values)
    )
    if not ok:
        FAILS.append(f"seed{seed} describe")
        print(f"FAIL seed{seed} describe\n  got  {got.to_dict()}\n  want {want.to_dict()}")
    else:
        print(f"ok   seed{seed} describe")


def main() -> None:
    seeds = [int(a) for a in sys.argv[1:]] or [5, 31]
    spark = get_spark(app_name="probe-r10mg", master="local[8]", shuffle_partitions=8)
    for seed in seeds:
        probe_merge(spark, seed)
        probe_stack_unstack(spark, seed)
        probe_where_mask_cross(spark, seed)
        probe_describe(spark, seed)
    print(f"\n{len(FAILS)} failures: {FAILS}")


if __name__ == "__main__":
    main()
