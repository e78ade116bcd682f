"""Round-13 probe: random chains through the NEW same-anchor positional
machinery — shift/cumsum/diff/pct_change/ffill/bfill/rolling/expanding
fast paths, _mat_pair hops, the stable sort_values tie-break, and binops
between two independently derived chains of one root (the aligner seams)
— all over duplicate-label, NaN-bearing, non-monotonic ctor Series.

pandas note: chains involving sort_values compare against pandas
kind='stable' (the engine's documented tie contract; pandas' quicksort
intra-tie order is an artifact).

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r13_positional_chains.py [seed ...]
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
        if math.isinf(float(a)) or math.isinf(float(b)):
            return float(a) == float(b)
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def same(label: str, ps: pd.Series, es) -> None:
    try:
        g = es.to_pandas()
    except Exception as exc:  # noqa: BLE001
        FAILS.append(f"{label}: engine raised {type(exc).__name__}: {str(exc)[:120]}")
        return
    if len(g) != len(ps):
        FAILS.append(f"{label}: len {len(g)} != {len(ps)}")
        return
    def _positional_ok() -> bool:
        if list(g.index) != list(ps.index):
            return False
        return all(close(a, b) for a, b in zip(ps.values, g.values))

    if _positional_ok():
        return
    # duplicate-label alignment results: pandas orders the per-label
    # cartesian left-major; the engine's distributed join leaves the
    # intra-label order unspecified (ledgered) — compare sorted pairs
    if ps.index.has_duplicates:
        def key(items):
            return sorted(
                (i, -9e18 if pd.isna(v) else round(float(v), 9))
                for i, v in items
            )

        if key(ps.items()) == key(g.items()):
            return
    FAILS.append(
        f"{label}:\n  pandas: {list(ps.items())}\n  engine: {list(g.items())}"
    )


# (name, pandas_fn, engine_fn) — unary, row-preserving
UNARY = [
    ("shift1", lambda s: s.shift(1), lambda s: s.shift(1)),
    ("shift-1", lambda s: s.shift(-1), lambda s: s.shift(-1)),
    ("cumsum", lambda s: s.cumsum(), lambda s: s.cumsum()),
    ("cummax", lambda s: s.cummax(), lambda s: s.cummax()),
    ("diff", lambda s: s.diff(), lambda s: s.diff()),
    (
        "pct",
        lambda s: s.pct_change(fill_method=None),
        lambda s: s.pct_change(fill_method=None),
    ),
    ("ffill", lambda s: s.ffill(), lambda s: s.ffill()),
    ("bfill", lambda s: s.bfill(), lambda s: s.bfill()),
    ("roll2mean", lambda s: s.rolling(2).mean(), lambda s: s.rolling(2).mean()),
    (
        "roll3sum",
        lambda s: s.rolling(3, min_periods=1).sum(),
        lambda s: s.rolling(3, min_periods=1).sum(),
    ),
    ("expmean", lambda s: s.expanding(1).mean(), lambda s: s.expanding(1).mean()),
    (
        "sortv",
        lambda s: s.sort_values(kind="stable"),
        lambda s: s.sort_values(),
    ),
    (
        "sortvd",
        lambda s: s.sort_values(ascending=False, kind="stable"),
        lambda s: s.sort_values(ascending=False),
    ),
    ("sorti", lambda s: s.sort_index(kind="stable"), lambda s: s.sort_index()),
    ("abs", lambda s: s.abs(), lambda s: s.abs()),
    ("interp", lambda s: s.interpolate(), lambda s: s.interpolate()),
    ("fill0", lambda s: s.fillna(0.0), lambda s: s.fillna(0.0)),
    (
        "rankavg",
        lambda s: s.rank(),
        lambda s: s.rank(),
    ),
]

BINOP = [
    ("add", lambda a, b: a + b),
    ("sub", lambda a, b: a - b),
    ("mul", lambda a, b: a * b),
    ("div", lambda a, b: a / b),
    ("gt", lambda a, b: a > b),
]


def run_seed(seed: int) -> None:
    rng = random.Random(seed)
    spark = get_spark()
    n = rng.randint(4, 9)
    vals = [
        None if rng.random() < 0.2 else round(rng.uniform(-5, 5), 2)
        for _ in range(n)
    ]
    # duplicate-label pools, sometimes non-monotonic
    pool = [1, 1, 2, 2, 3] if rng.random() < 0.5 else [7, 3, 3, 9, 1]
    idx = [pool[rng.randrange(len(pool))] for _ in range(n)]
    ps = pd.Series(vals, index=idx, dtype="float64")
    es = Series(vals, index=idx, spark=spark)

    # chain 1: k unary ops
    k = rng.randint(1, 3)
    chain = [UNARY[rng.randrange(len(UNARY))] for _ in range(k)]
    label = f"seed{seed}:" + ">".join(c[0] for c in chain)
    p, e = ps, es
    try:
        for _, pf, _ in chain:
            p = pf(p)
    except Exception:
        return  # pandas itself refuses; nothing to compare
    for _, _, ef in chain:
        e = ef(e)
    same(label, p, e)

    # chain 2: binop between two derivations of the same root
    u1 = UNARY[rng.randrange(len(UNARY))]
    u2 = UNARY[rng.randrange(len(UNARY))]
    op = BINOP[rng.randrange(len(BINOP))]
    label2 = f"seed{seed}:{u1[0]}({op[0]}){u2[0]}"
    try:
        p2 = op[1](u1[1](ps), u2[1](ps))
    except Exception:
        return
    e2 = op[1](u1[2](es), u2[2](es))
    same(label2, p2, e2)


def main() -> None:
    seeds = [int(a) for a in sys.argv[1:]] or list(range(60))
    for s in seeds:
        run_seed(s)
    if FAILS:
        print(f"{len(FAILS)} FAILURES")
        for f in FAILS:
            print("-", f)
        sys.exit(1)
    print(f"clean sweep over {len(seeds)} seeds")


if __name__ == "__main__":
    main()
