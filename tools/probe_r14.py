"""Round-14 probe: measure pandas 2.x ground truth vs the engine on the
frame-alignment seams named by the r13 judge + advisor BEFORE fixing.

Run:  python tools/probe_r14.py
"""
from __future__ import annotations

import sys
import traceback

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from pontem_spark.session import get_spark
from pontem_spark.core import DataFrame as PFrame, Series

spark = get_spark(app_name="probe-r14", master="local[4]", shuffle_partitions=4)

PASS, FAIL = [], []


def check(name, fn_pd, fn_en):
    """Run pandas + engine, compare results or exception classes/messages."""
    try:
        pres, perr = fn_pd(), None
    except Exception as e:  # noqa: BLE001
        pres, perr = None, e
    try:
        eres, eerr = fn_en(), None
        if hasattr(eres, "to_pandas"):
            eres = eres.to_pandas()
    except Exception as e:  # noqa: BLE001
        eres, eerr = None, e
    if perr is not None or eerr is not None:
        ok = (
            perr is not None
            and eerr is not None
            and type(perr).__name__ == type(eerr).__name__
        )
        msg = f"pandas={type(perr).__name__ if perr else 'OK'}:{str(perr)[:90]} | engine={type(eerr).__name__ if eerr else 'OK'}:{str(eerr)[:130]}"
    else:
        try:
            if isinstance(pres, pd.DataFrame):
                pd.testing.assert_frame_equal(
                    eres, pres, check_dtype=False, check_exact=False, rtol=1e-9
                )
            else:
                pd.testing.assert_series_equal(
                    eres, pres, check_dtype=False, check_exact=False, rtol=1e-9, check_names=False
                )
            ok, msg = True, "equal"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"MISMATCH: {str(e)[:300]}\n  pandas:\n{pres}\n  engine:\n{eres}"
    (PASS if ok else FAIL).append(name)
    print(("PASS " if ok else "FAIL ") + name + " :: " + msg)


NANDATA = {"x": [1.0, float("nan"), 3.0], "y": [4.0, 5.0, float("nan")]}
IDX = [3, 1, 2]


def P(d, i=None):
    return pd.DataFrame(d, index=i) if i is not None else pd.DataFrame(d)


def E(d, i=None):
    return PFrame(d, index=i, spark=spark) if i is not None else PFrame(d, spark=spark)


# ---- ADVICE high: cross-anchor dtype/missing resolution ----------------
check(
    "A1 cross-anchor eq of NaN cells",
    lambda: P(NANDATA, IDX).eq(P(NANDATA, IDX)),
    lambda: E(NANDATA, IDX).eq(E(NANDATA, IDX)),
)
check(
    "A2 cross-anchor ne of NaN cells",
    lambda: P(NANDATA, IDX).ne(P(NANDATA, IDX)),
    lambda: E(NANDATA, IDX).ne(E(NANDATA, IDX)),
)
check(
    "A3 cross-anchor fill_value fills NaN cells",
    lambda: P(NANDATA, IDX).add(P({"x": [1.0, 1.0, float("nan")], "y": [1.0, 1.0, 1.0]}, IDX), fill_value=0),
    lambda: E(NANDATA, IDX).add(E({"x": [1.0, 1.0, float("nan")], "y": [1.0, 1.0, 1.0]}, IDX), fill_value=0),
)
BOOL = {"b": [True, False, True]}
BOOL2 = {"b": [True, True, False]}
check(
    "A4 cross-anchor bool frame + (OR)",
    lambda: P(BOOL, IDX) + P(BOOL2, IDX),
    lambda: E(BOOL, IDX) + E(BOOL2, IDX),
)
check(
    "A5 cross-anchor bool frame * (AND)",
    lambda: P(BOOL, IDX) * P(BOOL2, IDX),
    lambda: E(BOOL, IDX) * E(BOOL2, IDX),
)
check(
    "A6 cross-anchor bool frame - raises",
    lambda: P(BOOL, IDX) - P(BOOL2, IDX),
    lambda: E(BOOL, IDX) - E(BOOL2, IDX),
)

# ---- ADVICE medium: comparison index mismatch --------------------------
check(
    "B1 comparison with different index labels raises",
    lambda: P(NANDATA, IDX).eq(P(NANDATA, [7, 8, 9])),
    lambda: E(NANDATA, IDX).eq(E(NANDATA, [7, 8, 9])).to_pandas(),
)
check(
    "B2 comparison with different index order raises",
    lambda: P(NANDATA, IDX).eq(P(NANDATA, [1, 2, 3])),
    lambda: E(NANDATA, IDX).eq(E(NANDATA, [1, 2, 3])).to_pandas(),
)
check(
    "B3 comparison with different lengths raises",
    lambda: P(NANDATA, IDX).eq(P({"x": [1.0], "y": [2.0]}, [3])),
    lambda: E(NANDATA, IDX).eq(E({"x": [1.0], "y": [2.0]}, [3])).to_pandas(),
)
check(
    "B4 dunder == with index mismatch raises too",
    lambda: P(NANDATA, IDX) == P(NANDATA, [7, 8, 9]),
    lambda: (E(NANDATA, IDX) == E(NANDATA, [7, 8, 9])).to_pandas(),
)
check(
    "B5 identical cross-anchor comparison still works",
    lambda: P(NANDATA, IDX) == P(NANDATA, IDX),
    lambda: (E(NANDATA, IDX) == E(NANDATA, IDX)).to_pandas(),
)

# ---- ADVICE low: fill_value + Series -----------------------------------
check(
    "C1 df.add(series, fill_value=0) raises NotImplementedError",
    lambda: P(NANDATA, IDX).add(pd.Series({"x": 1.0}), fill_value=0),
    lambda: E(NANDATA, IDX).add(Series({"x": 1.0}, spark=spark), fill_value=0),
)

# ---- verdict seam (a): chained cross-anchor ----------------------------
check(
    "D1 (f1+f2)+f3 values",
    lambda: (P(NANDATA, IDX) + P(NANDATA, IDX)) + P(NANDATA, IDX),
    lambda: (E(NANDATA, IDX) + E(NANDATA, IDX)) + E(NANDATA, IDX),
)

# ---- verdict seam (b): duplicate index labels both axes ----------------
DUP = [1, 1, 2]
check(
    "E1 frame+frame dup index labels (cartesian)",
    lambda: P({"x": [1.0, 2.0, 3.0]}, DUP) + P({"x": [10.0, 20.0, 30.0]}, [1, 2, 2]),
    lambda: E({"x": [1.0, 2.0, 3.0]}, DUP) + E({"x": [10.0, 20.0, 30.0]}, [1, 2, 2]),
)
check(
    "E2 frame+frame identical dup index sequences (positional)",
    lambda: P({"x": [1.0, 2.0, 3.0]}, DUP) + P({"x": [10.0, 20.0, 30.0]}, DUP),
    lambda: E({"x": [1.0, 2.0, 3.0]}, DUP) + E({"x": [10.0, 20.0, 30.0]}, DUP),
)

# ---- verdict seam (c): fill_value with string columns ------------------
check(
    "F1 string-col frame + frame (concat per cell)",
    lambda: P({"s": ["a", "b", "c"]}, IDX) + P({"s": ["x", "y", "z"]}, IDX),
    lambda: E({"s": ["a", "b", "c"]}, IDX) + E({"s": ["x", "y", "z"]}, IDX),
)
check(
    "F2 mixed str/num + fill_value one-sided column",
    lambda: P({"s": ["a", "b", "c"], "n": [1.0, 2.0, 3.0]}, IDX).add(P({"n": [1.0, 1.0, 1.0]}, IDX), fill_value=0),
    lambda: E({"s": ["a", "b", "c"], "n": [1.0, 2.0, 3.0]}, IDX).add(E({"n": [1.0, 1.0, 1.0]}, IDX), fill_value=0),
)

# ---- floordiv/mod/pow parity on frames ---------------------------------
NEG = {"x": [7.0, -7.0, 7.5], "y": [-3.0, 3.0, 0.0]}
check(
    "G1 frame % scalar negative-sign rule",
    lambda: P(NEG, IDX) % -3,
    lambda: E(NEG, IDX) % -3,
)
check(
    "G2 frame // scalar with NaN",
    lambda: P(NANDATA, IDX) // 2,
    lambda: E(NANDATA, IDX) // 2,
)
check(
    "G3 frame ** 0 with NaN (pandas=1.0)",
    lambda: P(NANDATA, IDX) ** 0,
    lambda: E(NANDATA, IDX) ** 0,
)
check(
    "G4 frame / 0 (inf/-inf/nan, no ANSI throw)",
    lambda: P(NEG, IDX) / 0,
    lambda: E(NEG, IDX) / 0,
)
check(
    "G5 frame % 0 -> NaN",
    lambda: P(NEG, IDX) % 0,
    lambda: E(NEG, IDX) % 0,
)
check(
    "G6 cross-anchor frame % frame negatives",
    lambda: P({"x": [7.0, -7.0, 8.0]}, IDX) % P({"x": [-3.0, 3.0, -5.0]}, IDX),
    lambda: E({"x": [7.0, -7.0, 8.0]}, IDX) % E({"x": [-3.0, 3.0, -5.0]}, IDX),
)
check(
    "G7 named floordiv fill_value",
    lambda: P(NANDATA, IDX).floordiv(P({"x": [2.0, 2.0, 2.0], "y": [2.0, 2.0, 2.0]}, IDX), fill_value=1),
    lambda: E(NANDATA, IDX).floordiv(E({"x": [2.0, 2.0, 2.0], "y": [2.0, 2.0, 2.0]}, IDX), fill_value=1),
)
check(
    "G8 named mod fill_value scalar",
    lambda: P(NANDATA, IDX).mod(3, fill_value=10),
    lambda: E(NANDATA, IDX).mod(3, fill_value=10),
)
check(
    "G9 named pow fill_value scalar",
    lambda: P(NANDATA, IDX).pow(2, fill_value=3),
    lambda: E(NANDATA, IDX).pow(2, fill_value=3),
)

# ---- verdict task 4: axis=0 broadcast ----------------------------------
S0 = pd.Series([10.0, 20.0, 30.0], index=IDX)
check(
    "H1 df.sub(series, axis=0)",
    lambda: P(NANDATA, IDX).sub(S0, axis=0),
    lambda: E(NANDATA, IDX).sub(Series([10.0, 20.0, 30.0], index=IDX, spark=spark), axis=0),
)
check(
    "H2 df.add(series, axis='index') partial index",
    lambda: P(NANDATA, IDX).add(pd.Series([10.0], index=[1]), axis="index"),
    lambda: E(NANDATA, IDX).add(Series([10.0], index=[1], spark=spark), axis="index"),
)
check(
    "H3 df.div(df['x'], axis=0) same-anchor",
    lambda: P(NANDATA, IDX).div(P(NANDATA, IDX)["x"], axis=0),
    lambda: (lambda ef: ef.div(ef["x"], axis=0))(E(NANDATA, IDX)),
)
check(
    "H4 df.mul(series, axis=1) explicit columns axis",
    lambda: P(NANDATA, IDX).mul(pd.Series({"x": 2.0, "y": 3.0}), axis=1),
    lambda: E(NANDATA, IDX).mul(Series({"x": 2.0, "y": 3.0}, spark=spark), axis=1),
)

# ---- plan shape: chained cross-anchor join count ------------------------
try:
    e1, e2, e3 = E(NANDATA, IDX), E(NANDATA, IDX), E(NANDATA, IDX)
    plan = ((e1 + e2) + e3)._materialized()._sc_jdf if False else None
except Exception:
    pass
try:
    chained = (E(NANDATA, IDX) + E(NANDATA, IDX)) + E(NANDATA, IDX)
    sdf = chained._materialized()
    txt = sdf._jdf.queryExecution().optimizedPlan().toString()
    njoin = txt.count("Join ")
    print(f"INFO chained (f1+f2)+f3 optimized plan has {njoin} joins")
except Exception:
    traceback.print_exc()

print(f"\n{len(PASS)} pass / {len(FAIL)} fail")
for f in FAIL:
    print("  FAIL:", f)
