"""Round-11 probe batch 3: BINOP and WINDOW outputs as chain links.

Seams: (a) aligned-binop outputs feeding sorts / positional ops /
further binops (the new conditional sorted-union order under
composition), (b) rolling/expanding/diff/pct_change outputs feeding
merges and sorts, (c) where/mask/clip/combine_first chains,
(d) concat(axis=1) outputs feeding chains.

Deterministic enumeration, compared to pandas after the WHOLE chain.

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r11_binop_window_chains.py
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pontem_spark.core import Series
from pontem_spark.core.frame import DataFrame, concat
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
    return str(a) == str(b)


def compare(label: str, got_obj, want) -> None:
    try:
        got = got_obj.to_pandas() if not isinstance(got_obj, (pd.DataFrame, pd.Series)) else got_obj
    except Exception as exc:  # noqa: BLE001
        FAILS.append(f"{label} engine raised {exc}")
        print(f"FAIL {label}: engine raised {type(exc).__name__}: {exc}")
        return
    if isinstance(want, pd.Series):
        got = got.to_frame("_s") if isinstance(got, pd.Series) else got
        want = want.to_frame("_s")
        got.columns = ["_s"]
    if list(got.columns) != list(want.columns):
        FAILS.append(f"{label} cols")
        print(f"FAIL {label}: columns {list(got.columns)} vs {list(want.columns)}")
        return
    if len(got) != len(want):
        FAILS.append(f"{label} len")
        print(f"FAIL {label}: len {len(got)} vs {len(want)}")
        return
    if not all(close(a, b) for a, b in zip(got.index, want.index)):
        FAILS.append(f"{label} index")
        print(f"FAIL {label}: index {list(got.index)[:8]} vs {list(want.index)[:8]}")
        return
    for c in got.columns:
        if not all(close(a, b) for a, b in zip(got[c], want[c])):
            FAILS.append(f"{label} col {c}")
            print(
                f"FAIL {label}: col {c}\n  got  {list(got[c])[:8]}\n  want {list(want[c])[:8]}"
            )
            return
    print(f"ok   {label}")


def main() -> None:
    get_spark()

    # ---- (a) binop outputs as chain links ----------------------------------
    pl = pd.Series([5.0, 1.0, 3.0, 7.0], index=[10, 20, 30, 40]).sort_values()
    pr = pd.Series([1.0, 2.0, 3.0, 4.0, 5.0], index=[10, 20, 30, 40, 50])
    gl = Series([5.0, 1.0, 3.0, 7.0], index=[10, 20, 30, 40]).sort_values()
    gr = Series([1.0, 2.0, 3.0, 4.0, 5.0], index=[10, 20, 30, 40, 50])

    compare("binop>cumsum", (gl + gr).cumsum(), (pl + pr).cumsum())
    compare("binop>shift", (gl + gr).shift(1), (pl + pr).shift(1))
    compare("binop>sort_values", (gl + gr).sort_values(), (pl + pr).sort_values())
    compare("binop>dropna>rank", (gl + gr).dropna().rank(), (pl + pr).dropna().rank())
    compare(
        "binop>fillna>diff", (gl + gr).fillna(0.0).diff(), (pl + pr).fillna(0.0).diff()
    )
    compare("binop>head3", (gl + gr).head(3), (pl + pr).head(3))
    compare("binop>iloc_rev", (gl + gr).iloc[::-1], (pl + pr).iloc[::-1])

    # matched binop output keeps order through chains
    pr2 = pd.Series([9.0, 9.0, 9.0, 9.0], index=[10, 20, 30, 40])
    gr2 = Series([9.0, 9.0, 9.0, 9.0], index=[10, 20, 30, 40])
    compare("binop_matched>cumsum", (gl * gr2).cumsum(), (pl * pr2).cumsum())
    compare(
        "binop_matched>rolling2",
        (gl * gr2).rolling(2).mean(),
        (pl * pr2).rolling(2).mean(),
    )

    # ---- (b) window outputs feeding chains ---------------------------------
    ps = pd.Series([4.0, None, 2.0, 8.0, 6.0], index=[1, 2, 3, 4, 5])
    gs = Series([4.0, None, 2.0, 8.0, 6.0], index=[1, 2, 3, 4, 5])
    compare(
        "rolling>sort_values",
        gs.rolling(2).mean().sort_values(),
        ps.rolling(2).mean().sort_values(),
    )
    compare(
        "rolling>dropna>cumsum",
        gs.rolling(2).mean().dropna().cumsum(),
        ps.rolling(2).mean().dropna().cumsum(),
    )
    compare(
        "expanding>diff>fillna",
        gs.expanding().sum().diff().fillna(-1.0),
        ps.expanding().sum().diff().fillna(-1.0),
    )
    compare(
        "pct_change>clip",
        gs.pct_change().clip(upper=1.0),
        ps.pct_change().clip(upper=1.0),
    )
    compare(
        "diff>binop_self",
        gs.diff() + gs,
        ps.diff() + ps,
    )

    # window output into a frame and merged
    pf = pd.DataFrame({"k": [1, 2, 3, 4, 5], "roll": ps.rolling(2).mean().values})
    gfr = gs.rolling(2).mean()
    gf = DataFrame({"k": [1, 2, 3, 4, 5], "roll": gfr.to_pandas().tolist()})
    right_p = pd.DataFrame({"k": [2, 3, 4], "tag": ["a", "b", "c"]})
    right_g = DataFrame({"k": [2, 3, 4], "tag": ["a", "b", "c"]})
    compare(
        "rolling>merge>renum",
        gf.merge(right_g, on="k").reset_index(drop=True),
        pf.merge(right_p, on="k").reset_index(drop=True),
    )

    # ---- (c) where/mask/clip/combine_first chains --------------------------
    compare(
        "where>fillna>cumsum",
        gs.where(gs > 3.0).fillna(0.0).cumsum(),
        ps.where(ps > 3.0).fillna(0.0).cumsum(),
    )
    compare(
        "mask>clip>rank",
        gs.mask(gs > 6.0).clip(lower=3.0).rank(),
        ps.mask(ps > 6.0).clip(lower=3.0).rank(),
    )
    po = pd.Series([None, 1.0, None, 2.0, None], index=[1, 2, 3, 4, 5])
    go = Series([None, 1.0, None, 2.0, None], index=[1, 2, 3, 4, 5])
    compare(
        "combine_first>sort_values",
        gs.combine_first(go).sort_values(),
        ps.combine_first(po).sort_values(),
    )
    compare(
        "combine_first>binop",
        gs.combine_first(go) * 2 + 1,
        ps.combine_first(po) * 2 + 1,
    )

    # ---- (d) concat(axis=1) outputs feeding chains -------------------------
    pa = pd.DataFrame({"x": [1.0, 2.0, 3.0]})
    pb = pd.DataFrame({"y": [10.0, 20.0, 30.0]})
    ga = DataFrame(pa)
    gb = DataFrame(pb)
    pc2 = pd.concat([pa, pb], axis=1)
    gc2 = concat([ga, gb], axis=1)
    compare("concat1>sort_desc", gc2.sort_values("x", ascending=False), pc2.sort_values("x", ascending=False))
    compare(
        "concat1>assign>filter",
        gc2.assign(z=gc2["x"] + gc2["y"])[gc2["x"] > 1.0],
        pc2.assign(z=pc2["x"] + pc2["y"])[pc2["x"] > 1.0],
    )

    print()
    if FAILS:
        print(f"{len(FAILS)} FAILURES")
        for f in FAILS:
            print(" -", f)
        raise SystemExit(1)
    print("all clean")


if __name__ == "__main__":
    main()
