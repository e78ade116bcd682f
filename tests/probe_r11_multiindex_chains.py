"""Round-11 probe batch 2: concat/merge → set_index → positional ops on
MultiIndex anchors (the third seam named in the r10 verdict).

Deterministic chain enumeration; each case compares to pandas after the
WHOLE chain — values, index tuples, column order. Merge-rooted chains go
through reset_index(drop=True) first (merge's fresh index is
non-contiguous rowids — documented deviation, frame.py::merge).

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r11_multiindex_chains.py
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd

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


def compare(label: str, df, pdf) -> None:
    try:
        got = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
    except Exception as exc:  # noqa: BLE001
        FAILS.append(f"{label} engine raised {exc}")
        print(f"FAIL {label}: engine raised {type(exc).__name__}: {exc}")
        return
    if list(got.columns) != list(pdf.columns):
        FAILS.append(f"{label} cols")
        print(f"FAIL {label}: columns {list(got.columns)} vs {list(pdf.columns)}")
        return
    if len(got) != len(pdf):
        FAILS.append(f"{label} len")
        print(f"FAIL {label}: len {len(got)} vs {len(pdf)}")
        return
    gi = [tuple(t) if isinstance(t, tuple) else t for t in got.index]
    wi = [tuple(t) if isinstance(t, tuple) else t for t in pdf.index]
    for a, b in zip(gi, wi):
        ta = a if isinstance(a, tuple) else (a,)
        tb = b if isinstance(b, tuple) else (b,)
        if len(ta) != len(tb) or not all(close(x, y) for x, y in zip(ta, tb)):
            FAILS.append(f"{label} index")
            print(f"FAIL {label}: index {gi[:6]} vs {wi[:6]}")
            return
    for c in got.columns:
        if not all(close(a, b) for a, b in zip(got[c], pdf[c])):
            FAILS.append(f"{label} col {c}")
            print(
                f"FAIL {label}: col {c}\n  got  {list(got[c])[:8]}\n  want {list(pdf[c])[:8]}"
            )
            return
    print(f"ok   {label}")


def halves():
    p1 = pd.DataFrame(
        {"a": ["x", "y", "x", "z"], "b": [3, 1, 2, 1], "v": [1.0, 2.0, None, 4.0]}
    )
    p2 = pd.DataFrame(
        {"a": ["y", "z", "x"], "b": [2, 3, 1], "v": [5.0, 6.0, 7.0]}
    )
    return DataFrame(p1), DataFrame(p2), p1.copy(), p2.copy()


def main() -> None:
    get_spark()

    # concat → set_index([a,b]) → sort_index → head/iloc
    d1, d2, p1, p2 = halves()
    dc = concat([d1, d2]).set_index(["a", "b"])
    pc = pd.concat([p1, p2]).set_index(["a", "b"])
    compare("concat>set_mi>sort_index", dc.sort_index(), pc.sort_index())
    compare("concat>set_mi>sort>head3", dc.sort_index().head(3), pc.sort_index().head(3))
    compare(
        "concat>set_mi>sort>iloc_rev",
        dc.sort_index().iloc[::-1],
        pc.sort_index().iloc[::-1],
    )
    compare(
        "concat>set_mi>sort>iloc_slice",
        dc.sort_index().iloc[1:5],
        pc.sort_index().iloc[1:5],
    )

    # concat → set_index → positional ops (shift/cumsum on the sorted frame)
    d1, d2, p1, p2 = halves()
    ds = concat([d1, d2]).set_index(["a", "b"]).sort_index()
    ps = pd.concat([p1, p2]).set_index(["a", "b"]).sort_index()
    compare(
        "concat>set_mi>sort>cumsum",
        ds.assign(cs=ds["v"].cumsum()),
        ps.assign(cs=ps["v"].cumsum()),
    )
    compare(
        "concat>set_mi>sort>shift",
        ds.assign(sh=ds["v"].shift(1)),
        ps.assign(sh=ps["v"].shift(1)),
    )

    # concat preserves input row order (no sort): positional ops on the raw concat
    d1, d2, p1, p2 = halves()
    dc = concat([d1, d2]).set_index(["a", "b"])
    pc = pd.concat([p1, p2]).set_index(["a", "b"])
    compare("concat>set_mi>cumsum_raw", dc.assign(cs=dc["v"].cumsum()), pc.assign(cs=pc["v"].cumsum()))
    compare("concat>set_mi>reset", dc.reset_index(), pc.reset_index())

    # merge → renumber → set_index(MI) → sort_index/iloc/unstack-ish
    d1, d2, p1, p2 = halves()
    dm = d1.merge(d2, on="a", suffixes=("_l", "_r")).reset_index(drop=True)
    pm = p1.merge(p2, on="a", suffixes=("_l", "_r")).reset_index(drop=True)
    compare("merge>renum", dm, pm)
    dmi = dm.set_index(["a", "b_l"])
    pmi = pm.set_index(["a", "b_l"])
    compare("merge>renum>set_mi>sort", dmi.sort_index(), pmi.sort_index())
    compare(
        "merge>renum>set_mi>sort>shift",
        dmi.sort_index().assign(sh=dmi.sort_index()["v_l"].shift(-1)),
        pmi.sort_index().assign(sh=pmi.sort_index()["v_l"].shift(-1)),
    )
    # sort keys must be UNIQUE here: engine sorts tie-break by index
    # (documented deviation), pandas by prior position — v_l is unique,
    # v_r duplicates across the merge fan-out
    compare(
        "merge>renum>set_mi>sort_values",
        dmi.sort_values("v_l"),
        pmi.sort_values("v_l"),
    )
    compare(
        "merge>renum>set_mi>nlargest",
        dmi.nlargest(3, "v_l"),
        pmi.nlargest(3, "v_l"),
    )

    # MultiIndex anchor driving groupby after the chain
    d1, d2, p1, p2 = halves()
    dg = (
        concat([d1, d2])
        .set_index(["a", "b"])
        .sort_index()
        .groupby("a")
        .agg({"v": "sum"})
    )
    pg = (
        pd.concat([p1, p2])
        .set_index(["a", "b"])
        .sort_index()
        .groupby("a")
        .agg({"v": "sum"})
    )
    compare("concat>set_mi>sort>gagg", dg.sort_index(), pg.sort_index())

    print()
    if FAILS:
        print(f"{len(FAILS)} FAILURES")
        for f in FAILS:
            print(" -", f)
        raise SystemExit(1)
    print("all clean")


if __name__ == "__main__":
    main()
