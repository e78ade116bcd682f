"""Round-11 probe batch 5: APPLY/MAP/ASTYPE/REPLACE outputs as chain
links, plus str/dt accessors on DERIVED (sorted/filtered/masked) series.

Deterministic enumeration, compared to pandas after the WHOLE chain.

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r11_apply_astype_chains.py
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pontem_spark.core import Series
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
    return str(a) == str(b)


def compare(label: str, got_obj, want) -> None:
    try:
        got = (
            got_obj.to_pandas()
            if not isinstance(got_obj, (pd.DataFrame, pd.Series))
            else got_obj
        )
    except Exception as exc:  # noqa: BLE001
        FAILS.append(f"{label} engine raised {exc}")
        print(f"FAIL {label}: engine raised {type(exc).__name__}: {exc}")
        return
    if isinstance(want, pd.Series):
        got = got.to_frame("_s") if isinstance(got, pd.Series) else got
        want = want.to_frame("_s")
        got.columns = ["_s"]
    if list(map(str, got.columns)) != list(map(str, want.columns)):
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

    ps = pd.Series([4.0, 1.0, 3.0, 2.0], index=[3, 1, 4, 2])
    gs = Series([4.0, 1.0, 3.0, 2.0], index=[3, 1, 4, 2])

    # apply/map outputs feeding positional ops on a SORTED base
    compare(
        "sort>apply>cumsum",
        gs.sort_values().apply(lambda x: x * 2).cumsum(),
        ps.sort_values().apply(lambda x: x * 2).cumsum(),
    )
    compare(
        "sort>map_dict>fillna",
        gs.sort_values().map({1.0: 10.0, 3.0: 30.0}).fillna(-1.0),
        ps.sort_values().map({1.0: 10.0, 3.0: 30.0}).fillna(-1.0),
    )
    compare(
        "map>astype_int>shift",
        gs.map(lambda x: x + 0.5).astype(int).shift(1),
        ps.map(lambda x: x + 0.5).astype(int).shift(1),
    )

    # astype/replace chains on derived series
    compare(
        "astype_str>replace>rank",
        gs.astype(int).astype(str).replace("3", "9").rank(),
        ps.astype(int).astype(str).replace("3", "9").rank(),
    )
    compare(
        "replace_dict>sort_values",
        gs.replace({4.0: 0.0, 2.0: 5.0}).sort_values(),
        ps.replace({4.0: 0.0, 2.0: 5.0}).sort_values(),
    )
    compare(
        "filter>astype>binop",
        gs[gs > 1.5].astype(int) * 3,
        ps[ps > 1.5].astype(int) * 3,
    )

    # str accessor on derived series
    pt = pd.Series(["b-2", "a-1", "c-3", None], index=[2, 1, 3, 4])
    gt = Series(["b-2", "a-1", "c-3", None], index=[2, 1, 3, 4])
    compare(
        "sort>str_upper>fillna",
        gt.sort_index().str.upper().fillna("NA"),
        pt.sort_index().str.upper().fillna("NA"),
    )
    compare(
        "dropna>str_split>explode",
        gt.dropna().str.split("-").explode(),
        pt.dropna().str.split("-").explode(),
    )
    compare(
        "mask>str_len",
        gt.mask(gt == "c-3").str.len(),
        pt.mask(pt == "c-3").str.len().astype("float64"),
    )

    # dt accessor on derived series
    ts = pd.to_datetime(["2024-03-05", "2024-01-02", "2024-02-10"])
    pdt = pd.Series(ts, index=[2, 0, 1])
    gdt = Series(ts, index=[2, 0, 1])
    compare(
        "sort_vals>dt_month>cumsum",
        gdt.sort_values().dt.month.cumsum(),
        pdt.sort_values().dt.month.astype("int64").cumsum(),
    )
    compare(
        "dt_day>rank",
        gdt.dt.day.rank(),
        pdt.dt.day.rank(),
    )

    # to_frame bridging into frame chains
    compare(
        "sorted>to_frame>assign",
        (lambda f: f.assign(d=f["v"] * 2))(gs.sort_values().to_frame("v")),
        (lambda f: f.assign(d=f["v"] * 2))(ps.sort_values().to_frame("v")),
    )

    # frame apply-ish: column assignment from mapped columns on a filtered frame
    pf = pd.DataFrame({"a": [3.0, 1.0, 2.0], "b": ["x", "y", "x"]})
    gf = DataFrame(pf)
    pff = pf[pf["a"] > 1.0]
    gff = gf[gf["a"] > 1.0]
    compare(
        "filter>map_col>sort",
        gff.assign(m=gff["b"].map({"x": 1, "y": 2})).sort_values("a"),
        pff.assign(m=pff["b"].map({"x": 1, "y": 2})).sort_values("a"),
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
