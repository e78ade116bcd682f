"""Round-11 probe batch 1: GROUPBY and ACCESSOR outputs as chain links.

The r10 sweeps covered Series→Series and frame op-chains; this batch
drives the two untested seams named in the r10 verdict:
  (a) groupby outputs as chain links — groupby().transform / .agg →
      sort / filter / positional-op → merge,
  (b) accessor outputs — str.extract / str.partition frames and
      dt-derived columns feeding window / merge chains.

Deterministic chain enumeration (not randomized): each case is a named
composition compared to pandas after the WHOLE chain — values, index,
column order.

NOT collected by pytest (no test_ prefix); run manually:

    python tests/probe_r11_groupby_accessor.py
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


def compare(label: str, df, pdf) -> None:
    try:
        got = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
    except Exception as exc:  # noqa: BLE001
        FAILS.append(f"{label} engine raised {exc}")
        print(f"FAIL {label}: engine raised {type(exc).__name__}: {exc}")
        return
    if isinstance(got, pd.Series):
        got = got.to_frame("_s")
        pdf = pdf.to_frame("_s")
    if list(got.columns) != list(pdf.columns):
        FAILS.append(f"{label} cols")
        print(f"FAIL {label}: columns {list(got.columns)} vs {list(pdf.columns)}")
        return
    if len(got) != len(pdf):
        FAILS.append(f"{label} len {len(got)} != {len(pdf)}")
        print(f"FAIL {label}: len {len(got)} vs {len(pdf)}")
        return
    gi, wi = list(got.index), list(pdf.index)
    if not all(close(a, b) for a, b in zip(gi, wi)):
        FAILS.append(f"{label} index")
        print(f"FAIL {label}: index {gi[:8]} vs {wi[:8]}")
        return
    for c in got.columns:
        if not all(close(a, b) for a, b in zip(got[c], pdf[c])):
            FAILS.append(f"{label} col {c}")
            print(
                f"FAIL {label}: col {c}\n  got  {list(got[c])[:8]}\n  want {list(pdf[c])[:8]}"
            )
            return
    print(f"ok   {label}")


def base():
    pdf = pd.DataFrame(
        {
            "k": ["x", "y", "x", "z", "y", "x", "z", "y"],
            "u": [7.5, -3.5, 12.5, 0.5, 9.5, -8.5, 4.5, 2.5],
            "v": [1.0, None, 3.0, 4.0, None, 6.0, 7.0, 8.0],
        }
    )
    return DataFrame(pdf), pdf.copy()


def base_str():
    vals = [
        "alpha-10",
        "beta-7",
        None,
        "gamma-3",
        "alpha-22",
        "delta-1",
        "beta-15",
    ]
    return (
        DataFrame(pd.DataFrame({"s": vals, "w": [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]})),
        pd.DataFrame({"s": vals, "w": [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]}),
    )


def base_dt():
    ts = pd.to_datetime(
        [
            "2024-01-01 10:00",
            "2024-01-03 11:30",
            "2024-01-02 09:15",
            "2024-01-06 22:00",
            "2024-01-04 16:45",
            "2024-01-07 03:30",
        ]
    )
    pdf = pd.DataFrame({"ts": ts, "amt": [5.0, 2.0, 8.0, 1.0, 9.0, 4.0]})
    return DataFrame(pdf), pdf.copy()


def main() -> None:
    get_spark()

    # ---- (a) groupby outputs as chain links --------------------------------

    d, p = base()
    compare(
        "transform_mean>sort",
        d.assign(m=d.groupby("k")["v"].transform("mean")).sort_values("u"),
        p.assign(m=p.groupby("k")["v"].transform("mean")).sort_values("u"),
    )

    d, p = base()
    dd = d.assign(m=d.groupby("k")["v"].transform("mean")).sort_values("u")
    pp = p.assign(m=p.groupby("k")["v"].transform("mean")).sort_values("u")
    compare("transform>sort>cumsum_m", dd.assign(cs=dd["m"].cumsum()), pp.assign(cs=pp["m"].cumsum()))

    d, p = base()
    dd = d.assign(m=d.groupby("k")["u"].transform("max"))
    pp = p.assign(m=p.groupby("k")["u"].transform("max"))
    compare(
        "transform_max>filter>shift",
        dd[dd["m"] > 0].assign(sh=dd[dd["m"] > 0]["u"].shift(1)),
        pp[pp["m"] > 0].assign(sh=pp[pp["m"] > 0]["u"].shift(1)),
    )

    d, p = base()
    da = d.groupby("k").agg({"v": "mean", "u": "sum"})
    pa = p.groupby("k").agg({"v": "mean", "u": "sum"})
    compare("gagg>sort_values", da.sort_values("u"), pa.sort_values("u"))
    compare("gagg>sort_index>head2", da.sort_index().head(2), pa.sort_index().head(2))

    # merge's fresh index is non-contiguous rowids (documented deviation —
    # frame.py::merge docstring), so merge chains compare after
    # reset_index(drop=True), which also drives the distributed enumeration
    d, p = base()
    da = d.groupby("k").agg({"u": "mean"}).reset_index()
    pa = p.groupby("k").agg({"u": "mean"}).reset_index()
    m = d.merge(da, on="k", suffixes=("", "_gm")).reset_index(drop=True)
    mp = p.merge(pa, on="k", suffixes=("", "_gm")).reset_index(drop=True)
    compare("gagg>reset>merge_back>renum", m, mp)
    compare(
        "gagg>reset>merge>renum>sort>rank",
        m.sort_values("u").assign(r=m.sort_values("u")["u_gm"].rank()),
        mp.sort_values("u").assign(r=mp.sort_values("u")["u_gm"].rank()),
    )

    d, p = base()
    dt_ = d.groupby("k").transform({"v": "mean"})
    pt_ = p.copy()
    pt_["v"] = p.groupby("k")["v"].transform("mean")
    compare("frame_transform>sort>iloc_rev", dt_.sort_values("u").iloc[::-1], pt_.sort_values("u").iloc[::-1])

    d, p = base()
    dd = d.assign(gc=d.groupby("k")["u"].cumsum()).sort_values("gc")
    pp = p.assign(gc=p.groupby("k")["u"].cumsum()).sort_values("gc")
    compare("gcumsum>sort>nlargest", dd.nlargest(4, "gc"), pp.nlargest(4, "gc"))

    d, p = base()
    da = d.groupby("k").agg({"u": ["sum", "mean"]})
    pa = p.groupby("k").agg({"u": ["sum", "mean"]})
    pa.columns = ["u_sum", "u_mean"]
    compare("gagg_multi>sort_values", da.sort_values("u_sum"), pa.sort_values("u_sum"))

    # ---- (b) accessor outputs feeding chains -------------------------------

    d, p = base_str()
    de = d["s"].str.extract(r"(?P<name>[a-z]+)-(?P<num>\d+)")
    pe = p["s"].str.extract(r"(?P<name>[a-z]+)-(?P<num>\d+)")
    compare("extract>sort_name", de.sort_values("name"), pe.sort_values("name"))
    compare(
        "extract>dropna>set_index",
        de.dropna().set_index("name").sort_index(),
        pe.dropna().set_index("name").sort_index(),
    )

    d, p = base_str()
    de = d["s"].str.extract(r"([a-z]+)-(\d+)")
    pe = p["s"].str.extract(r"([a-z]+)-(\d+)")
    pe.columns = ["0", "1"]
    dd = d.assign(name=de["0"], num=de["1"])
    pp = p.assign(name=pe["0"], num=pe["1"])
    compare(
        "extract_cols>filter>sort",
        dd[dd["num"] > "1"].sort_values("num"),
        pp[pp["num"] > "1"].sort_values("num"),
    )

    d, p = base_str()
    dpart = d["s"].str.partition("-")
    ppart = p["s"].str.partition("-")
    ppart.columns = ["0", "1", "2"]
    compare("partition>sort_0>head", dpart.sort_values("0").head(4), ppart.sort_values("0").head(4))
    dd = dpart.assign(w=d["w"])
    pp = ppart.assign(w=p["w"])
    compare(
        "partition>assign_w>gagg",
        dd.groupby("0").agg({"w": "sum"}).sort_index(),
        pp.groupby("0").agg({"w": "sum"}).sort_index(),
    )

    d, p = base_dt()
    dd = d.assign(dow=d["ts"].dt.dayofweek, day=d["ts"].dt.day)
    pp = p.assign(dow=p["ts"].dt.dayofweek.astype("int32"), day=p["ts"].dt.day.astype("int32"))
    compare("dt_derive>sort_dow", dd.sort_values("dow"), pp.sort_values("dow"))
    compare(
        "dt_derive>sort_ts>cumsum",
        dd.sort_values("ts").assign(cs=dd.sort_values("ts")["amt"].cumsum()),
        pp.sort_values("ts").assign(cs=pp.sort_values("ts")["amt"].cumsum()),
    )
    compare(
        "dt_derive>gagg_dow",
        dd.groupby("dow").agg({"amt": "sum"}).sort_index(),
        pp.groupby("dow").agg({"amt": "sum"}).sort_index(),
    )
    d2d = dd.sort_values("ts")
    p2d = pp.sort_values("ts")
    compare(
        "dt_sorted>shift>filter",
        d2d.assign(prev=d2d["amt"].shift(1)).dropna(),
        p2d.assign(prev=p2d["amt"].shift(1)).dropna(),
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
