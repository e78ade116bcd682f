"""Round-12 probe batch 2: two composition seams the r11 batches left
uncovered (VERDICT r11 task 5):

(a) resample/asfreq OUTPUTS feeding further chains — positional ops
    (cumsum/shift/diff), aligned arithmetic between two resampled
    series, rolling windows, and a merge back onto a frame keyed by the
    bucket timestamp.
(b) str.extract / str.partition result FRAMES feeding reshape chains —
    stack/unstack/pivot-shaped compositions plus set_index/groupby over
    extracted columns.

Deterministic enumerated cases (the surface is narrow), each compared
whole-chain against pandas on values + index + column order.

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r12_resample_reshape.py
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pontem_spark.core import DataFrame, Series
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


def check_series(label: str, got: pd.Series, want: pd.Series) -> None:
    if len(got) != len(want):
        FAILS.append(f"{label} len {len(got)} vs {len(want)}")
        print(f"FAIL {label}: len {len(got)} vs {len(want)}")
        return
    if not all(close(a, b) for a, b in zip(got.index, want.index)):
        FAILS.append(f"{label} index")
        print(f"FAIL {label}: index\n  got  {list(got.index)[:6]}\n  want {list(want.index)[:6]}")
        return
    if not all(close(a, b) for a, b in zip(got.values, want.values)):
        FAILS.append(f"{label} values")
        print(f"FAIL {label}: values\n  got  {list(got.values)[:8]}\n  want {list(want.values)[:8]}")
        return
    print(f"ok   {label}")


def check_frame(label: str, got: pd.DataFrame, want: pd.DataFrame) -> None:
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
        print(f"FAIL {label}: index\n  got  {list(got.index)[:6]}\n  want {list(want.index)[:6]}")
        return
    for c_g, c_w in zip(got.columns, want.columns):
        if not all(close(a, b) for a, b in zip(got[c_g], want[c_w])):
            FAILS.append(f"{label} col {c_g}")
            print(
                f"FAIL {label}: col {c_g}\n  got  {list(got[c_g])[:8]}\n  want {list(want[c_w])[:8]}"
            )
            return
    print(f"ok   {label}")


def ts_series(spark):
    """Irregular timestamp index, some NaN values, unsorted arrival."""
    ts = pd.to_datetime(
        [
            "2024-03-01 00:10",
            "2024-03-01 05:45",
            "2024-03-01 03:20",
            "2024-03-01 11:05",
            "2024-03-01 08:30",
            "2024-03-01 17:55",
            "2024-03-01 14:40",
            "2024-03-01 23:59",
            "2024-03-02 02:15",
            "2024-03-02 07:50",
        ]
    )
    vals = [1.0, 2.5, None, 4.0, 5.5, 7.0, None, 8.5, 10.0, 11.5]
    pds = pd.Series(vals, index=ts, dtype="float64")
    s = Series(vals, index=list(ts), spark=spark)
    return s, pds


def case(fn):
    """Run one probe case; a crash is a FAIL, not a harness abort."""
    try:
        fn()
    except Exception as exc:  # noqa: BLE001
        FAILS.append(f"{fn.__name__} raised {type(exc).__name__}")
        print(f"FAIL {fn.__name__}: raised {type(exc).__name__}: {exc}")


def probe_resample_chains(spark) -> None:
    s, pds = ts_series(spark)
    # asfreq(method=...) requires a monotonic index in pandas — give the
    # asfreq cases a sorted twin
    pds_sorted = pds.sort_index()
    s_sorted = Series(
        list(pds_sorted.values), index=list(pds_sorted.index), spark=spark
    )

    def c1():
        # resample mean -> cumsum (positional over the bucket grid)
        got = s.resample("6h").mean().cumsum().to_pandas()
        want = pds.resample("6h").mean().cumsum()
        check_series("resample6h.mean.cumsum", got, want)

    def c2():
        got = s.resample("7h").sum().shift(1).to_pandas()
        want = pds.resample("7h").sum().shift(1)
        check_series("resample7h.sum.shift", got, want)

    def c3():
        # resampled +/- resampled (aligned arithmetic, same grid)
        got = (s.resample("6h").mean() + s.resample("6h").max()).to_pandas()
        want = pds.resample("6h").mean() + pds.resample("6h").max()
        check_series("resample.mean+max", got, want)

    def c4():
        # DIFFERENT grids -> aligned union (6h vs 12h)
        got = (s.resample("6h").sum() - s.resample("12h").sum()).to_pandas()
        want = pds.resample("6h").sum() - pds.resample("12h").sum()
        check_series("resample.6h-12h.align", got, want)

    def c5():
        got = s.resample("6h").mean().rolling(3).mean().to_pandas()
        want = pds.resample("6h").mean().rolling(3).mean()
        check_series("resample.rolling3", got, want)

    def c6():
        got = s_sorted.asfreq("4h", method="ffill").cumsum().to_pandas()
        want = pds_sorted.asfreq("4h", method="ffill").cumsum()
        check_series("asfreq4h.ffill.cumsum", got, want)

    def c7():
        # asfreq -> arithmetic with a resampled series (grid alignment)
        got = (
            s_sorted.asfreq("6h", method="ffill") * 2.0
            + s_sorted.resample("6h").min()
        ).to_pandas()
        want = pds_sorted.asfreq("6h", method="ffill") * 2.0 + pds_sorted.resample(
            "6h"
        ).min()
        check_series("asfreq*2+resample.min", got, want)

    def c8():
        # resample output back to a frame keyed by the bucket ts
        got = s.resample("6h").mean().reset_index().to_pandas()
        want = pds.resample("6h").mean().reset_index()
        got.columns = [str(c) for c in got.columns]
        want.columns = [str(c) for c in want.columns]
        check_frame("resample.reset_index", got, want)

    def c9():
        # resample -> to_frame -> assign a positional column
        f = s.resample("6h").mean().to_frame("m")
        f = f.assign(cs=f["m"].cumsum())
        pf = pds.resample("6h").mean().to_frame("m")
        pf = pf.assign(cs=pf["m"].cumsum())
        check_frame("resample.to_frame.assign", f.to_pandas(), pf)

    def c10():
        # groupby over the resampled output's day (merge-shaped seam)
        f = s.resample("6h").sum().to_frame("v").reset_index()
        idx_col = f.columns[0]
        f = f.assign(d=f[idx_col].dt.floor("d"))
        got = f.groupby("d").agg({"v": "sum"}).to_pandas().sort_index()
        pf = pds.resample("6h").sum().to_frame("v").reset_index()
        pidx = pf.columns[0]
        pf = pf.assign(d=pf[pidx].dt.floor("d"))
        want = pf.groupby("d").agg({"v": "sum"}).sort_index()
        got.columns = [str(c) for c in got.columns]
        want.columns = [str(c) for c in want.columns]
        check_frame("resample.groupby_day", got, want)

    for fn in (c1, c2, c3, c4, c5, c6, c7, c8, c9, c10):
        case(fn)


def docs_series(spark):
    vals = [
        "alpha-01 beta",
        "gamma-22 delta",
        "epsilon-3 zeta",
        None,
        "eta-44 theta",
        "iota-5 kappa",
        "nomatch",
        "lambda-66 mu",
    ]
    pds = pd.Series(vals, dtype="object")
    s = Series(vals, spark=spark)
    return s, pds


def probe_extract_reshape(spark) -> None:
    s, pds = docs_series(spark)
    pat = r"(?P<word>[a-z]+)-(?P<num>\d+)"

    def c1():
        # extract frame -> set_index(word) -> sort_index
        f = s.str.extract(pat, expand=True).set_index("word").sort_index()
        pf = pds.str.extract(pat, expand=True).set_index("word").sort_index()
        check_frame("extract.set_index.sort", f.to_pandas(), pf)

    def c2():
        # extract -> assign numeric cast -> groupby word-length
        f = s.str.extract(pat, expand=True)
        f = f.assign(n=f["num"].astype("float64"))
        f = f.assign(wl=f["word"].str.len())
        got = f.groupby("wl").agg({"n": "sum"}).to_pandas().sort_index()
        pf = pds.str.extract(pat, expand=True)
        pf = pf.assign(n=pf["num"].astype("float64"))
        pf = pf.assign(wl=pf["word"].str.len().astype("float64"))
        want = pf.groupby("wl").agg({"n": "sum"}).sort_index()
        want.index = [float(i) for i in want.index]
        got.index = [float(i) for i in got.index]
        check_frame("extract.groupby_wl", got, want)

    def c3():
        f = s.str.partition("-")
        pf = pds.str.partition("-")
        pf.columns = [str(c) for c in pf.columns]
        check_frame("partition.frame", f.to_pandas(), pf)

    def c4():
        # partition -> stack (long form); compare as (index-tuple ->
        # value) maps: stack drops NaN rows in both engines
        f = s.str.partition("-").stack()
        pf = pds.str.partition("-")
        pf.columns = [str(c) for c in pf.columns]
        pfs = pf.stack()
        got = f.to_pandas()
        gm = {(str(i), str(j)): v for (i, j), v in zip(got.index, got.values)}
        wm = {(str(i), str(j)): v for (i, j), v in zip(pfs.index, pfs.values)}
        if gm == wm:
            print("ok   partition.stack")
        else:
            only_g = set(gm) - set(wm)
            only_w = set(wm) - set(gm)
            diff = {k for k in set(gm) & set(wm) if gm[k] != wm[k]}
            FAILS.append("partition.stack")
            print(
                f"FAIL partition.stack: +{sorted(only_g)[:4]} "
                f"-{sorted(only_w)[:4]} diff{sorted(diff)[:4]}"
            )

    def c5():
        # extract -> pivot (word x num presence)
        f = s.str.extract(pat, expand=True).dropna()
        f = f.assign(one=f["num"].astype("float64") * 0 + 1.0)
        got = f.pivot(index="word", columns="num", values="one").to_pandas().sort_index()
        pf = pds.str.extract(pat, expand=True).dropna()
        pf = pf.assign(one=pf["num"].astype("float64") * 0 + 1.0)
        want = pf.pivot(index="word", columns="num", values="one").sort_index()
        got.columns = [str(c) for c in got.columns]
        want.columns = [str(c) for c in want.columns]
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        check_frame("extract.pivot", got, want)

    def c6():
        # extract single group (Series) -> fillna -> value_counts
        g1 = s.str.extract(r"([a-z]+)-").fillna("none")
        got = g1.value_counts().to_pandas().sort_index()
        want = (
            pds.str.extract(r"([a-z]+)-", expand=False)
            .fillna("none")
            .value_counts()
            .sort_index()
        )
        check_series("extract1.value_counts", got, want)

    def c7():
        # extract frame -> set_index(word)['num'] Series -> to_frame ->
        # reset_index (column order + values survive the round trip)
        f = (
            s.str.extract(pat, expand=True)
            .set_index("word")["num"]
            .to_frame("num")
            .reset_index()
        )
        pf = (
            pds.str.extract(pat, expand=True)
            .set_index("word")["num"]
            .to_frame("num")
            .reset_index()
        )
        check_frame("extract.series.roundtrip", f.to_pandas(), pf)

    for fn in (c1, c2, c3, c4, c5, c6, c7):
        case(fn)


def main() -> None:
    spark = get_spark()
    probe_resample_chains(spark)
    probe_extract_reshape(spark)
    print()
    print(f"{len(FAILS)} failures")
    for f in FAILS:
        print("  -", f)


if __name__ == "__main__":
    main()
