"""Round-9 probe batch: str/dt accessor tails + merge suffix/indicator edges.

Randomized differential vs pandas (the probe-then-pin cadence — verdict r8
task 7). NOT collected by pytest (no test_ prefix); run manually:

    python tests/probe_r9_str_dt.py [seed ...]

Any divergence found here gets a PINNED differential in
tests/test_series_pandas.py / tests/test_frame_pandas.py.

Alphabet stays <= U+017F: the JVM's Unicode tables (16) are newer than
CPython 3.11's (14) and upper/casefold diverge above Latin Extended-A
(memory: U+019B). Whitespace probes use ASCII + U+00A0 deliberately —
pandas strip() strips all Unicode space; Spark trim is U+0020 only, the
engine compensates.
"""
from __future__ import annotations

import random
import string
import sys

import numpy as np
import pandas as pd

from pontem_spark.core.frame import DataFrame
from pontem_spark.core.series import Series
from pontem_spark.session import get_spark

ALPHA = (
    string.ascii_letters
    + string.digits
    + " \t\u00a0'\"\\.,;:-_!?()[]/%$#@*+=<>|~^"
    + "àâäçéèêëîïôöùûüÿœÀÉÈÇŒß"
    + "ābčďēğħīĵķļňōŕšťūŵŷž"
)


def rand_strings(rng: random.Random, n: int) -> list:
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.08:
            out.append(None)
        elif r < 0.14:
            out.append("")
        else:
            k = rng.randint(1, 12)
            out.append("".join(rng.choice(ALPHA) for _ in range(k)))
    return out


def eq_series(got: pd.Series, want: pd.Series, label: str) -> list[str]:
    g, w = got.reset_index(drop=True), want.reset_index(drop=True)
    bad = []
    if len(g) != len(w):
        return [f"{label}: len {len(g)} vs {len(w)}"]
    for i in range(len(g)):
        gv, wv = g.iloc[i], w.iloc[i]
        gnull = gv is None or (isinstance(gv, float) and np.isnan(gv)) or gv is pd.NaT
        wnull = wv is None or (isinstance(wv, float) and np.isnan(wv)) or wv is pd.NaT
        if gnull and wnull:
            continue
        if gnull != wnull or str(gv) != str(wv):
            bad.append(f"{label}[{i}]: got {gv!r} want {wv!r}")
    return bad


def probe_str(seed: int) -> list[str]:
    rng = random.Random(seed)
    spark = get_spark()
    data = rand_strings(rng, 60)
    ps = Series(data, spark=spark)
    ws = pd.Series(data, dtype="object")
    diffs: list[str] = []

    unary = [
        "upper", "lower", "strip", "lstrip", "rstrip", "title", "capitalize",
        "swapcase", "casefold", "len",
        "isdigit", "isalpha", "isalnum", "isspace", "islower", "isupper",
    ]
    for m in unary:
        got = getattr(ps.str, m)().to_pandas()
        want = getattr(ws.str, m)()
        diffs += eq_series(got, want, f"str.{m} seed={seed}")

    # pandas str.count is REGEX count — pass patterns through verbatim on
    # both sides (the first run of this probe escaped the oracle side and
    # flagged 54 false diffs)
    for pat in ["a", "à", "\\.", "z", "[ab]+"]:
        diffs += eq_series(
            ps.str.count(pat).to_pandas(),
            ws.str.count(pat),
            f"str.count({pat!r}) seed={seed}",
        )
    for sub in ["a", "à", "z", "."]:
        diffs += eq_series(
            ps.str.find(sub).to_pandas(),
            ws.str.find(sub),
            f"str.find({sub!r}) seed={seed}",
        )
    for pre in ["a", "à", "", "ab"]:
        diffs += eq_series(
            ps.str.removeprefix(pre).to_pandas(),
            ws.str.removeprefix(pre),
            f"removeprefix({pre!r}) seed={seed}",
        )
        diffs += eq_series(
            ps.str.removesuffix(pre).to_pandas(),
            ws.str.removesuffix(pre),
            f"removesuffix({pre!r}) seed={seed}",
        )
    for width, fill in [(5, "*"), (8, "0"), (2, "-")]:
        for m in ["ljust", "rjust", "center", "zfill"]:
            got = (
                getattr(ps.str, m)(width).to_pandas()
                if m == "zfill"
                else getattr(ps.str, m)(width, fill).to_pandas()
            )
            want = (
                getattr(ws.str, m)(width)
                if m == "zfill"
                else getattr(ws.str, m)(width, fill)
            )
            diffs += eq_series(got, want, f"str.{m}({width},{fill!r}) seed={seed}")
    for i in [-2, -1, 0, 1, 3]:
        diffs += eq_series(
            ps.str.get(i).to_pandas(), ws.str.get(i), f"str.get({i}) seed={seed}"
        )
    for start, stop in [(1, 4), (-3, None), (0, -1), (-1, 2), (2, 2)]:
        diffs += eq_series(
            ps.str.slice(start, stop).to_pandas(),
            ws.str.slice(start, stop),
            f"str.slice({start},{stop}) seed={seed}",
        )
    return diffs


def probe_dt(seed: int) -> list[str]:
    rng = random.Random(seed + 7)
    spark = get_spark()
    # hit ISO-week / year / quarter / month boundaries on purpose
    anchors = [
        "2019-12-28", "2019-12-31", "2020-01-01", "2020-02-29", "2020-12-31",
        "2021-01-04", "2015-12-28", "2016-01-03", "2024-06-30", "2024-07-01",
        "1999-12-31", "2000-01-01", "2023-09-30", "2023-10-01",
    ]
    stamps = [
        pd.Timestamp(a) + pd.Timedelta(seconds=rng.randint(0, 86399))
        for a in anchors
        for _ in range(2)
    ] + [
        pd.Timestamp("2020-01-01") + pd.Timedelta(seconds=rng.randint(0, 4 * 365 * 86400))
        for _ in range(30)
    ]
    ws = pd.Series(stamps)
    ps = Series(list(ws), spark=spark)
    diffs: list[str] = []
    props = [
        "year", "month", "day", "hour", "minute", "second", "dayofweek",
        "weekday", "dayofyear", "quarter", "days_in_month", "is_month_start",
        "is_month_end", "is_year_start", "is_year_end", "is_quarter_start",
        "is_quarter_end", "is_leap_year",
    ]
    for m in props:
        attr = getattr(ps.dt, m)
        got = (attr() if callable(attr) else attr).to_pandas()
        diffs += eq_series(got, getattr(ws.dt, m), f"dt.{m} seed={seed}")
    wk = ps.dt.week
    wk = wk() if callable(wk) else wk
    diffs += eq_series(
        wk.to_pandas(),
        ws.dt.isocalendar().week.astype("int64"),
        f"dt.week seed={seed}",
    )
    diffs += eq_series(
        ps.dt.day_name().to_pandas(), ws.dt.day_name(), f"day_name seed={seed}"
    )
    diffs += eq_series(
        ps.dt.month_name().to_pandas(), ws.dt.month_name(), f"month_name seed={seed}"
    )
    for freq in ["h", "min", "15min", "d", "s"]:
        for m in ["floor", "ceil", "round"]:
            diffs += eq_series(
                getattr(ps.dt, m)(freq).to_pandas(),
                getattr(ws.dt, m)(freq),
                f"dt.{m}({freq}) seed={seed}",
            )
    for fmt in ["%Y-%m-%d", "%H:%M:%S", "%Y-%m-%d %H:%M", "%j", "%A %B"]:
        diffs += eq_series(
            ps.dt.strftime(fmt).to_pandas(),
            ws.dt.strftime(fmt),
            f"strftime({fmt}) seed={seed}",
        )
    return diffs


def probe_merge(seed: int) -> list[str]:
    rng = random.Random(seed + 13)
    spark = get_spark()
    diffs: list[str] = []
    n = 25
    keys = [rng.randint(0, 8) for _ in range(n)]
    la = pd.DataFrame({
        "k": keys,
        "v": [rng.randint(0, 99) for _ in range(n)],
        "shared": [float(rng.randint(0, 9)) for _ in range(n)],
    })
    rb = pd.DataFrame({
        "k": [rng.randint(0, 11) for _ in range(n)],
        "w": [rng.randint(0, 99) for _ in range(n)],
        "shared": [float(rng.randint(0, 9)) for _ in range(n)],
    })
    fa = DataFrame(la.to_dict("list"), spark=spark)
    fb = DataFrame(rb.to_dict("list"), spark=spark)
    for how in ["inner", "left", "right", "outer"]:
        for suf in [("_x", "_y"), ("_l", "_r"), ("", "_r"), ("_l", "")]:
            try:
                got = fa.merge(fb, on="k", how=how, suffixes=suf).to_pandas()
            except Exception as exc:  # noqa: BLE001
                got = f"RAISED {type(exc).__name__}"
            try:
                want = la.merge(rb, on="k", how=how, suffixes=suf)
            except Exception as exc:  # noqa: BLE001
                want = f"RAISED {type(exc).__name__}"
            label = f"merge {how} suf={suf} seed={seed}"
            if isinstance(got, str) or isinstance(want, str):
                if str(got)[:6] != str(want)[:6]:
                    diffs.append(f"{label}: got {got} want {want}")
                continue
            gc, wc = sorted(got.columns), sorted(want.columns)
            if gc != wc:
                diffs.append(f"{label}: cols {gc} vs {wc}")
                continue
            g = got[wc].sort_values(by=wc).reset_index(drop=True)
            w = want[wc].sort_values(by=wc).reset_index(drop=True)
            if len(g) != len(w):
                diffs.append(f"{label}: rows {len(g)} vs {len(w)}")
                continue
            for c in wc:
                if not (g[c].astype(str).values == w[c].astype(str).values).all():
                    diffs.append(f"{label}: col {c} values differ")
        # indicator=True
        try:
            got = fa.merge(fb, on="k", how=how, indicator=True).to_pandas()
            want = la.merge(rb, on="k", how=how, indicator=True)
            gm = sorted(got["_merge"].astype(str).tolist())
            wm = sorted(want["_merge"].astype(str).tolist())
            if gm != wm:
                diffs.append(f"merge indicator {how} seed={seed}: {gm[:6]} vs {wm[:6]}")
        except TypeError:
            diffs.append(f"merge indicator {how} seed={seed}: engine lacks indicator kwarg")
            break
    return diffs


if __name__ == "__main__":
    seeds = [int(a) for a in sys.argv[1:]] or [101, 202, 303]
    all_diffs: list[str] = []
    for s in seeds:
        for fn in (probe_str, probe_dt, probe_merge):
            d = fn(s)
            print(f"{fn.__name__} seed={s}: {len(d)} diffs", flush=True)
            all_diffs += d
    for d in all_diffs[:120]:
        print("DIFF:", d)
    print(f"TOTAL DIFFS: {len(all_diffs)}")
