"""Round-10 probe batch 2: window-family randomized differentials.

Sweeps rolling (window x min_periods x NaN density x agg), expanding,
ewm (com/span/alpha x adjust x ignore_na), groupby transform, and
dt.round HALF-TIE behavior (pandas rounds .5 boundaries half-to-EVEN
bucket) against pandas.

Randomized differential vs pandas (probe-then-pin cadence). NOT
collected by pytest (no test_ prefix); run manually:

    python tests/probe_r10_windows.py [seed ...]
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


def close(a, b) -> bool:
    an = pd.isna(a)
    bn = pd.isna(b)
    if an or bn:
        return bool(an) == bool(bn)
    return abs(float(a) - float(b)) < 1e-7 * max(1.0, abs(float(b)))


def check(label: str, got: pd.Series, want: pd.Series) -> None:
    ok = len(got) == len(want) and all(close(a, b) for a, b in zip(got.values, want.values))
    if not ok:
        FAILS.append(label)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(got.values, want.values)) if not close(a, b)]
        print(f"FAIL {label}: first diffs {bad[:4]}")
    else:
        print(f"ok   {label}")


def probe_rolling(spark, seed: int) -> None:
    rng = random.Random(seed)
    n = 30
    vals = [
        float("nan") if rng.random() < 0.18 else round(rng.uniform(-4, 4), 2)
        for _ in range(n)
    ]
    w = pd.Series(vals)
    s = Series(vals, spark=spark)
    for window in (2, 4, 7):
        for minp in (None, 1, window):
            for aggn in ("mean", "sum", "min", "max", "std", "var", "median", "count"):
                got = getattr(s.rolling(window, min_periods=minp), aggn)().to_pandas()
                want = getattr(w.rolling(window, min_periods=minp), aggn)()
                check(f"seed{seed} rolling w{window} mp{minp} {aggn}", got, want)
    for minp in (1, 3):
        for aggn in ("mean", "sum", "std", "count"):
            got = getattr(s.expanding(min_periods=minp), aggn)().to_pandas()
            want = getattr(w.expanding(min_periods=minp), aggn)()
            check(f"seed{seed} expanding mp{minp} {aggn}", got, want)


def probe_ewm(spark, seed: int) -> None:
    rng = random.Random(seed + 1000)
    n = 25
    vals = [
        float("nan") if rng.random() < 0.15 else round(rng.uniform(-4, 4), 2)
        for _ in range(n)
    ]
    w = pd.Series(vals)
    s = Series(vals, spark=spark)
    for kw in (
        {"com": 2.0},
        {"span": 5.0},
        {"alpha": 0.3},
        {"halflife": 3.0},
    ):
        for adjust in (True, False):
            for ignore_na in (True, False):
                got = s.ewm(adjust=adjust, ignore_na=ignore_na, **kw).mean().to_pandas()
                want = w.ewm(adjust=adjust, ignore_na=ignore_na, **kw).mean()
                check(f"seed{seed} ewm {kw} adj={adjust} ina={ignore_na}", got, want)


def probe_grouped_transform(spark, seed: int) -> None:
    rng = random.Random(seed + 2000)
    n = 40
    data = {
        "g": [rng.choice(["a", "b", "c", None]) for _ in range(n)],
        "v": [float("nan") if rng.random() < 0.15 else round(rng.uniform(-4, 4), 2) for _ in range(n)],
    }
    wf = pd.DataFrame(data)
    df = DataFrame(data, spark=spark)
    for how in ("mean", "sum", "min", "max", "count", "std"):
        got = df.groupby("g")["v"].transform(how).to_pandas()
        want = wf.groupby("g")["v"].transform(how)
        check(f"seed{seed} transform {how}", got, want)


def probe_dt_round_ties(spark) -> None:
    # pandas Timestamp.round rounds .5 ties HALF-TO-EVEN in bucket units
    stamps = [
        pd.Timestamp("2021-01-01 00:00:30"),   # tie between 00:00 and 00:01 -> even bucket 00:00
        pd.Timestamp("2021-01-01 00:01:30"),   # tie -> 00:02 (even)
        pd.Timestamp("2021-01-01 00:02:30"),   # tie -> 00:02
        pd.Timestamp("2021-01-01 06:00:00"),   # 12h tie -> 00:00
        pd.Timestamp("2021-01-01 18:00:00"),   # 12h tie -> 2021-01-02
        pd.Timestamp("2021-01-01 00:00:29.999999"),
        pd.Timestamp("2021-01-01 00:07:30"),   # 5min tie
        pd.Timestamp("2021-01-01 00:12:30"),   # 5min tie
    ]
    w = pd.Series(stamps)
    s = Series(stamps, spark=spark)
    for freq in ("min", "5min", "12h", "h"):
        got = s.dt.round(freq).to_pandas()
        want = w.dt.round(freq)
        ok = [str(a) for a in got] == [str(b) for b in want]
        if not ok:
            FAILS.append(f"dt.round ties {freq}")
            print(f"FAIL dt.round ties {freq}")
            for a, b in zip(got, want):
                if str(a) != str(b):
                    print(f"  engine {a} pandas {b}")
        else:
            print(f"ok   dt.round ties {freq}")


def main() -> None:
    seeds = [int(a) for a in sys.argv[1:]] or [11, 42]
    spark = get_spark(app_name="probe-r10w", master="local[8]", shuffle_partitions=8)
    for seed in seeds:
        probe_rolling(spark, seed)
        probe_ewm(spark, seed)
        probe_grouped_transform(spark, seed)
    probe_dt_round_ties(spark)
    print(f"\n{len(FAILS)} failures: {FAILS}")


if __name__ == "__main__":
    main()
