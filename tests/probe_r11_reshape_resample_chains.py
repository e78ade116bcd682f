"""Round-11 probe batch 4: RESAMPLE and RESHAPE outputs as chain links.

Seams: (a) resample()/asfreq() outputs feeding sorts / positional ops /
binops, (b) unstack/stack/pivot outputs feeding chains (including the
pivot → melt-ish roundtrip), (c) value_counts / xs outputs feeding
chains, (d) idxmax/idxmin on derived and sorted frames.

Deterministic enumeration, compared to pandas after the WHOLE chain.

NOT collected by pytest; run manually:

    PYTHONPATH=. python tests/probe_r11_reshape_resample_chains.py
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
    gi = [tuple(t) if isinstance(t, tuple) else t for t in got.index]
    wi = [tuple(t) if isinstance(t, tuple) else t for t in want.index]
    for a, b in zip(gi, wi):
        ta = a if isinstance(a, tuple) else (a,)
        tb = b if isinstance(b, tuple) else (b,)
        if len(ta) != len(tb) or not all(close(x, y) for x, y in zip(ta, tb)):
            FAILS.append(f"{label} index")
            print(f"FAIL {label}: index {gi[:6]} vs {wi[:6]}")
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

    # ---- (a) resample/asfreq outputs feeding chains ------------------------
    idx = pd.to_datetime(
        [
            "2024-01-01 00:10",
            "2024-01-01 00:40",
            "2024-01-01 01:20",
            "2024-01-01 03:05",
            "2024-01-01 03:50",
        ]
    )
    ps = pd.Series([1.0, 3.0, 5.0, 7.0, 9.0], index=idx)
    gs = Series([1.0, 3.0, 5.0, 7.0, 9.0], index=idx)

    compare(
        "resample_mean>sort_values",
        gs.resample("1h").mean().sort_values(),
        ps.resample("1h").mean().sort_values(),
    )
    compare(
        "resample_sum>cumsum",
        gs.resample("1h").sum().cumsum(),
        ps.resample("1h").sum().cumsum(),
    )
    compare(
        "resample_count>binop",
        gs.resample("1h").count() * 2,
        ps.resample("1h").count() * 2,
    )
    compare(
        "resample_mean>dropna>diff",
        gs.resample("1h").mean().dropna().diff(),
        ps.resample("1h").mean().dropna().diff(),
    )
    compare(
        "asfreq>ffill_chain",
        gs.asfreq("30min").fillna(0.0).cumsum(),
        ps.asfreq("30min").fillna(0.0).cumsum(),
    )
    compare(
        "asfreq_ffill>shift",
        gs.asfreq("30min", method="ffill").shift(1),
        ps.asfreq("30min", method="ffill").shift(1),
    )

    # ---- (b) unstack/pivot outputs feeding chains --------------------------
    pmi = pd.Series(
        [1.0, 2.0, 3.0, 4.0],
        index=pd.MultiIndex.from_tuples(
            [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
        ),
    )
    gmi = (
        DataFrame(
            pd.DataFrame(
                {
                    "l0": ["a", "a", "b", "b"],
                    "l1": ["x", "y", "x", "y"],
                    "v": [1.0, 2.0, 3.0, 4.0],
                }
            )
        )
        .set_index(["l0", "l1"])["v"]
    )
    pu = pmi.unstack()
    gu = gmi.unstack()
    compare("unstack>sort_index", gu.sort_index(), pu.sort_index())
    compare(
        "unstack>assign_sum",
        gu.assign(t=gu["x"] + gu["y"]),
        pu.assign(t=pu["x"] + pu["y"]),
    )

    ppv = pd.DataFrame(
        {
            "r": ["r1", "r1", "r2", "r2"],
            "c": ["c1", "c2", "c1", "c2"],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    gpv = DataFrame(ppv)
    pp = ppv.pivot(index="r", columns="c", values="v")
    pp.columns.name = None
    pp.index.name = "r"
    gp = gpv.pivot(index="r", columns="c", values="v")
    compare("pivot>sort_index", gp.sort_index(), pp.sort_index())
    compare(
        "pivot>reset>melt_roundtrip",
        gp.reset_index().melt(id_vars=["r"]).reset_index(drop=True),
        pp.reset_index().melt(id_vars=["r"]).astype({"value": "float"}).reset_index(drop=True),
    )

    # ---- (c) value_counts / xs outputs feeding chains ----------------------
    pv = pd.Series(["a", "b", "a", "c", "b", "a"])
    gv = Series(["a", "b", "a", "c", "b", "a"])
    compare(
        "value_counts>binop",
        gv.value_counts() * 10,
        pv.value_counts() * 10,
    )
    compare(
        "value_counts>sort_index",
        gv.value_counts().sort_index(),
        pv.value_counts().sort_index(),
    )
    compare(
        "xs>sort_values",
        gmi.xs("a", level=0).sort_values(),
        pmi.xs("a", level=0).sort_values(),
    )

    # ---- (d) idxmax/idxmin on derived/sorted frames ------------------------
    ps2 = pd.Series([4.0, 8.0, 2.0], index=[30, 10, 20])
    gs2 = Series([4.0, 8.0, 2.0], index=[30, 10, 20])
    assert gs2.sort_values().idxmax() == ps2.sort_values().idxmax(), "idxmax sorted"
    print("ok   idxmax_sorted")
    assert (gs2 * -1).idxmin() == (ps2 * -1).idxmin(), "idxmin derived"
    print("ok   idxmin_derived")

    print()
    if FAILS:
        print(f"{len(FAILS)} FAILURES")
        for f in FAILS:
            print(" -", f)
        raise SystemExit(1)
    print("all clean")


if __name__ == "__main__":
    main()
