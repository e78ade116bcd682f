"""Round-9 probe batch #2: value_counts/mode/rank/top-k/clip/describe/
where/mask/diff/shift differentials vs pandas over float, string and int
data. NOT collected by pytest (no test_ prefix); run manually:

    PYTHONPATH=. python tests/probe_r9_stats.py

Finding pinned from this batch: Series.value_counts row ORDER
(tests/test_series_pandas.py::test_r9_value_counts_row_order).
"""
import random, math
import numpy as np, pandas as pd
from pontem_spark.session import get_spark
from pontem_spark.core.series import Series


def main():

    spark = get_spark()
    diffs = []

    def close(a, b):
        if a is None and (b is None or (isinstance(b, float) and math.isnan(b))): return True
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b): return True
            return abs(a-b) <= 1e-9*max(1, abs(b))
        return str(a) == str(b)

    for seed in [11, 22, 33]:
        rng = random.Random(seed)
        data = []
        for _ in range(40):
            r = rng.random()
            data.append(float("nan") if r < 0.15 else float(rng.randint(0, 6)))
        ps = Series(data, spark=spark)
        ws = pd.Series(data)

        for normalize in (False, True):
            for ascending in (False, True):
                for dropna in (True, False):
                    got = ps.value_counts(normalize=normalize, ascending=ascending, dropna=dropna).to_pandas()
                    want = ws.value_counts(normalize=normalize, ascending=ascending, dropna=dropna)
                    # compare as sorted (index,value) multisets + ORDER of counts
                    g = list(zip([str(x) for x in got.index], got.tolist()))
                    w = list(zip([str(x) for x in want.index], want.tolist()))
                    gs = sorted(g); wss = sorted(w)
                    if len(gs)!=len(wss) or any(a[0]!=b[0] or not close(a[1],b[1]) for a,b in zip(gs,wss)):
                        diffs.append(f"value_counts set n={normalize} a={ascending} d={dropna} seed={seed}: {gs} vs {wss}")
                    # count ORDER must match pandas' (count order, ties by first-seen — engine may differ on ties; compare counts only)
                    gc = [x[1] for x in g]; wc = [x[1] for x in w]
                    if not all(close(a,b) for a,b in zip(gc,wc)):
                        diffs.append(f"value_counts ORDER n={normalize} a={ascending} d={dropna} seed={seed}: {gc} vs {wc}")

        gm = ps.mode().to_pandas().tolist()
        wm = ws.mode().tolist()
        if not (len(gm)==len(wm) and all(close(a,b) for a,b in zip(gm,wm))):
            diffs.append(f"mode seed={seed}: {gm} vs {wm}")

        for method in ["average", "min", "max", "first", "dense"]:
            for asc in (True, False):
                try:
                    got = ps.rank(method=method, ascending=asc).to_pandas().tolist()
                except Exception as exc:
                    got = f"RAISED {type(exc).__name__}"
                want = ws.rank(method=method, ascending=asc).tolist()
                if isinstance(got, str):
                    diffs.append(f"rank {method} asc={asc} seed={seed}: {got}")
                elif not all(close(a,b) for a,b in zip(got, want)):
                    diffs.append(f"rank {method} asc={asc} seed={seed}: {got[:8]} vs {want[:8]}")
        for pct in (True,):
            got = ps.rank(pct=True).to_pandas().tolist()
            want = ws.rank(pct=True).tolist()
            if not all(close(a,b) for a,b in zip(got, want)):
                diffs.append(f"rank pct seed={seed}")

        for n in (0, 3, 100):
            gl = ps.nlargest(n).to_pandas().tolist()
            wl = ws.nlargest(n).tolist()
            gsm = ps.nsmallest(n).to_pandas().tolist()
            wsm = ws.nsmallest(n).tolist()
            if not (len(gl)==len(wl) and all(close(a,b) for a,b in zip(gl,wl))):
                diffs.append(f"nlargest({n}) seed={seed}: {gl} vs {wl}")
            if not (len(gsm)==len(wsm) and all(close(a,b) for a,b in zip(gsm,wsm))):
                diffs.append(f"nsmallest({n}) seed={seed}: {gsm} vs {wsm}")

        for lo, hi in [(1.0, 4.0), (None, 3.0), (2.0, None)]:
            got = ps.clip(lo, hi).to_pandas().tolist()
            want = ws.clip(lo, hi).tolist()
            if not all(close(a,b) for a,b in zip(got, want)):
                diffs.append(f"clip({lo},{hi}) seed={seed}: {got[:6]} vs {want[:6]}")

    print(f"TOTAL DIFFS: {len(diffs)}")
    for d in diffs[:30]: print("DIFF:", d)



if __name__ == "__main__":
    main()
