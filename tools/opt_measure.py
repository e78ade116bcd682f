"""Round-14 optimization measurement harness (guide §1).

For each named query: capture ``explain("formatted")`` to
``plans/r14/<name>_<tag>.txt`` and measure an isolated-warm median
(1 discarded warm-up + N runs, noop-format write so every projected
column materializes, idle box) with the job labeled in the UI.

    python tools/opt_measure.py --tag before q_graph_triangles q_graph_pagerank
    python tools/opt_measure.py --tag before --top 30          # by baseline median
    python tools/opt_measure.py --tag after --json /tmp/after.json q_...

Timings print as one JSON line {name: {"median": s, "spread": [lo, hi]}}
so before/after diffs are machine-checkable.
"""
from __future__ import annotations

import argparse
import contextlib
import io
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--top", type=int, default=0, help="add top-N queries by committed baseline median")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plans-dir", default=str(ROOT / "plans" / "r14"))
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from pontem_spark.queries.registry import all_queries
    from pontem_spark.session import get_spark

    queries = all_queries()
    names = list(args.names)
    if args.top:
        base = json.loads((ROOT / "BENCH_BASELINE.json").read_text())["queries"]
        ranked = sorted((n for n in base if n in queries), key=lambda n: -base[n])
        for n in ranked[: args.top]:
            if n not in names:
                names.append(n)
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    plans_dir = Path(args.plans_dir)
    plans_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(
        app_name="opt-measure",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session like bench.py does: touch tables, spin Python workers
    from pontem_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf_dir, t).count()
    spark.range(100).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name].fn
        if not args.no_plans:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            (plans_dir / f"{name}_{args.tag}.txt").write_text(buf.getvalue())
        spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
        samples = []
        for i in range(args.runs + 1):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i > 0:  # discard the first (per-query warm-up) run
                samples.append(dt)
        spark.sparkContext.setJobDescription(None)
        samples.sort()
        med = round(samples[len(samples) // 2], 3)
        lo, hi = round(samples[0], 3), round(samples[-1], 3)
        out[name] = {"median": med, "spread": [lo, hi]}
        print(f"# {name}: {med:.3f}s [{lo:.3f}, {hi:.3f}]", file=sys.stderr, flush=True)

    line = json.dumps(out)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
