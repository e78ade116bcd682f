"""Median-staleness re-tighten (r13 verdict task 7).

The committed BENCH_BASELINE medians predate several rounds of engine
work; as the suite gets faster the 2x-of-spread-high gate drifts loose.
This tool takes a FRESH bench artifact (bench.py's JSON line), finds
every query whose committed median exceeds RATIO x the fresh suite
median, re-captures those isolated (one shared warm session, 1 discarded
warm-up + N runs, noop-write, idle box), and applies:

  median := min(committed, isolated median)     (never raised)
  spread := the witnessed isolated [lo, hi]     (never max-merged)

    python tools/retighten_medians.py --bench /tmp/bench.json [--ratio 1.4]
                                      [--runs 7] [--apply]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BASE = ROOT / "BENCH_BASELINE.json"
sys.path.insert(0, str(ROOT))  # runnable from any cwd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", required=True)
    ap.add_argument("--ratio", type=float, default=1.4)
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--apply", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    base = json.loads(BASE.read_text())
    fresh = json.loads(Path(args.bench).read_text())["queries"]
    q, spread = base["queries"], base["spread"]
    stale = sorted(
        n
        for n, med in q.items()
        if n in fresh and fresh[n] > 0 and med > args.ratio * fresh[n]
    )
    print(f"{len(stale)} queries with committed median > {args.ratio}x fresh median")
    if not stale:
        return

    from pontem_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark()
    fns = e.queries()
    fns[stale[0]](spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    applied = 0
    for name in stale:
        fn = fns[name]
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        med = round(samples[len(samples) // 2], 3)
        lo, hi = round(samples[0], 3), round(samples[-1], 3)
        print(
            f"{name}: median {q[name]} -> {min(q[name], med)} (iso {med}), "
            f"spread {spread[name]} -> [{lo}, {hi}]",
            flush=True,
        )
        if args.apply:
            q[name] = min(q[name], med)
            spread[name] = [lo, hi]
            applied += 1

    if args.apply:
        base["note"] = base.get("note", "") + (
            f" | r15: medians re-tightened from fresh isolated-warm captures "
            f"(1 discarded warm-up + {args.runs} runs, idle box) for every "
            f"query whose committed median exceeded {args.ratio}x the fresh "
            f"suite median (min-merge: medians only lowered, spreads "
            f"replaced by the witnessed isolated range)"
        )
        base["value"] = round(sum(v for v in q.values() if v), 3)
        BASE.write_text(json.dumps(base, indent=1, sort_keys=True) + "\n")
        print(f"applied {applied} entries to {BASE}")


if __name__ == "__main__":
    main()
