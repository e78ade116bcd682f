"""Pre-arm BENCH_BASELINE.json entries for the r14-staged candidates
(q_api_frame_axis0_mod, q_api_multiindex_align_fill) from a fresh
isolated-warm capture — 1 discarded warm-up + N runs, noop-write, idle
box — the rounds-10..13 staging discipline.

    python tools/prearm_r14_staged.py [--runs 7] [--apply]
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BASE = ROOT / "BENCH_BASELINE.json"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--apply", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import sys

    sys.path.insert(0, str(ROOT))
    from pontem_spark.session import get_spark
    from pontem_spark.queries.round14_pending import PENDING

    base = json.loads(BASE.read_text())
    q, spread = base["queries"], base["spread"]
    spark = get_spark()

    results = {}
    for name, fn, _oracle in PENDING:
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        med = round(samples[len(samples) // 2], 3)
        lo, hi = round(samples[0], 3), round(samples[-1], 3)
        results[name] = (med, [lo, hi])
        print(f"{name}: median {med}, spread [{lo}, {hi}]", flush=True)

    if args.apply:
        for name, (med, sp) in results.items():
            q[name] = med
            spread[name] = sp
        base["note"] = (
            base.get("note", "")
            + " | r14: pre-armed q_api_frame_axis0_mod and "
            "q_api_multiindex_align_fill (staged in "
            "queries/round14_pending.py for the r15 flip) from fresh "
            f"isolated-warm captures (1 discarded warm-up + {args.runs} "
            "runs, idle box)"
        )
        base["value"] = round(sum(v for v in q.values() if v), 3)
        BASE.write_text(json.dumps(base, indent=1, sort_keys=True) + "\n")
        print(f"applied {len(results)} entries to {BASE}")


if __name__ == "__main__":
    main()
