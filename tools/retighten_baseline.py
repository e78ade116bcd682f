"""Re-tighten BENCH_BASELINE.json spread-highs (r8 verdict task 3).

The r8 max-merge ratcheted 97 spread-highs to the worst sample ANY session
ever witnessed; with the 2x-spread-high flag bar, a query whose high sits
at 3-25x its median could genuinely regress to ~2x that high before the
gate noticed. bench.py's end-of-suite isolated re-check (the r6 structural
fix) makes spread-widening unnecessary — so every query whose committed
spread-high exceeds RATIO x median gets a FRESH isolated-warm capture
(one shared session, noop-write, N runs) and its spread replaced by the
witnessed isolated [lo, hi]; the median is replaced too when the isolated
median is LOWER (never raised from an isolated run). Run on an IDLE box.

    python tools/retighten_baseline.py [--ratio 2.5] [--runs 7] [--apply]

Without --apply it prints the would-be changes.
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
    ap.add_argument("--ratio", type=float, default=2.5)
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--apply", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    base = json.loads(BASE.read_text())
    q, spread = base["queries"], base["spread"]
    wide = sorted(
        n
        for n, med in q.items()
        if med and spread.get(n) and spread[n][1] > args.ratio * med
    )
    print(f"{len(wide)} queries with spread-high > {args.ratio}x median")
    if not wide:
        return

    from pontem_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark()
    fns = e.queries()
    # one warm-up pass over a tiny query so session/codegen costs don't
    # land on the first capture
    fns[wide[0]](spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    changes = {}
    for name in wide:
        fn = fns[name]
        # discard one per-query warm-up: the first execution carries THIS
        # query's codegen-compile cost, which is session-lifecycle, not
        # run-to-run variance — exactly what kept 15 spreads >2.5x median
        # on the first re-capture pass
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        med = round(samples[len(samples) // 2], 3)
        lo, hi = round(samples[0], 3), round(samples[-1], 3)
        old_med, old_sp = q[name], spread[name]
        changes[name] = {
            "old": {"median": old_med, "spread": old_sp},
            "new": {"median": min(old_med, med), "spread": [lo, hi]},
            "isolated_median": med,
        }
        print(
            f"{name}: median {old_med} -> {min(old_med, med)} "
            f"(iso {med}), spread {old_sp} -> [{lo}, {hi}]",
            flush=True,
        )

    if args.apply:
        for name, ch in changes.items():
            q[name] = ch["new"]["median"]
            spread[name] = ch["new"]["spread"]
        base["note"] = (
            base.get("note", "")
            + " | r9: spread-highs re-tightened from fresh isolated-warm "
            f"captures ({args.runs} runs, noop-write, idle box) for every "
            f"query whose committed high exceeded {args.ratio}x its median "
            "(the r8 max-merge ratchet is retired — bench.py's isolated "
            "re-check absorbs environment jitter instead)"
        )
        base["value"] = round(sum(v for v in q.values() if v), 3)
        BASE.write_text(json.dumps(base, indent=1, sort_keys=True) + "\n")
        print(f"applied {len(changes)} entries to {BASE}")


if __name__ == "__main__":
    main()
