#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print a JSON
line {"metric": ..., "unit": "sec", "sf": ..., "queries": {name: sec},
"value": total_sec} followed by a SHORT summary line with the totals — so a
tail-truncating log capture still sees a parseable object with the total.

Each query is timed end-to-end (plan + execute + a noop-format write, which
materializes EVERY projected column — count() would let Catalyst prune
unreferenced projections and under-measure expression-heavy queries) after
a JVM/session warmup, so JIT and session startup don't pollute per-query
numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pontem_spark.queries.registry import all_queries  # noqa: E402
from pontem_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # progress bars write \r-frames to the console and can interleave with
    # the JSON result line under tail-capture
    spark = get_spark(
        app_name="pontem-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()

    # warmup: touch every table; spin up Python workers once so the first
    # Arrow-UDF query isn't charged their startup
    from pontem_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(100).mapInPandas(lambda it: it, "id long").count()

    runs = max(1, int(os.environ.get("PONTEM_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    for name in sorted(queries):
        q = queries[name]
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            # noop write executes the full plan INCLUDING every projected
            # column; count() would prune projections nothing references
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        # best-of-N: excludes one-time JIT/codegen compile, which a long-run
        # cluster amortizes; set PONTEM_BENCH_RUNS=1 for cold numbers
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # full object with per-query timings; totals at the END of the object so
    # a tail-truncated capture loses query names, not the headline number
    print(
        json.dumps(
            {
                "metric": "pontem_spark_suite_seconds",
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "n_queries": len(timings),
                "value": total,
            }
        )
    )
    # short tail-safe summary — the LAST stdout line always parses
    print(
        json.dumps(
            {
                "metric": "pontem_spark_suite_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
