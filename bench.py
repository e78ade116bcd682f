#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-count via a noop
write) after a JVM/session warmup, so JIT and session startup don't pollute
per-query numbers.
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
    spark = get_spark(app_name="pontem-bench")
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
        best, n = None, 0
        for _ in range(runs):
            t0 = time.perf_counter()
            # count() forces full execution of every operator in the plan
            n = q.fn(spark, sf_dir).count()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        # best-of-N: excludes one-time JIT/codegen compile, which a long-run
        # cluster amortizes; set PONTEM_BENCH_RUNS=1 for cold numbers
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "pontem_spark_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
