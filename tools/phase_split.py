"""Split a query's wall time into build / plan / first-exec / warm-exec.

build  = Python-side DataFrame construction (includes any driver-side
         collect()s the builder runs, e.g. centroid training)
plan   = explain("formatted") on the built frame (parse+analyze+optimize)
exec1  = first noop write (includes codegen compile for this plan)
execN  = median of N further noop writes (steady state)

    python tools/phase_split.py q_ann_ivf_hier_g2_topk q_graph_pagerank ...
"""
from __future__ import annotations

import contextlib
import io
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3

    from pontem_spark.queries.registry import all_queries
    from pontem_spark.session import get_spark
    from pontem_spark.sources.tables import TABLES, load_table

    queries = all_queries()
    spark = get_spark(app_name="phase-split",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(100).mapInPandas(lambda it: it, "id long").count()

    out = {}
    for name in names:
        fn = queries[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            df.explain("formatted")
        t_plan = time.perf_counter() - t0

        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec1 = time.perf_counter() - t0

        warm = []
        for _ in range(runs):
            d2 = fn(spark, sf_dir)
            t0 = time.perf_counter()
            d2.write.format("noop").mode("overwrite").save()
            warm.append(time.perf_counter() - t0)
        warm.sort()
        out[name] = {
            "build": round(t_build, 3),
            "plan": round(t_plan, 3),
            "exec1": round(t_exec1, 3),
            "execN": round(warm[len(warm) // 2], 3),
        }
        print(f"# {name}: build={t_build:.2f} plan={t_plan:.2f} "
              f"exec1={t_exec1:.2f} execN={out[name]['execN']:.2f}",
              file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
