"""Round-15 contract fixes that need no SparkSession."""

import importlib.util
import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _bench():
    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_tail_safe_queries_line_fits_driver_tail():
    """r15 (VERDICT r14 #2): the driver keeps only the last ~2000 chars of
    bench stdout, and the per-query map at the head of the full-object
    line never survived (PERF_r14 per_query was empty). The compact line
    printed right before the summary must (a) fit the 2000-char tail
    together with the summary line, (b) report the SLOWEST queries so the
    budget cut drops only the cheap tail, and (c) parse as JSON with the
    '{"metric"' anchor _load_bench_baselines scans for."""
    bench = _bench()
    timings = {
        f"q_some_quite_long_query_name_{i:03d}": round(0.1 + i * 0.013, 3)
        for i in range(213)
    }
    line = bench._tail_safe_queries_line(timings, 0.1)
    summary = json.dumps(
        {
            "metric": "pontem_spark_suite_seconds",
            "value": 123.456,
            "unit": "sec",
            "sf": 0.1,
            "n_queries": 213,
            "n_failed": 0,
        }
    )
    assert len(line) + 1 + len(summary) <= 2000, len(line)
    assert line.startswith('{"metric"')
    obj = json.loads(line)
    assert obj["n_reported"] == len(obj["queries"]) > 0
    # every reported median >= every omitted median (slowest-first policy)
    omitted = set(timings) - set(obj["queries"])
    if omitted:
        assert min(obj["queries"].values()) >= max(timings[n] for n in omitted)
    # full 215-entry real-name map from the committed baseline also fits
    base = json.loads((ROOT / "BENCH_BASELINE.json").read_text())["queries"]
    line2 = bench._tail_safe_queries_line(base, 0.1)
    assert len(line2) + 1 + len(summary) <= 2000
