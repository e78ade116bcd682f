"""Scale-step measurement ruler (r8 verdict task 6; generalized r10).

Blows lineitem/orders/events/documents/embeddings up Nx by
union-exploding with REPLICA-SHIFTED keys (consistent across
orders<->lineitem so join fan-out stays linear, not quadratic), writes
the blown tables + passthrough copies of the dims to the out dir, then
runs the named registered queries once at sf0.1 and once at the
blow-up, printing the ratio table for SCALE.md.

Usage:
    python tools/scale_step.py build [--replicas 10] [--out scale10]
    python tools/scale_step.py run   [--out scale10] [--label sf1~]
                                     [--queries a,b,c]

NOT part of the test suite or bench gate — a scale-cliff detector
(skew, broadcast overflow, driver collects) that plan reading can miss.
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

SRC = Path("/root/testdata/sf0.1")
OUT = Path(__file__).resolve().parent.parent / "scale10"
REPLICAS = 10

# key shifts: larger than any sf0.1 key so replicas never collide.
# l_partkey shifts too — without it every replica emits the SAME part
# co-purchase pairs and the graph queries' distinct() collapses the
# blow-up back to 1x (observed on the first measurement pass). The blown
# graph is 10 disjoint copies: linear in nodes/edges/triangles, which is
# what a scale-step ruler needs. (Queries joining the part dim would
# lose matches — none of the QUERIES list does.)
SHIFTS = {
    "l_orderkey": 10_000_000,
    "o_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "event_id": 100_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}

QUERIES = [
    "q1_pricing_summary",
    "q_graph_triangles",
    "q_graph_pagerank",
    "q_graph_pagerank_dangling",
    "q_graph_kcore",
    "q_ann_ivf_hier_g2_topk",
    "q_ann_pq_adc_topk",
    "q_basket_association_rules",
    "q_dedup_minhash_jaccard",
    "q_events_session_metrics",
    "q_dedup_simhash_md5_pairs",
    "q_text_bm25_topk",
]


def get_session():
    import os

    # The ruler runs cluster-scale data in ONE JVM: at 100x the pagerank
    # edge checkpoint alone is ~110M symmetrized string-id rows (~10+ GB
    # deserialized), and 32 concurrent cache-unroll tasks cannot fit that
    # in the default 16g heap (measured OOM on a fresh session; a real
    # cluster spreads the same blocks over N executors). Size the heap for
    # the concentration artifact, not the algorithm.
    os.environ.setdefault("PONTEM_DRIVER_MEM", "48g")
    from pontem_spark.session import get_spark

    return get_spark()


def build(out: Path = OUT, replicas: int = REPLICAS) -> None:
    from pyspark.sql import functions as F

    spark = get_session()
    out.mkdir(exist_ok=True)
    blow = {"lineitem", "orders", "events", "documents", "embeddings"}
    for p in SRC.glob("*.parquet"):
        name = p.stem
        if name not in blow:
            shutil.copyfile(p, out / p.name)
            continue
        df = spark.read.parquet(str(p))
        parts = []
        for i in range(replicas):
            part = df
            for col, shift in SHIFTS.items():
                if col in part.columns:
                    part = part.withColumn(col, F.col(col) + F.lit(i * shift))
            if name == "events":
                # keep per-user session structure sane: shift each replica
                # by 400 days so sessions don't interleave across replicas
                part = part.withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {i * 400} DAYS")
                )
            parts.append(part)
        big = parts[0]
        for q in parts[1:]:
            big = big.unionByName(q)
        big.repartition(32).write.mode("overwrite").parquet(
            str(out / f"{name}.parquet")
        )
        print(f"built {name}: {replicas}x", flush=True)


def run(
    out: Path = OUT,
    label: str = "sf1~",
    queries: "list[str] | None" = None,
    factor: int | None = None,
) -> None:
    import __spark_entry__ as e

    spark = get_session()
    qs = e.queries()
    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # A cluster holding Nx the data has ~Nx the cores, so per-partition
    # shuffle bytes stay constant; a ruler that pins 32 partitions under
    # 30x data measures partition-count pressure, not the algorithm
    # (r11: triangles 41.3x at 32 partitions -> 20.3x at 256). Scale the
    # partition count with the step factor, capped so task-launch
    # overhead doesn't dominate the single-JVM run; AQE coalesces the
    # small stages back down.
    big_parts = min(base_parts * (factor or REPLICAS), 1024)
    rows = []
    for name in queries or QUERIES:
        fn = qs[name]
        rec = {"query": name}
        for label_, d, parts in (
            ("sf0.1", str(SRC), base_parts),
            (label, str(out), big_parts),
        ):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            try:
                # discard one warm-up run per (query, dir): codegen compile
                # and scan-cache effects otherwise dominate the small side
                fn(spark, d).write.format("noop").mode("overwrite").save()
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                rec[label_] = round(time.time() - t0, 2)
            except Exception as exc:  # noqa: BLE001
                rec[label_] = f"FAIL {type(exc).__name__}: {exc}"[:120]
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", str(base_parts))
        if isinstance(rec.get("sf0.1"), float) and isinstance(rec.get(label), float):
            rec["ratio"] = round(rec[label] / max(rec["sf0.1"], 1e-9), 1)
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    print(f"\n| query | sf0.1 s | {label} s | ratio |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['query']} | {r.get('sf0.1')} | {r.get(label)} | {r.get('ratio', '-')} |")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="run", choices=["build", "run"])
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument("--out", default=str(OUT))
    ap.add_argument("--label", default="sf1~")
    ap.add_argument("--queries", default=None,
                    help="comma-separated query names (default: QUERIES)")
    ap.add_argument("--factor", type=int, default=None,
                    help="scale factor of --out vs sf0.1 (drives the "
                         "shuffle-partition scaling; default: --replicas)")
    args = ap.parse_args()
    if args.mode == "build":
        build(Path(args.out), args.replicas)
    else:
        run(Path(args.out), args.label,
            args.queries.split(",") if args.queries else None,
            factor=args.factor)
