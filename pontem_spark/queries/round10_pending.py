"""Round-11 query candidates, written and locally oracle-proven in round 10.

NOT registered yet (r9 verdict task 1: register NOTHING in r10 — any new
registration sorts never-green FIRST and evicts a stale re-check from the
50-slot window). Two candidates:

1. q_ts_series_resample — driver evidence for the r9 Series.resample API
   (core/series.py::_Resampler — the pandas COMPLETE-grid semantics with
   origin='start_day' anchoring), so far local-differential only: the
   oracle replays the grid as a DuckDB generate_series with the same
   midnight-of-first-day anchor and floor-of-epoch bucketing, over a
   freq that divides a day ('6h') AND one that doesn't ('7h') — the
   non-dividing freq is what distinguishes start_day anchoring from a
   naive epoch floor cross-engine.
2. q_dedup_simhash_collapsed_pairs — driver evidence for the r10 scale
   path (simhash_band_candidates collapse_identical, flat 1.0x at 30x
   exact-duplicate pressure vs 83.7x uncollapsed; SCALE.md r10).
3. q_ts_asfreq — driver evidence for the r10 Series.asfreq surface
   (grid anchored at the FIRST observation, exact-match values +
   positional ffill; the oracle replays the grid as generate_series and
   the fill as a DuckDB ASOF join).

Exercised by tests/test_pending_queries.py at sf0.001 and sf0.01 now, so
all three arrive green. Flip module: queries/round10.py (one import line
in registry.all_queries() in r11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.sources.tables import load_table

# (name, fn, oracle) triples for round-11 registration.
PENDING: "list[tuple[str, object, str]]" = []


def _pending(name: str, oracle: str):
    def deco(fn):
        from pontem_spark.functions.compat import portable_round_sql

        PENDING.append((name, fn, portable_round_sql(oracle)))
        return fn

    return deco


@_pending(
    "q_ts_series_resample",
    oracle="""
    WITH b AS MATERIALIZED (
        SELECT CAST(FLOOR(epoch(date_trunc('day', MIN(ts)))) AS BIGINT) AS a,
               CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS mn,
               CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS mx
        FROM events
    ), freqs AS (
        SELECT * FROM (VALUES ('6h', 21600), ('7h', 25200)) AS t(freq, sec)
    ), bounds AS MATERIALIZED (
        SELECT f.freq, f.sec, b.a,
               b.a + (b.mn - b.a) - (b.mn - b.a) % f.sec AS lo,
               b.a + (b.mx - b.a) - (b.mx - b.a) % f.sec AS hi
        FROM freqs f CROSS JOIN b
    ), ev AS MATERIALIZED (
        SELECT bo.freq,
               bo.a + (CAST(FLOOR(epoch(e.ts)) AS BIGINT) - bo.a)
                    - (CAST(FLOOR(epoch(e.ts)) AS BIGINT) - bo.a) % bo.sec
                   AS bsec,
               e.value
        FROM events e CROSS JOIN bounds bo
    ), aggd AS MATERIALIZED (
        SELECT freq, bsec,
               CAST(COUNT(value) AS BIGINT) AS n,
               AVG(value) AS av
        FROM ev GROUP BY 1, 2
    ), grid AS (
        SELECT bo.freq, UNNEST(generate_series(bo.lo, bo.hi, bo.sec)) AS bsec
        FROM bounds bo
    )
    SELECT g.freq,
           strftime(make_timestamp(g.bsec * 1000000), '%Y-%m-%d %H:%M:%S')
               AS bucket,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
           ROUND(a.av, 2) AS avg_value
    FROM grid g
    LEFT JOIN aggd a ON g.freq = a.freq AND g.bsec = a.bsec
    """,
)
def q_ts_series_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.resample through the wrapper — driver evidence for the
    pandas-complete grid (empty buckets present: count 0, mean NULL) and
    the origin='start_day' anchor. '6h' divides a day (anchor-invariant);
    '7h' does not — its buckets land on midnight-of-first-day multiples,
    so an epoch-floor implementation on either side hash-mismatches. The
    grid itself is a broadcast 1-row bounds frame + sequence explode
    (core/series.py::_Resampler) — never a driver-side date_range."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    s = from_spark(ev).set_index("ts")["value"]
    parts = []
    for rule in ("6h", "7h"):
        n = s.resample(rule).count().to_spark(value_name="n_events")
        avg = s.resample(rule).mean().to_spark(value_name="avg_value")
        j = n.join(avg, "ts")
        parts.append(
            j.select(
                F.lit(rule).alias("freq"),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
                F.col("n_events").cast("bigint").alias("n_events"),
                rnd(F.col("avg_value"), 2).alias("avg_value"),
            )
        )
    return parts[0].unionByName(parts[1])


@_pending(
    "q_ts_asfreq",
    oracle="""
    WITH ev AS MATERIALIZED (
        SELECT date_trunc('second', ts) AS ts, AVG(value) AS v
        FROM events GROUP BY 1
    ), b AS MATERIALIZED (
        SELECT CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS mn,
               CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS mx
        FROM ev
    ), grid AS MATERIALIZED (
        SELECT UNNEST(generate_series(b.mn, b.mx, 5400)) AS g FROM b
    ), evs AS MATERIALIZED (
        SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, v FROM ev
    ), fwd AS (
        SELECT g.g, e.v FROM grid g ASOF LEFT JOIN evs e ON g.g >= e.es
    )
    SELECT strftime(make_timestamp(x.g * 1000000), '%Y-%m-%d %H:%M:%S')
               AS bucket,
           ROUND(e.v, 2) AS v_exact,
           ROUND(f.v, 2) AS v_ffill
    FROM grid x
    LEFT JOIN evs e ON x.g = e.es
    LEFT JOIN fwd f ON x.g = f.g
    """,
)
def q_ts_asfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.asfreq through the wrapper — driver evidence for the r10
    asfreq surface (core/series.py::asfreq): the grid anchors at the
    FIRST observation (index[0], NOT start_day — the anchor that
    distinguishes asfreq from resample cross-engine), v_exact takes
    values at exact grid timestamps only, v_ffill fills positionally
    (the oracle replays it as a DuckDB ASOF join). '90min' doesn't
    divide the first-observation offset, so an epoch- or
    midnight-anchored grid on either side hash-mismatches. Events are
    second-truncated first: sub-second timestamps never land on a
    whole-second grid."""
    from pontem_spark.core import from_spark
    from pontem_spark.functions.compat import rnd

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("second", F.col("ts")).alias("ts"), "value"
    )
    per_ts = ev.groupBy("ts").agg(F.avg("value").alias("v"))
    s = from_spark(per_ts).set_index("ts")["v"]
    exact = s.asfreq("90min").to_spark(value_name="v_exact")
    fwd = s.asfreq("90min", method="ffill").to_spark(value_name="v_ffill")
    j = exact.join(fwd, "ts")
    return j.select(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        rnd(F.col("v_exact"), 2).alias("v_exact"),
        rnd(F.col("v_ffill"), 2).alias("v_ffill"),
    )


from pontem_spark.queries.oracle_fragments import (
    SIMHASH_MD5_FP_CTES as _SIMHASH_MD5_FP_CTES,
)


@_pending(
    "q_dedup_simhash_collapsed_pairs",
    oracle=f"""
    WITH {_SIMHASH_MD5_FP_CTES},
    reps AS (
        SELECT simhash60, MIN(doc_id) AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM fp GROUP BY 1
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash60, b.simhash60)) AS INTEGER) AS hamming,
           a.n_members AS members_a, b.n_members AS members_b
    FROM reps a JOIN reps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash60, b.simhash60)) <= 8
    """,
)
def q_dedup_simhash_collapsed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT-DUPLICATE-pressure scale path earned in the r10 30x scale
    step (simhash_band_candidates collapse_identical — SCALE.md r10):
    identical fingerprints collapse to one min-id representative carrying
    its member count, the 9-band pigeonhole join runs over the DISTINCT
    fingerprint set (linear no matter how duplicate-heavy the corpus —
    measured flat 1.0x at 30x blown data vs 83.7x uncollapsed), and the
    oracle's naive all-pairs scan over the same representatives proves the
    banding still loses zero recall."""
    from pontem_spark.operators.dedup import (
        hamming_distance,
        simhash_band_candidates,
        simhash_md5,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = simhash_md5(docs, "doc_id", "text", bits=60)
    reps = fp.groupBy("simhash60").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_members")
    )
    # carry_cols rides the member counts THROUGH the (cached) band join —
    # a join back through reps would re-derive the whole simhash fold per
    # reference (Catalyst diamond re-derivation; measured 3.7 s vs 2 s at
    # sf0.1), and the cached bands frame is read by both self-join sides.
    cand = simhash_band_candidates(
        reps, "doc_id", "simhash60", bits=60, n_bands=9,
        carry_hash=True, carry_cols=["n_members"],
    )
    return (
        cand.withColumn(
            "hamming", hamming_distance(F.col("h_a"), F.col("h_b")).cast("int")
        )
        .filter(F.col("hamming") <= 8)
        .select(
            "id_a", "id_b", "hamming",
            F.col("n_members_a").alias("members_a"),
            F.col("n_members_b").alias("members_b"),
        )
        .distinct()
    )
