"""Deterministic sampling operators for training-data curation.

Random `df.sample()` is the wrong tool at 100 TB: it is neither reproducible
across runs/engines nor resumable after a partial failure, and per-stratum
rates can't be audited. Everything here derives the keep/drop decision from a
content-independent md5 of the row id, so the SAME rows are selected on every
engine, every cluster size, every retry — and an oracle can re-derive the
sample exactly.

Plan shape: a pure narrow projection + filter (no shuffle, no RNG state, no
driver coordination); the filter sits directly on the scan, so at scale the
sample costs one pass and prunes everything downstream.

Reference parity: the reference has no sampling surface at all
(`pontem/series/series.py` — Series-only); this module is part of the
LLM-pipeline extension the rebuild promises.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(id_col: str, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from the md5 of the id.

    Two hex chars → ``ascii(c1)*256 + ascii(c2)`` mod buckets: only
    ``substr``/``ascii`` arithmetic, so DuckDB reproduces it byte-for-byte
    (no BASE/conv dependency). Not perfectly uniform (hex ascii has 16
    values per char) but deterministic and well-spread — the properties that
    matter for reproducible splits.
    """
    h = F.md5(F.col(id_col).cast("string"))
    c1 = F.ascii(F.substring(h, 1, 1))
    c2 = F.ascii(F.substring(h, 2, 1))
    return (c1 * 256 + c2) % buckets


def hash_bucket_sql(id_expr: str, buckets: int = 100) -> str:
    """The DuckDB twin of :func:`hash_bucket` for oracle SQL."""
    h = f"md5(CAST({id_expr} AS VARCHAR))"
    return f"((ascii(substr({h}, 1, 1)) * 256 + ascii(substr({h}, 2, 1))) % {buckets})"


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    percents: Mapping[str, int],
    default_percent: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sample: keep a row iff its hash bucket is
    below the stratum's percentage.

    The corpus-rebalancing shape (e.g. downsample dominant languages, keep
    all of the rare ones). ``percents`` maps stratum value → keep percent
    [0, 100]; unlisted strata use ``default_percent``.
    """
    bucket = hash_bucket(id_col, 100)
    rate: Column = F.lit(default_percent)
    for value, pct in percents.items():
        rate = F.when(F.col(stratum_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)


def hash_value16(id_col: str) -> Column:
    """Deterministic near-uniform value in [0, 65536) from the first four
    md5 hex digits of the id. Each hex char maps to its nibble via
    ``ascii(c) - 48 - 39*(c >= 'a')`` — pure arithmetic both engines compute
    identically (no conv/BASE). Unlike :func:`hash_bucket`'s two-char sum
    (fine for splits, lumpy as a rate), all 16-bit values are equally
    likely, so a threshold ``v < floor(rate * 65536)`` realizes ``rate`` to
    within 1/65536."""
    h = F.md5(F.col(id_col).cast("string"))

    def nibble(i: int) -> Column:
        a = F.ascii(F.substring(h, i, 1))
        return a - 48 - 39 * (a >= 97).cast("int")

    return ((nibble(1) * 4096) + (nibble(2) * 256) + (nibble(3) * 16) + nibble(4)).cast(
        "bigint"
    )


def hash_value16_sql(id_expr: str) -> str:
    """DuckDB twin of :func:`hash_value16` for oracle SQL."""
    h = f"md5(CAST({id_expr} AS VARCHAR))"

    def nib(i: int) -> str:
        a = f"ascii(substr({h}, {i}, 1))"
        return f"({a} - 48 - 39 * CAST({a} >= 97 AS INTEGER))"

    return f"({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)})"


def temperature_resample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based corpus rebalancing: keep each row of stratum ``s``
    with probability ∝ ``count(s)**(alpha-1)``, normalized so the rarest
    stratum keeps everything — the multilingual-LM sampling scheme (sampled
    share ∝ count**alpha; alpha=1 keeps the natural distribution, alpha→0
    flattens it).

    The keep decision is a deterministic md5-derived 16-bit value
    (:func:`hash_value16`), so the selected rows are reproducible across
    engines/retries, an oracle can re-derive them exactly, and the realized
    per-stratum rate lands within 1/65536 of the target. Per-stratum
    thresholds come from one tiny count aggregate joined back via broadcast
    — two scans of nothing but the stratum column, no RNG, no driver-side
    rates table.

    Only ``alpha=0.5`` is exposed for oracle-checked use (weight =
    1/sqrt(cnt) — sqrt and division are IEEE-correctly-rounded in both
    engines, so thresholds agree bit-for-bit; arbitrary ``pow`` is not that
    portable). Other alphas work but are checked by the repo's own tests.
    """
    if alpha == 0.5:
        weight = F.lit(1.0) / F.sqrt(F.col("__cnt"))
    else:
        weight = F.pow(F.col("__cnt"), F.lit(alpha - 1.0))
    counts = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__w", weight)
    )
    max_w = counts.agg(F.max("__w").alias("__mw"))
    thr = (
        counts.crossJoin(F.broadcast(max_w))
        .withColumn(
            "__thr",
            F.floor(F.col("__w") / F.col("__mw") * F.lit(65536.0)).cast("bigint"),
        )
        .select(stratum_col, "__thr")
    )
    kept = df.join(F.broadcast(thr), on=stratum_col, how="inner").filter(
        hash_value16(id_col) < F.col("__thr")
    )
    return kept.drop("__thr")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    strata: "list[str] | None" = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the
    Efraimidis–Spirakis exponential race): every row gets priority
    ``ln(u)/w`` from a content-independent uniform ``u`` (md5-derived, so
    the SAME race re-runs identically on any engine or cluster size) and
    its weight; the top-k priorities ARE a weighted sample without
    replacement. Rows with null or non-positive weight have zero mass and
    are excluded.

    The priority is deliberately NOT rounded: an absolute rounding scale
    collapses large-weight priorities (|ln(u)/w| shrinks below any fixed
    quantum as w grows) and would degrade the race to an id sort among
    heavy rows. Determinism instead rests on the key structure: u takes
    65536 discrete values strictly inside (0, 1) — ``(h+1)/65537`` so even
    h=65535 keeps ln(u) < 0 — which keeps distinct (u, w) pairs' key gaps
    many orders of magnitude above the engines' ≤1-ulp ``ln`` differences,
    and exact ties (same u, same w) break on the id.

    Scale shape: global top-k is sort+limit — Spark plans
    TakeOrderedAndProject (per-partition top-k, then a k-row merge; no
    global sort materializes). With ``strata``, a window partitioned by the
    strata takes top-k per group — one shuffle on the strata keys.
    """
    u = (hash_value16(id_col) + F.lit(1)) / F.lit(65537.0)
    key = F.log(u) / F.col(weight_col)
    base = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    if strata:
        from pyspark.sql import Window

        w = Window.partitionBy(*strata).orderBy(key.desc(), F.col(id_col).asc())
        return (
            base.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    return base.orderBy(key.desc(), F.col(id_col).asc()).limit(k)


def weighted_sample_key_sql(id_expr: str, weight_expr: str) -> str:
    """DuckDB twin of :func:`weighted_sample`'s priority."""
    u = f"(({hash_value16_sql(id_expr)} + 1) / 65537.0)"
    return f"(ln({u}) / ({weight_expr}))"


def mix_sources(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weights: Mapping[str, float],
) -> DataFrame:
    """Rebalance a corpus to an EXPLICIT target mix (e.g. 50% code, 30%
    web, 20% books) by deterministic downsampling — the complement of
    :func:`temperature_resample`, which derives its mix from counts.

    The largest feasible corpus honoring the mix keeps every row of the
    binding stratum (the one with the smallest ``count/weight`` ratio) and
    downsamples the rest to proportion: ``rate_s = min_t(cnt_t/w_t) * w_s /
    cnt_s``. Strata absent from ``weights`` are dropped (weight 0).

    Keep decisions come from :func:`hash_value16` (content-independent
    md5), so selection is reproducible across engines and retries and an
    oracle can re-derive the surviving rows exactly. Cost: one count
    aggregate over the stratum column (tiny), a broadcast threshold join,
    and a map-side filter — two scans, no RNG, no driver-side rate math, so
    the same plan runs unchanged on a 100 TB corpus.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    w: Column = F.lit(None).cast("double")
    for value, wt in weights.items():
        w = F.when(F.col(stratum_col) == value, F.lit(float(wt))).otherwise(w)
    counts = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
        .withColumn("__w", w)
        .filter(F.col("__w").isNotNull())
    )
    binding = counts.agg(F.min(F.col("__cnt") / F.col("__w")).alias("__mr"))
    thr = (
        counts.crossJoin(F.broadcast(binding))
        .withColumn(
            "__thr",
            F.floor(
                F.col("__mr") * F.col("__w") / F.col("__cnt") * F.lit(65536.0)
            ).cast("bigint"),
        )
        .select(stratum_col, "__thr")
    )
    return (
        df.join(F.broadcast(thr), on=stratum_col, how="inner")
        .filter(hash_value16(id_col) < F.col("__thr"))
        .drop("__thr")
    )


def mix_sources_sql(
    table: str,
    stratum_col: str,
    id_col: str,
    weights: Mapping[str, float],
) -> str:
    """DuckDB twin of :func:`mix_sources` — identical double-division
    order (``min(cnt/w) * w / cnt``) so thresholds agree bit-for-bit."""
    cases = " ".join(
        f"WHEN '{v}' THEN CAST({float(wt)} AS DOUBLE)" for v, wt in weights.items()
    )
    return f"""(
    WITH __c AS (
        SELECT {stratum_col},
               CAST(COUNT(*) AS DOUBLE) AS __cnt,
               CASE {stratum_col} {cases} END AS __w
        FROM {table} GROUP BY {stratum_col}
    ), __r AS (
        SELECT {stratum_col},
               CAST(FLOOR(MIN(__cnt / __w) OVER () * __w / __cnt * 65536.0)
                    AS BIGINT) AS __thr
        FROM __c WHERE __w IS NOT NULL
    )
    SELECT t.* FROM {table} t
    JOIN __r USING ({stratum_col})
    WHERE {hash_value16_sql(f't.{id_col}')} < __thr
    )"""


def group_split(
    df: DataFrame,
    group_col: str,
    splits: "Mapping[str, int]",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every row of a GROUP lands
    in the same split, decided by the group key's hash bucket.

    Row-hash splits (train_test_split) leak when rows are correlated —
    near-identical documents from one source, chunks of one parent doc,
    events of one user — because siblings straddle the boundary and the
    eval set rehearses the training set. Splitting on the group key is
    the GroupShuffleSplit shape: ``splits`` maps label → percent, summed
    ≤ 100 in iteration order (the remainder falls into the LAST label).

    Pure map-side projection — the md5 bucket is computed per row from
    the group column already present, no shuffle, no group materialization;
    at 100 TB this is a free column. Deterministic across engines via the
    ascii-arithmetic bucket (hash_bucket above).
    """
    bucket = hash_bucket(group_col, 100)
    labels = list(splits.items())
    cases, hi = [], 0
    for label, pct in labels[:-1]:
        hi += pct
        cases.append((hi, label))
    expr: Column = F.lit(labels[-1][0])
    for threshold, label in reversed(cases):
        expr = F.when(bucket < threshold, F.lit(label)).otherwise(expr)
    return df.withColumn("split", expr)


def negative_samples(df: DataFrame, id_col: str, k: int = 2) -> DataFrame:
    """Deterministic negative pairing for contrastive training: each
    anchor id gets ``k`` negatives at fixed ring offsets — the doc at
    position ``(pos + i·step) mod n`` for slot i, step = ``n // (k+1)``.

    Positions come from the engine's DISTRIBUTED enumeration
    (core reset_index: literal range boundaries + per-bucket counts +
    partitioned windows — no single-partition Exchange), ordered by the
    id, so the pairing is reproducible run-to-run and engine-to-engine.
    Ring offsets spread each anchor's negatives uniformly across the
    id-ordered corpus — id order is unrelated to content, which is
    exactly what "random" negatives need — and ``step ≥ 1`` (guarded)
    means a negative can never equal its anchor. The pairing is one
    explode(k) + one equi-join on the computed position: shuffles scale
    with k·n rows of (id, position) pairs, never document bodies.
    """
    from pontem_spark.core import from_spark

    pos = (
        from_spark(df.select(id_col), index_col=id_col)
        .reset_index()
        .to_spark()
    )
    idx_name = [c for c in pos.columns if c != id_col][0]
    pos = pos.select(F.col(id_col), F.col(idx_name).alias("__pos"))
    n_total = pos.agg(
        F.count(F.lit(1)).alias("__n")
    )
    anchors = (
        pos.crossJoin(F.broadcast(n_total))
        .filter(F.col("__n") > k)  # loud no-op guard: too few docs
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col("__pos"),
            F.col("__n"),
            F.explode(
                F.sequence(F.lit(1), F.lit(k))
            ).alias("slot"),
        )
        .withColumn("__step", F.floor(F.col("__n") / F.lit(k + 1.0)).cast("bigint"))
        .withColumn(
            "__neg_pos",
            (F.col("__pos") + F.col("slot") * F.greatest(F.col("__step"), F.lit(1)))
            % F.col("__n"),
        )
    )
    negs = pos.select(F.col(id_col).alias("negative_id"), F.col("__pos").alias("__neg_pos"))
    return anchors.join(negs, "__neg_pos").select(
        "anchor_id", "slot", "negative_id"
    )
