"""Time-series resampling: fixed-interval downsample, gap fill, forward fill.

The pandas idiom ``df.resample('6H').mean().ffill()`` has no single Spark
operator, but its pieces map cleanly onto DataFrame primitives:

1. **resample** — floor each timestamp onto the interval grid with pure
   epoch arithmetic and aggregate per (group, bucket). One shuffle on the
   (group, bucket) key; partial aggregation is map-side, so at 100 TB the
   shuffle carries ~|groups × buckets| partial rows, not events.
2. **gap fill** — the complete bucket grid is ``sequence(min_bucket,
   max_bucket, interval)`` EXPLODED from the per-group span row. The span
   aggregate is |groups| rows; the grid is |groups × buckets| rows built
   without touching the raw events again. A left join (grid ← buckets)
   lands missing intervals as explicit null rows. Both sides hash-partition
   on the same key, and the grid side is tiny — AQE broadcasts it when it
   fits.
3. **forward fill** — ``last(value, ignorenulls=True)`` over a
   rows-unbounded-preceding window per group. One window pass; the
   partition key is the series key, so state per task is one scalar.

At scale every step shuffles metadata-sized frames (grids and buckets, not
raw events); only step 1 reads the input, and its aggregate is the minimal
one-pass plan.

Reference parity: the reference has no time-series surface
(`pontem/series/series.py` is positional/arith only); this extends the
promised analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from pontem_spark.functions.compat import rnd


def bucket_ts(ts_col: Column | str, interval_sec: int) -> Column:
    """Floor a timestamp onto the ``interval_sec`` grid (epoch arithmetic —
    integer division, no string round-trip, codegen-friendly)."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    epoch = F.unix_timestamp(ts)  # bigint seconds, UTC session pin
    return F.timestamp_seconds((epoch - (epoch % interval_sec)))


def resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    interval_sec: int,
    bucket_name: str = "bucket_ts",
) -> DataFrame:
    """Downsample to fixed intervals: per (group, bucket) count/sum/avg.

    Returns one row per OBSERVED bucket; compose with :func:`gap_fill` for
    the complete grid."""
    b = bucket_ts(ts_col, interval_sec).alias(bucket_name)
    return df.groupBy(*group_cols, b).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("total"),
        F.avg(value_col).alias("avg_value"),
    )


def gap_fill(
    resampled: DataFrame,
    group_cols: list[str],
    bucket_name: str,
    interval_sec: int,
    materialize: bool = True,
) -> DataFrame:
    """Expand each group's observed [min, max] bucket span to the full
    interval grid, left-joining observed buckets so gaps become explicit
    null rows (``n`` coalesced to 0).

    The span aggregate and the join probe BOTH reference ``resampled`` —
    and Spark duplicates a shared subtree per join branch, which would scan
    the raw input twice. Since the resampled frame is only
    |groups × buckets| rows, ``materialize=True`` (default) pins it with
    ``localCheckpoint`` so the expensive upstream scan+agg runs exactly
    once and both branches read the checkpointed rows (the same idiom as
    core/frame.py's reset_index). Pass ``materialize=False`` to keep the
    plan fully lazy (e.g. when the caller already persisted it)."""
    if materialize:
        resampled = resampled.localCheckpoint(eager=True)
    span = resampled.groupBy(*group_cols).agg(
        F.min(bucket_name).alias("__lo"), F.max(bucket_name).alias("__hi")
    )
    grid = span.select(
        *group_cols,
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {interval_sec} SECONDS")
            )
        ).alias(bucket_name),
    )
    filled = grid.join(resampled, on=[*group_cols, bucket_name], how="left")
    return filled.withColumn("n", F.coalesce(F.col("n"), F.lit(0)))


def forward_fill(
    df: DataFrame, group_cols: list[str], order_col: str, cols: list[str]
) -> DataFrame:
    """Forward-fill nulls in ``cols`` with the last non-null value per group
    in ``order_col`` order (``last(ignorenulls)`` over an unbounded-preceding
    rows frame — single window pass, scalar state)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def time_decay_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    halflife_s: float,
    round_digits: int = 4,
) -> DataFrame:
    """Exponential time-decay aggregate per key: recency-weighted mean and
    weighted total with weight ``2^(-age/halflife)``, aged from each key's
    own most recent event.

    The irregular-timestamp complement of Series.ewm (which is
    position-based): feature-store freshness scoring, decayed engagement
    counters, recency-weighted revenue. Two passes over the events, both
    map-side-combinable aggregates on the key — no window, no sort: the
    first pass finds each key's max timestamp (bigint max), the second
    folds the weighted sums. At 100 TB both shuffles carry ~|keys| partial
    rows. The weight is computed in double space from microsecond ages
    (unix_micros — TIMESTAMP_NTZ-safe), deterministic across engines up to
    last-ulp pow(); outputs are rounded.
    """
    us = F.unix_micros(F.col(ts_col))
    ref = df.groupBy(key_col).agg(F.max(us).alias("__ref_us"))
    j = df.join(ref, key_col)
    age_s = (F.col("__ref_us") - F.unix_micros(F.col(ts_col))).cast("double") / F.lit(1e6)
    w = F.pow(F.lit(2.0), -age_s / F.lit(float(halflife_s)))
    v = F.col(val_col).cast("double")
    return (
        j.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum(w * v), round_digits).alias("decayed_total"),
            rnd(F.sum(w * v) / F.sum(w), round_digits).alias("decayed_mean"),
        )
    )


def rfm_features(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    n_tiles: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """RFM feature extraction per key: recency (days since the key's last
    event, against the corpus max), frequency (event count), monetary
    (value sum), each with an ntile quantile score — the classic
    behavioral feature block emitted by one aggregate pass.

    One groupBy carries all three base features (map-side combinable,
    shuffle ~|keys|); the corpus reference time is a broadcast 1-row max.
    The three ntile windows run over the |keys|-row AGGREGATE, not the
    events, with total orders (feature, key) so the tile boundaries are
    engine-deterministic. Recency scores ascend (recent = tile 1);
    frequency/monetary descend (heaviest = tile 1).
    """
    us = F.unix_micros(F.col(ts_col))
    per_key = df.groupBy(key_col).agg(
        F.max(us).alias("__last_us"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        rnd(F.sum(F.col(val_col).cast("double")), round_digits).alias("monetary"),
    )
    ref = df.agg(F.max(us).alias("__ref_us"))
    base = per_key.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days",
        F.floor((F.col("__ref_us") - F.col("__last_us")) / F.lit(86400000000)).cast(
            "bigint"
        ),
    )
    r_w = Window.orderBy(F.col("recency_days").asc(), F.col(key_col).asc())
    f_w = Window.orderBy(F.col("frequency").desc(), F.col(key_col).asc())
    m_w = Window.orderBy(F.col("monetary").desc(), F.col(key_col).asc())
    return base.select(
        key_col,
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(n_tiles).over(r_w).alias("r_score"),
        F.ntile(n_tiles).over(f_w).alias("f_score"),
        F.ntile(n_tiles).over(m_w).alias("m_score"),
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Per-key CUSUM changepoint: the position where the cumulative sum
    of deviations from the key's mean peaks in magnitude — the classic
    level-shift detector for metric series (a drift that per-point
    z-scores never see, because no single point is extreme).

    Plan: the key's mean is a whole-partition window (no ordering), the
    CUSUM an ordered running sum — both share ONE key-partitioned
    exchange; the argmax is a struct-max AGGREGATE (max |cusum|, then
    earliest position via the negated order index), combining map-side,
    not a rank window. Cross-engine: the argmax compares the ROUNDED
    cusum, so a last-ulp accumulation difference cannot move the
    changepoint.

    ``order_col`` must be an integer/orderable position whose negation
    is valid (use day indexes, not dates).

    Returns (key, cp_at, cusum, n_points) per key.
    """
    from pontem_spark.functions.compat import rnd

    w_part = Window.partitionBy(key_col)
    w_run = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    v = F.col(value_col).cast("double")
    dev = v - F.sum(v).over(w_part) / F.count(F.lit(1)).over(w_part)
    # Materialize the running sum before ranking on it: a window ordered
    # by a lateral alias from the same projection is unsupported.
    cum = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("pos"),
        F.sum(dev).over(w_run).alias("__cusum"),
        F.count(F.lit(1)).over(w_part).alias("__n"),
    ).select(
        "k", "pos", "__n", rnd(F.col("__cusum"), round_digits).alias("__r")
    )
    best = cum.groupBy(F.col("k").alias(key_col)).agg(
        F.max(
            F.struct(
                F.abs(F.col("__r")).alias("a"),
                (-F.col("pos")).alias("negpos"),
                F.col("__r").alias("r"),
            )
        ).alias("__b"),
        F.max("__n").alias("n_points"),
    )
    return best.select(
        key_col,
        (-F.col("__b.negpos")).alias("cp_at"),
        F.col("__b.r").alias("cusum"),
        F.col("n_points").cast("bigint").alias("n_points"),
    )


def acf_table(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    max_lag: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Per-key autocorrelation function for lags 1..``max_lag`` — the
    seasonality/persistence screen run before choosing a forecasting or
    gapfill strategy.

    Plan: every lag column comes from the SAME (key, order) window sort
    (Catalyst plans one Exchange + one Sort for all of them), then ONE
    aggregate computes each lag's Pearson moments over its valid pairs —
    6 x max_lag agg expressions, all partial-agg combinable, unpivoted
    to (key, lag, acf) rows by a constant-size stack. The facts shuffle
    once; nothing else scales with input size.

    Pearson per lag uses the pairwise-complete convention (like
    pandas.Series.autocorr): moments only over rows where the lagged
    value exists. Degenerate lags (fewer than 3 pairs or ~zero variance)
    return NULL rather than dividing by zero.
    """
    from pontem_spark.functions.compat import rnd

    w = Window.partitionBy(key_col).orderBy(order_col)
    v = F.col(value_col).cast("double")
    lagged = df.select(
        F.col(key_col).alias("k"),
        v.alias("__x"),
        *[F.lag(v, i).over(w).alias(f"__y{i}") for i in range(1, max_lag + 1)],
    )
    aggs = []
    for i in range(1, max_lag + 1):
        y = F.col(f"__y{i}")
        pair = y.isNotNull()
        x = F.when(pair, F.col("__x"))
        aggs += [
            F.count(F.when(pair, F.lit(1))).alias(f"n{i}"),
            F.sum(x).alias(f"sx{i}"),
            F.sum(y).alias(f"sy{i}"),
            F.sum(x * x).alias(f"sxx{i}"),
            F.sum(y * y).alias(f"syy{i}"),
            F.sum(x * y).alias(f"sxy{i}"),
        ]
    g = lagged.groupBy("k").agg(*aggs)
    outs = []
    for i in range(1, max_lag + 1):
        n = F.col(f"n{i}").cast("double")
        cov = F.col(f"sxy{i}") / n - (F.col(f"sx{i}") / n) * (F.col(f"sy{i}") / n)
        vx = F.col(f"sxx{i}") / n - (F.col(f"sx{i}") / n) * (F.col(f"sx{i}") / n)
        vy = F.col(f"syy{i}") / n - (F.col(f"sy{i}") / n) * (F.col(f"sy{i}") / n)
        acf = F.when(
            (F.col(f"n{i}") >= 3) & (vx > 1e-12) & (vy > 1e-12),
            rnd(cov / F.sqrt(vx * vy), round_digits),
        )
        outs.append(F.struct(F.lit(i).alias("lag"), acf.alias("acf")))
    return g.select(
        F.col("k").alias(key_col),
        F.explode(F.array(*outs)).alias("__o"),
    ).select(key_col, F.col("__o.lag").alias("lag"), F.col("__o.acf").alias("acf"))


def interarrival_percentiles(
    df: DataFrame,
    key_col: str,
    group_col: str,
    ts_col: str,
    order_cols: "list[str] | None" = None,
    percentiles: "list[float] | None" = None,
    round_digits: int = 3,
) -> DataFrame:
    """Inter-arrival latency distribution per group: the p50/p95/p99
    "how bursty is this stream" report (service latency, user dwell
    time, queue gaps).

    Plan: one lag window per sequence key computes the gaps (the same
    (key, order) shuffle a sessionize pass uses), then one exact
    percentile aggregate per group — gaps never shuffle twice. The
    percentile aggregate is exact (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, the established cross-engine pair); outputs are
    rounded half-up.
    """
    percentiles = percentiles or [0.5, 0.95, 0.99]
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    gap = (
        F.unix_timestamp(F.col(ts_col))
        - F.unix_timestamp(F.lag(F.col(ts_col)).over(w))
    ).cast("double")
    gaps = df.select(F.col(group_col), gap.alias("__gap")).filter(
        F.col("__gap").isNotNull()
    )
    from pontem_spark.functions.compat import rnd

    aggs = [F.count(F.lit(1)).alias("n_gaps")]
    for p in percentiles:
        name = f"p{int(round(p * 100))}"
        aggs.append(
            rnd(F.percentile(F.col("__gap"), F.lit(p)), round_digits).alias(name)
        )
    return gaps.groupBy(group_col).agg(*aggs)


def rolling_correlation(
    df: DataFrame,
    key_col: str,
    order_col: str,
    x_col: str,
    y_col: str,
    window_rows: int = 7,
    round_digits: int = 4,
) -> DataFrame:
    """Rolling Pearson correlation between two columns over the trailing
    ``window_rows`` rows per key — the co-movement monitor (metric pairs
    that should track each other; divergence = incident).

    Plan: ALL six moment sums (n, Σx, Σy, Σx², Σy², Σxy) ride the SAME
    (key, order, trailing-frame) window — Catalyst plans one Exchange +
    one Sort for the lot. Correlation derives from the moments per row;
    windows with fewer than 3 rows or ~zero variance yield NULL (ANSI-
    safe). The compare-ready output is rounded half-up.
    """
    from pontem_spark.functions.compat import rnd

    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    sx, sy = F.sum(x).over(w), F.sum(y).over(w)
    sxx, syy = F.sum(x * x).over(w), F.sum(y * y).over(w)
    sxy = F.sum(x * y).over(w)
    cov = sxy / n - (sx / n) * (sy / n)
    vx = sxx / n - (sx / n) * (sx / n)
    vy = syy / n - (sy / n) * (sy / n)
    corr = F.when(
        (n >= 3) & (vx > 1e-12) & (vy > 1e-12),
        rnd(cov / F.sqrt(vx * vy), round_digits),
    )
    return df.select(
        key_col, order_col, F.col(x_col), F.col(y_col),
        corr.alias("rolling_corr"),
    )
