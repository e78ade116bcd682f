"""Quantile binning (pandas ``qcut``) as a scale-safe two-step plan.

``NTILE`` would be the one-liner, but it needs a GLOBAL sort — a
single-partition window that dies at scale. The scale-correct shape is:

1. one aggregate computes the boundary quantiles (exact ``percentile``
   here; swap for ``approx_percentile`` at 100 TB — the bucket rule is
   boundary-agnostic),
2. the q-1 boundaries travel as a broadcast single-row frame, and every
   row's bucket is ``#boundaries strictly below the value`` — a map-side
   array fold, no shuffle, no sort, no per-row job.

Boundaries are rounded before comparison so both engines bucket from the
same doubles (interpolated quantiles are the one place two engines'
arithmetic can drift an ulp).

Reference parity: the reference has no binning surface; pandas-API
extension (SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _rebalanced(df: DataFrame, cols: "list[str]") -> DataFrame:
    """Boundary-aggregate input: only the named columns, rebalanced.

    A single-file scan arrives as ONE partition, and the exact
    ``percentile`` aggregate buffers every value in its partial — so the
    whole partial-aggregation pass would run on one core while the rest
    idle (guide §2.5, input parallelism). Projecting first keeps the
    rebalance shuffle narrow (just the value/group columns); percentile
    partials merge order-insensitively, so the boundaries are
    bit-identical to the single-partition evaluation. On healthy
    multi-split input ensure_parallelism is a no-op."""
    from pontem_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df.select(*[F.col(c) for c in cols]))


def quantile_bins(
    df: DataFrame,
    col: str,
    q: int = 4,
    bucket_name: str = "bucket",
    round_digits: int = 2,
) -> DataFrame:
    """Append an equal-frequency bucket id in ``[0, q)`` for ``col``.

    Bucket = number of (rounded) quantile boundaries strictly below the
    value, so the bins are right-inclusive like pandas ``qcut``."""
    probs = [i / q for i in range(1, q)]
    probs_sql = ", ".join(repr(p) for p in probs)
    bnds = _rebalanced(df, [col]).agg(
        F.expr(
            f"transform(percentile(CAST({col} AS DOUBLE), array({probs_sql})), "
            f"b -> floor(b * {10.0 ** round_digits!r} + 0.5) / {10.0 ** round_digits!r})"
        ).alias("__bnds")
    )
    return (
        df.crossJoin(F.broadcast(bnds))
        .withColumn(
            bucket_name,
            F.expr(f"size(filter(__bnds, b -> CAST({col} AS DOUBLE) > b))"),
        )
        .drop("__bnds")
    )


def quantile_bins_oracle_sql(
    table: str, col: str, q: int = 4, round_digits: int = 2
) -> "tuple[str, str]":
    """DuckDB twin of :func:`quantile_bins`'s boundary list + bucket rule
    (returns a CTE body ``bnds AS (...)`` plus the bucket expression; the
    caller composes the final SELECT)."""
    items = ", ".join(
        f"ROUND(quantile_cont(CAST({col} AS DOUBLE), {i / q!r}), {round_digits})"
        for i in range(1, q)
    )
    cte = f"bnds AS (SELECT [{items}] AS b FROM {table})"
    bucket = f"CAST(len(list_filter(bnds.b, x -> CAST({col} AS DOUBLE) > x)) AS INTEGER)"
    return cte, bucket


def winsorize(
    df: DataFrame,
    col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_name: str | None = None,
    round_digits: int = 2,
) -> DataFrame:
    """Clip ``col`` to its [lower, upper] quantiles — the standard outlier
    tamer before normalization/training. Same scale shape as
    :func:`quantile_bins`: ONE percentile aggregate (→ approx_percentile at
    100 TB) broadcast as a single row, then a map-side LEAST/GREATEST per
    row; boundaries rounded so both engines clip from identical doubles."""
    out_name = out_name or f"{col}_winsorized"
    s = 10.0 ** round_digits
    bnds = _rebalanced(df, [col]).agg(
        F.expr(
            f"transform(percentile(CAST({col} AS DOUBLE), array({lower!r}, {upper!r})), "
            f"b -> floor(b * {s!r} + 0.5) / {s!r})"
        ).alias("__wb")
    )
    clipped = F.least(
        F.greatest(F.col(col).cast("double"), F.element_at("__wb", 1)),
        F.element_at("__wb", 2),
    )
    return (
        df.crossJoin(F.broadcast(bnds))
        .withColumn(out_name, clipped)
        .drop("__wb")
    )


def grouped_quantile_bins(
    df: DataFrame,
    group_col: str,
    col: str,
    q: int = 4,
    bucket_name: str = "bucket",
    round_digits: int = 2,
) -> DataFrame:
    """Per-GROUP equal-frequency binning — qcut within each stratum, so
    every group's rows spread evenly over its own ``[0, q)`` buckets (the
    per-language / per-source normalization a mixed corpus needs before
    thresholding; one global boundary set would let a dominant group set
    everyone's cutoffs).

    Same scale shape as :func:`quantile_bins`, widened per key: ONE
    aggregate computes each group's q-1 boundaries (→ approx_percentile at
    100 TB), the tiny boundary table broadcasts into an equi-join on the
    group key, and the bucket is a map-side array fold. No window, no sort,
    no per-group job."""
    probs = [i / q for i in range(1, q)]
    probs_sql = ", ".join(repr(p) for p in probs)
    s = 10.0 ** round_digits
    bnds = _rebalanced(df, [group_col, col]).groupBy(group_col).agg(
        F.expr(
            f"transform(percentile(CAST({col} AS DOUBLE), array({probs_sql})), "
            f"b -> floor(b * {s!r} + 0.5) / {s!r})"
        ).alias("__bnds")
    )
    # eqNullSafe: groupBy keeps NULL as a group of its own, so null-group
    # rows must match their own boundary row — a plain equi-join would
    # silently DROP every null-group row from the output
    joined = df.join(
        F.broadcast(bnds.withColumnRenamed(group_col, "__g")),
        F.col(group_col).eqNullSafe(F.col("__g")),
    )
    return (
        joined.withColumn(
            bucket_name,
            F.expr(f"size(filter(__bnds, b -> CAST({col} AS DOUBLE) > b))"),
        )
        .drop("__bnds", "__g")
    )


def grouped_quantile_bins_oracle_sql(
    table: str, group_col: str, col: str, q: int = 4, round_digits: int = 2
) -> "tuple[str, str]":
    """DuckDB twin of :func:`grouped_quantile_bins` (CTE + bucket expr; the
    caller joins ``bnds USING ({group_col})``)."""
    items = ", ".join(
        f"ROUND(quantile_cont(CAST({col} AS DOUBLE), {i / q!r}), {round_digits})"
        for i in range(1, q)
    )
    cte = f"bnds AS (SELECT {group_col}, [{items}] AS b FROM {table} GROUP BY {group_col})"
    bucket = f"CAST(len(list_filter(bnds.b, x -> CAST({col} AS DOUBLE) > x)) AS INTEGER)"
    return cte, bucket

def equal_width_bins(
    df: DataFrame,
    col: str,
    bins: "int | list[float]" = 10,
    bucket_name: str = "bucket",
    round_digits: int = 6,
) -> DataFrame:
    """pandas ``cut(labels=False, right=True)``: equal-width bucket ids in
    ``[0, bins)`` for ``col``, or explicit ascending edges.

    Same scale shape as :func:`quantile_bins`: for integer ``bins`` ONE
    min/max aggregate broadcast as a single row, then a map-side fold —
    bucket = count of INTERNAL edges strictly below the value (right-
    inclusive, values equal to an edge fall in the LOWER bin, pandas'
    right=True). Explicit edges skip the aggregate entirely (pure
    projection) and out-of-range values get a NULL bucket like pandas'
    NaN. Edges are rounded so two engines bucket from identical doubles."""
    s = 10.0 ** round_digits
    v = F.col(col).cast("double")
    missing = v.isNull() | F.isnan(v)
    if isinstance(bins, int):
        if bins < 1:
            raise ValueError(f"equal_width_bins: bins must be >= 1, got {bins}")
        if bins == 1:  # sequence(1, 0) would DESCEND in Spark, not be empty
            return df.withColumn(bucket_name, F.when(~missing, F.lit(0)))
        edges = df.agg(
            F.expr(
                f"transform(sequence(1, {bins - 1}), "
                f"i -> floor((min(CAST({col} AS DOUBLE)) + i * "
                f"(max(CAST({col} AS DOUBLE)) - min(CAST({col} AS DOUBLE))) / {bins}) "
                f"* {s!r} + 0.5) / {s!r})"
            ).alias("__edges")
        )
        bucket = F.expr(f"size(filter(__edges, e -> CAST({col} AS DOUBLE) > e))")
        return (
            df.crossJoin(F.broadcast(edges))
            .withColumn(bucket_name, F.when(~missing, bucket))
            .drop("__edges")
        )
    edges = sorted(float(b) for b in bins)
    if len(edges) < 2:
        raise ValueError("equal_width_bins: explicit edges need >= 2 values")
    inner = ", ".join(repr(e) for e in edges[1:-1])
    in_range = (v > F.lit(edges[0])) & (v <= F.lit(edges[-1]))
    bucket = F.expr(f"size(filter(array({inner}), e -> CAST({col} AS DOUBLE) > e))") if inner else F.lit(0)
    return df.withColumn(bucket_name, F.when(~missing & in_range, bucket))


def equal_width_bins_oracle_sql(
    table: str, col: str, bins: int = 10, round_digits: int = 6
) -> "tuple[str, str]":
    """DuckDB twin of integer-``bins`` :func:`equal_width_bins` (CTE +
    bucket expression; caller cross-joins the one-row CTE)."""
    s = 10.0 ** round_digits
    items = ", ".join(
        f"FLOOR((MIN(CAST({col} AS DOUBLE)) + {i} * "
        f"(MAX(CAST({col} AS DOUBLE)) - MIN(CAST({col} AS DOUBLE))) / {bins}) "
        f"* {s!r} + 0.5) / {s!r}"
        for i in range(1, bins)
    )
    cte = f"edges AS (SELECT [{items}] AS e FROM {table})"
    bucket = f"CAST(len(list_filter(edges.e, x -> CAST({col} AS DOUBLE) > x)) AS INTEGER)"
    return cte, bucket
