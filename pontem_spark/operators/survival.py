"""Survival analysis: the Kaplan-Meier product-limit estimator.

Time-to-event with right-censoring — retention ("how long until the
customer orders again"), hardware lifetimes, label latency. The KM
estimator S(t) = prod over death times t_i <= t of (1 - d_i / n_i),
where d_i are events at t_i and n_i the subjects still at risk.

Scale shape: the input is ONE ROW PER SUBJECT (the caller's rollup —
typically a per-key aggregate of a 100 TB fact table). This operator
adds a single groupBy over the (bucketed) time axis, after which ALL
window work runs over |distinct times| rows — bounded by the bucketing,
not by the subject count. The subject table itself is aggregated in one
partial-agg pass and never sorted: the at-risk counts come from the
identity n_i = N - prefix(d + c), not from sorting subjects.

Cross-engine determinism: d_i / n_i is an integer-ratio double, so both
engines feed bit-identical inputs into ln(); the product is exp(sum ln)
on both sides and the output is rounded half-up to ``round_digits`` —
the last-ulp libm freedom is orders of magnitude below the grain.
The d_i = n_i boundary (survival hits exactly zero) never reaches
ln(0): a cumulative flag pins survival to 0 from that time onward.

Reference parity: extension surface (SURVEY.md §2.G lifecycle
analytics); the reference engine has no survival operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pontem_spark.functions.compat import rnd


def kaplan_meier(
    subjects: DataFrame,
    time_col: str,
    event_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Kaplan-Meier curve from one-row-per-subject (time, event) data.

    ``event_col`` is 1 for an observed event, 0 for right-censoring at
    ``time_col``. Ties between deaths and censorings at the same time
    follow the standard convention: deaths first (same-time censored
    subjects still count as at-risk).

    Returns one row per DEATH time: (time, at_risk, events, survival).
    """
    per_t = subjects.groupBy(F.col(time_col).alias("t")).agg(
        F.sum(F.col(event_col)).alias("d"),
        F.sum(F.lit(1) - F.col(event_col)).alias("c"),
    )

    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    # N as a window over the |times| aggregate rows, not subjects.agg():
    # the agg+crossJoin diamond would make Catalyst run the caller's
    # subject rollup TWICE (once per branch). One tree, one rollup.
    cur = per_t.withColumn(
        "at_risk",
        F.sum(F.col("d") + F.col("c")).over(w_all)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    # ln(1 - d/n) with the d = n boundary routed around ln(0): the factor
    # contributes ln(1) = 0 and the cumulative zero flag pins S to 0.
    frac = F.col("d") / F.col("at_risk").cast("double")
    ln_factor = F.log(
        F.when(F.col("d") < F.col("at_risk"), F.lit(1.0) - frac).otherwise(F.lit(1.0))
    )
    hit_zero = F.max(
        F.when(F.col("d") == F.col("at_risk"), F.lit(1)).otherwise(F.lit(0))
    ).over(w_cum)
    surv = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(ln_factor).over(w_cum))
    )
    return (
        cur.withColumn("survival", rnd(surv, round_digits))
        .filter(F.col("d") > 0)
        .select(
            F.col("t").alias(time_col),
            F.col("at_risk").cast("bigint").alias("at_risk"),
            F.col("d").cast("bigint").alias("events"),
            "survival",
        )
    )
