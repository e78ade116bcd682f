"""Experiment-analysis operators: Welch's t-test and CUPED adjustment.

The A/B readout shape: unit-level (user) metrics → per-arm moment sums →
closed-form statistics. Everything after the unit rollup is arithmetic
over TWO rows, so the whole report costs one partial-agg-combinable
shuffle of |units| rows no matter how large the fact table was.

CUPED (Deng et al., WSDM 2013, public): regress the experiment-period
metric on a pre-period covariate and analyze the residual
``post - theta * (pre - mean(pre))``; with the OLS
``theta = cov(pre, post) / var(pre)`` the residual variance drops by the
squared correlation, tightening the t-test at zero extra data cost.
Because the adjustment is linear, the adjusted mean/variance per arm
derive from the SAME moment sums (n, Σpre, Σpost, Σpre², Σpost²,
Σpre·post) — no second pass over units.

Cross-engine determinism: all outputs are rounded half-up
(functions/compat.rnd); the inputs to every division/sqrt are moment
sums whose last-ulp accumulation-order differences are far below the
rounding grain.

Reference parity: extension surface (SURVEY.md §2.G experiment
analytics); the reference engine has no statistics operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pontem_spark.functions.compat import rnd


def ab_report(
    units: DataFrame,
    group_col: str,
    pre_col: str,
    post_col: str,
    group_a: str = "A",
    group_b: str = "B",
    round_digits: int = 4,
) -> DataFrame:
    """One-row A/B report: Welch t on the raw metric, CUPED theta, Welch t
    on the adjusted metric, and the variance-reduction fraction.

    ``units`` has one row per experimental unit. Plan: one groupBy(arm)
    moment aggregate (2 output rows), one 1-row conditional-agg pivot —
    the unit table is scanned exactly once.
    """
    g = units.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pre_col).alias("sx"),
        F.sum(post_col).alias("sy"),
        F.sum(F.col(pre_col) * F.col(pre_col)).alias("sxx"),
        F.sum(F.col(post_col) * F.col(post_col)).alias("syy"),
        F.sum(F.col(pre_col) * F.col(post_col)).alias("sxy"),
    )

    # Pivot the two arm rows into one row of columns (tiny conditional agg).
    def arm(c: str, which: str) -> Column:
        return F.max(F.when(F.col("g") == which, F.col(c)))

    one = g.agg(
        *[arm(c, group_a).alias(f"{c}_a") for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]],
        *[arm(c, group_b).alias(f"{c}_b") for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]],
    )

    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n_t = n_a + n_b

    # Global (pooled) central moments for theta — sums are additive.
    sx_t = F.col("sx_a") + F.col("sx_b")
    sy_t = F.col("sy_a") + F.col("sy_b")
    sxx_t = F.col("sxx_a") + F.col("sxx_b")
    syy_t = F.col("syy_a") + F.col("syy_b")
    sxy_t = F.col("sxy_a") + F.col("sxy_b")
    cov_t = sxy_t / n_t - (sx_t / n_t) * (sy_t / n_t)
    varx_t = sxx_t / n_t - (sx_t / n_t) * (sx_t / n_t)
    vary_t = syy_t / n_t - (sy_t / n_t) * (sy_t / n_t)
    theta = cov_t / varx_t

    def welch(m_a: Column, v_a: Column, m_b: Column, v_b: Column) -> tuple[Column, Column]:
        se2_a, se2_b = v_a / n_a, v_b / n_b
        se2 = se2_a + se2_b
        t = (m_a - m_b) / F.sqrt(se2)
        dof = (se2 * se2) / (
            se2_a * se2_a / (n_a - F.lit(1.0)) + se2_b * se2_b / (n_b - F.lit(1.0))
        )
        return t, dof

    def arm_stats(suffix: str) -> dict[str, Column]:
        n = F.col(f"n_{suffix}").cast("double")
        mx = F.col(f"sx_{suffix}") / n
        my = F.col(f"sy_{suffix}") / n
        # Sample (ddof=1) variances/covariance from raw moments.
        vx = (F.col(f"sxx_{suffix}") - n * mx * mx) / (n - F.lit(1.0))
        vy = (F.col(f"syy_{suffix}") - n * my * my) / (n - F.lit(1.0))
        cxy = (F.col(f"sxy_{suffix}") - n * mx * my) / (n - F.lit(1.0))
        # Linear-adjustment moments: adj = post - theta * (pre - global mean).
        m_adj = my - theta * (mx - sx_t / n_t)
        v_adj = vy - F.lit(2.0) * theta * cxy + theta * theta * vx
        return {"my": my, "vy": vy, "m_adj": m_adj, "v_adj": v_adj}

    a, b = arm_stats("a"), arm_stats("b")
    t_post, dof_post = welch(a["my"], a["vy"], b["my"], b["vy"])
    t_cuped, dof_cuped = welch(a["m_adj"], a["v_adj"], b["m_adj"], b["v_adj"])
    # With OLS theta the pooled residual variance is (1 - rho^2) * var(post).
    var_reduction = (cov_t * cov_t) / (varx_t * vary_t)

    return one.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        rnd(a["my"], round_digits).alias("mean_post_a"),
        rnd(b["my"], round_digits).alias("mean_post_b"),
        rnd(t_post, round_digits).alias("t_post"),
        rnd(dof_post, round_digits).alias("dof_post"),
        rnd(theta, round_digits).alias("theta"),
        rnd(t_cuped, round_digits).alias("t_cuped"),
        rnd(dof_cuped, round_digits).alias("dof_cuped"),
        rnd(var_reduction, round_digits).alias("var_reduction"),
    )


def mann_whitney_u(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test — the nonparametric
    companion to :func:`ab_report`'s Welch t: compares locations without
    assuming normality, robust to the heavy tails that inflate a t-test's
    variance estimate.

    Plan: rank arithmetic runs over DISTINCT values, not rows — one
    groupBy(v) carries per-sample counts, one ordered window over the
    |distinct| aggregate assigns average ranks (tied blocks get
    cum_prev + (cnt+1)/2), and a final 1-row aggregate folds the rank
    sum, the tie-correction term Σ(t³−t), and the normal approximation.
    A duplicate-heavy 100 TB column ranks in |distinct| space; a fully
    continuous one degrades to a sort of the aggregated values — the
    same cost the statistic's semantics require.

    Cross-engine: U is EXACT (integer ranks and half-ranks; no float
    accumulation freedom), the z statistic is rounded half-up. No
    continuity correction is applied (document for consumers comparing
    against scipy's default ``use_continuity=True``).

    Returns one row: (n_a, n_b, u_a, z).
    """
    from pyspark.sql import Window

    u = df_a.select(
        F.col(col).cast("double").alias("__v"), F.lit(0).alias("__is_b")
    ).unionByName(
        df_b.select(F.col(col).cast("double").alias("__v"), F.lit(1).alias("__is_b"))
    ).filter(F.col("__v").isNotNull())
    byv = u.groupBy("__v").agg(
        F.sum(F.lit(1) - F.col("__is_b")).alias("na"),
        F.sum("__is_b").alias("nb"),
    )
    w_prev = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    cnt = F.col("na") + F.col("nb")
    avg_rank = (
        F.coalesce(F.sum(cnt).over(w_prev), F.lit(0)).cast("double")
        + (cnt.cast("double") + F.lit(1.0)) / F.lit(2.0)
    )
    ranked = byv.select(
        "na", "nb", cnt.alias("t"), avg_rank.alias("r")
    )
    one = ranked.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum(F.col("na") * F.col("r")).alias("ra"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
    )
    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = n_a + n_b
    u_a = F.col("ra") - n_a * (n_a + F.lit(1.0)) / F.lit(2.0)
    mu = n_a * n_b / F.lit(2.0)
    sigma = F.sqrt(
        (n_a * n_b / F.lit(12.0))
        * ((n + F.lit(1.0)) - F.col("ties") / (n * (n - F.lit(1.0))))
    )
    return one.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        u_a.alias("u_a"),
        rnd((u_a - mu) / sigma, round_digits).alias("z"),
    )
