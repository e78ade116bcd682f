"""Second batch of round-8 query candidates, written and locally
oracle-proven in round 7 (continuation session).

Same discipline as ``round7_pending``: NOT registered, because the r7
driver window is budgeted exactly (see that module's docstring); round 8
flips these on via ``registry.register``. Every entry here is exercised
against DuckDB by tests/test_pending_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pontem_spark.sources.tables import load_table

# (name, fn, oracle) triples for round-8 registration.
PENDING: "list[tuple[str, object, str]]" = []


def _pending(name: str, oracle: str):
    def deco(fn):
        from pontem_spark.functions.compat import portable_round_sql

        PENDING.append((name, fn, portable_round_sql(oracle)))
        return fn

    return deco


@_pending(
    "q_basket_association_rules",
    oracle="""
    WITH bi AS (
        SELECT DISTINCT l_orderkey AS basket, p_brand AS item
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ), ic AS (
        SELECT item, COUNT(*) AS n_item FROM bi GROUP BY item
    ), nb AS (
        SELECT COUNT(DISTINCT basket) AS n FROM bi
    ), pc AS (
        SELECT x.item AS a, y.item AS b, COUNT(*) AS pair_n
        FROM bi x JOIN bi y ON x.basket = y.basket AND x.item < y.item
        GROUP BY 1, 2
    ), freq AS (
        SELECT a, b, pair_n FROM pc, nb
        WHERE CAST(pair_n AS DOUBLE) >= n / 64.0
    ), dir AS (
        SELECT a AS antecedent, b AS consequent, pair_n FROM freq
        UNION ALL
        SELECT b AS antecedent, a AS consequent, pair_n FROM freq
    )
    SELECT d.antecedent, d.consequent, CAST(d.pair_n AS BIGINT) AS pair_n,
           ROUND(d.pair_n / CAST(nb.n AS DOUBLE), 6) AS support,
           ROUND(d.pair_n / CAST(ia.n_item AS DOUBLE), 6) AS confidence,
           ROUND((d.pair_n * CAST(nb.n AS DOUBLE))
                 / (ia.n_item * CAST(ib.n_item AS DOUBLE)), 6) AS lift
    FROM dir d
    CROSS JOIN nb
    JOIN ic ia ON ia.item = d.antecedent
    JOIN ic ib ON ib.item = d.consequent
    """,
)
def q_basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-level market-basket rules over order baskets: which part
    brands co-occur in the same order beyond chance. Apriori broadcast
    prefilter → ONE basket shuffle → map-side array pair expansion (no
    fact self-join; the oracle's quadratic self-join is the semantics
    being proven, not the plan). min_support = 1/64 exactly (binary-
    representable, so the threshold compare is engine-identical).
    The 64-item basket cap never binds here (≤ 25 brands exist), so the
    capless oracle is equivalent at every SF (operators/basket.py).
    """
    from pontem_spark.operators.basket import association_rules

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    facts = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
    return association_rules(facts, "basket", "item", min_support=1.0 / 64.0)


@_pending(
    "q_events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_state
        FROM events
    ), pairs AS (
        SELECT prev_state, event_type AS state,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq WHERE prev_state IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_state, state, n_transitions,
           ROUND(n_transitions / CAST(SUM(n_transitions)
                 OVER (PARTITION BY prev_state) AS DOUBLE), 6) AS p
    FROM pairs
    """,
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    ONE window shuffle on user_id (ordered by ts with event_id as the
    deterministic tiebreaker), then an S x S count aggregate whose row
    totals come from a window OVER the aggregate — one tree, facts
    scanned once (operators/sequences.py::transition_matrix)."""
    from pontem_spark.operators.sequences import transition_matrix

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return transition_matrix(ev, "user_id", ["ts", "event_id"], "event_type")


def _ab_oracle() -> str:
    from pontem_spark.operators.sampling import hash_bucket_sql

    grp = f"CASE WHEN ({hash_bucket_sql('user_id', 2)}) = 0 THEN 'A' ELSE 'B' END"
    return f"""
    WITH u AS (
        SELECT user_id,
               COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value END), 0.0) AS pre,
               COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value END), 0.0) AS post,
               {grp} AS grp
        FROM events GROUP BY user_id
    ), g AS (
        SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(pre) AS sx, SUM(post) AS sy,
               SUM(pre * pre) AS sxx, SUM(post * post) AS syy,
               SUM(pre * post) AS sxy
        FROM u GROUP BY grp
    ), one AS (
        SELECT
            MAX(CASE WHEN grp = 'A' THEN n END) AS n_a,
            MAX(CASE WHEN grp = 'A' THEN sx END) AS sx_a,
            MAX(CASE WHEN grp = 'A' THEN sy END) AS sy_a,
            MAX(CASE WHEN grp = 'A' THEN sxx END) AS sxx_a,
            MAX(CASE WHEN grp = 'A' THEN syy END) AS syy_a,
            MAX(CASE WHEN grp = 'A' THEN sxy END) AS sxy_a,
            MAX(CASE WHEN grp = 'B' THEN n END) AS n_b,
            MAX(CASE WHEN grp = 'B' THEN sx END) AS sx_b,
            MAX(CASE WHEN grp = 'B' THEN sy END) AS sy_b,
            MAX(CASE WHEN grp = 'B' THEN sxx END) AS sxx_b,
            MAX(CASE WHEN grp = 'B' THEN syy END) AS syy_b,
            MAX(CASE WHEN grp = 'B' THEN sxy END) AS sxy_b
        FROM g
    ), d AS (
        SELECT *,
            n_a + n_b AS n_t,
            sx_a + sx_b AS sx_t, sy_a + sy_b AS sy_t,
            sxx_a + sxx_b AS sxx_t, syy_a + syy_b AS syy_t,
            sxy_a + sxy_b AS sxy_t
        FROM one
    ), d2 AS (
        SELECT *,
            sxy_t / n_t - (sx_t / n_t) * (sy_t / n_t) AS cov_t,
            sxx_t / n_t - (sx_t / n_t) * (sx_t / n_t) AS varx_t,
            syy_t / n_t - (sy_t / n_t) * (sy_t / n_t) AS vary_t
        FROM d
    ), d3 AS (
        SELECT *, cov_t / varx_t AS theta FROM d2
    ), d4 AS (
        SELECT *,
            sx_a / n_a AS mx_a, sy_a / n_a AS my_a,
            sx_b / n_b AS mx_b, sy_b / n_b AS my_b
        FROM d3
    ), d5 AS (
        SELECT *,
            (sxx_a - n_a * mx_a * mx_a) / (n_a - 1.0) AS vx_a,
            (syy_a - n_a * my_a * my_a) / (n_a - 1.0) AS vy_a,
            (sxy_a - n_a * mx_a * my_a) / (n_a - 1.0) AS cxy_a,
            (sxx_b - n_b * mx_b * mx_b) / (n_b - 1.0) AS vx_b,
            (syy_b - n_b * my_b * my_b) / (n_b - 1.0) AS vy_b,
            (sxy_b - n_b * mx_b * my_b) / (n_b - 1.0) AS cxy_b
        FROM d4
    ), d6 AS (
        SELECT *,
            my_a - theta * (mx_a - sx_t / n_t) AS madj_a,
            vy_a - 2.0 * theta * cxy_a + theta * theta * vx_a AS vadj_a,
            my_b - theta * (mx_b - sx_t / n_t) AS madj_b,
            vy_b - 2.0 * theta * cxy_b + theta * theta * vx_b AS vadj_b
        FROM d5
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(my_a, 4) AS mean_post_a, ROUND(my_b, 4) AS mean_post_b,
           ROUND((my_a - my_b) / sqrt(vy_a / n_a + vy_b / n_b), 4) AS t_post,
           ROUND(((vy_a / n_a + vy_b / n_b) * (vy_a / n_a + vy_b / n_b))
                 / ((vy_a / n_a) * (vy_a / n_a) / (n_a - 1.0)
                    + (vy_b / n_b) * (vy_b / n_b) / (n_b - 1.0)), 4) AS dof_post,
           ROUND(theta, 4) AS theta,
           ROUND((madj_a - madj_b) / sqrt(vadj_a / n_a + vadj_b / n_b), 4) AS t_cuped,
           ROUND(((vadj_a / n_a + vadj_b / n_b) * (vadj_a / n_a + vadj_b / n_b))
                 / ((vadj_a / n_a) * (vadj_a / n_a) / (n_a - 1.0)
                    + (vadj_b / n_b) * (vadj_b / n_b) / (n_b - 1.0)), 4) AS dof_cuped,
           ROUND((cov_t * cov_t) / (varx_t * vary_t), 4) AS var_reduction
    FROM d6
    """


@_pending("q_abtest_welch_cuped", _ab_oracle())
def q_abtest_welch_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout over events: users hash-split into two arms
    (engine-portable md5 bucket), pre/post per-user metric sums around a
    mid-window cut, then Welch's t on the raw metric, pooled-OLS CUPED
    theta, Welch's t on the adjusted metric, and the rho-squared variance
    reduction — ONE unit-rollup shuffle, one 2-row moment aggregate, zero
    second passes (operators/abtest.py::ab_report)."""
    from pontem_spark.operators.abtest import ab_report
    from pontem_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    cut = F.lit("2024-01-16").cast("timestamp")
    units = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < cut, F.col("value"))), F.lit(0.0)).alias("pre"),
        F.coalesce(F.sum(F.when(F.col("ts") >= cut, F.col("value"))), F.lit(0.0)).alias("post"),
    ).withColumn(
        "grp", F.when(hash_bucket("user_id", 2) == 0, F.lit("A")).otherwise(F.lit("B"))
    )
    return ab_report(units, "grp", "pre", "post")


@_pending(
    "q_events_seasonal_anomaly",
    oracle="""
    WITH base AS (
        SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
               CAST(COUNT(value) AS BIGINT) AS n,
               SUM(value) AS s, SUM(value * value) AS ss
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), b2 AS (
        SELECT event_type, hr, n, s / n AS m, ss / n - (s / n) * (s / n) AS varp
        FROM base
    )
    SELECT e.event_id, e.event_type, b.hr, e.value,
           ROUND((e.value - b.m) / sqrt(b.varp), 3) AS z
    FROM events e
    JOIN b2 b ON e.event_type = b.event_type
             AND CAST(EXTRACT(hour FROM e.ts) AS INTEGER) = b.hr
    WHERE e.value IS NOT NULL AND b.n >= 5 AND b.varp > 1e-12
      AND abs(ROUND((e.value - b.m) / sqrt(b.varp), 3)) >= 2.0
    """,
)
def q_events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Season-relative anomaly gate: each event z-scored against its
    (event_type, hour-of-day) baseline. The baseline is a partial-agg
    groupBy producing |types| x 24 rows broadcast back onto the facts —
    the fact table is never shuffled or sorted, and the threshold
    compares the ROUNDED z so last-ulp engine skew cannot flip a flag
    (operators/profile.py::seasonal_anomalies)."""
    from pontem_spark.operators.profile import seasonal_anomalies

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    ).withColumn("hr", F.hour("ts"))
    return seasonal_anomalies(
        ev, ["event_type", "hr"], "value", ["event_id"], threshold=2.0
    )


@_pending(
    "q_survival_repeat_order",
    oracle="""
    WITH f AS (
        SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS t0
        FROM orders GROUP BY 1
    ), s AS (
        SELECT f.o_custkey, f.t0, MIN(CAST(o.o_orderdate AS DATE)) AS t1
        FROM f LEFT JOIN orders o
          ON o.o_custkey = f.o_custkey AND CAST(o.o_orderdate AS DATE) > f.t0
        GROUP BY 1, 2
    ), subj AS (
        SELECT o_custkey,
               CASE WHEN t1 IS NOT NULL AND date_diff('day', t0, t1) <= 365
                    THEN 1 ELSE 0 END AS ev,
               CAST(FLOOR((CASE WHEN t1 IS NOT NULL AND date_diff('day', t0, t1) <= 365
                                THEN date_diff('day', t0, t1) ELSE 365 END) / 30.0)
                    AS BIGINT) * 30 AS t_days
        FROM s
    ), pt AS (
        SELECT t_days, CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(1 - ev) AS BIGINT) AS c
        FROM subj GROUP BY 1
    ), n AS (SELECT COUNT(*) AS N FROM subj),
    r AS (
        SELECT t_days, d, c,
               CAST(N - COALESCE(SUM(d + c) OVER (ORDER BY t_days
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS at_risk
        FROM pt, n
    ), r2 AS (
        SELECT *,
               CASE WHEN MAX(CASE WHEN d = at_risk THEN 1 ELSE 0 END)
                         OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) = 1
                    THEN 0.0
                    ELSE exp(SUM(ln(CASE WHEN d < at_risk
                                         THEN 1.0 - d / CAST(at_risk AS DOUBLE)
                                         ELSE 1.0 END))
                             OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW))
               END AS surv
        FROM r
    )
    SELECT t_days, at_risk, d AS events, ROUND(surv, 4) AS survival
    FROM r2 WHERE d > 0
    """,
)
def q_survival_repeat_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention: days from each customer's FIRST order to
    their SECOND (distinct-date) order, right-censored at a 365-day
    horizon, bucketed to 30-day intervals. The subject rollup is ONE
    shuffle of orders (sorted distinct order-date arrays per customer);
    everything after runs over <= 13 time-bucket rows. The d = n
    boundary is routed around ln(0) on both engines
    (operators/survival.py::kaplan_meier)."""
    from pontem_spark.operators.survival import kaplan_meier

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    per_cust = orders.groupBy("o_custkey").agg(
        F.array_sort(F.collect_set(F.col("o_orderdate").cast("date"))).alias("__dates")
    )
    dd = F.datediff(
        F.try_element_at(F.col("__dates"), F.lit(2)), F.element_at(F.col("__dates"), 1)
    )
    subj = per_cust.select(
        F.when(dd.isNotNull() & (dd <= 365), F.lit(1)).otherwise(F.lit(0)).alias("ev"),
        (
            F.floor(
                F.when(dd.isNotNull() & (dd <= 365), dd).otherwise(F.lit(365)) / F.lit(30.0)
            )
            * 30
        ).alias("t_days"),
    )
    return kaplan_meier(subj, "t_days", "ev")


@_pending(
    "q_events_attribution",
    oracle="""
    WITH t AS (
        SELECT user_id AS u, ts AS t_ts, event_id AS t_id, event_type AS touch_type
        FROM events WHERE event_type IN ('click', 'view')
    ), c AS (
        SELECT user_id AS cu, ts AS c_ts, event_id AS c_id,
               CAST(value AS DOUBLE) AS val
        FROM events WHERE event_type = 'purchase'
    ), cand AS (
        SELECT * FROM c JOIN t
          ON t.u = c.cu AND t.t_ts <= c.c_ts
         AND t.t_ts > c.c_ts - INTERVAL 24 HOURS
    ), r AS (
        SELECT *,
            ROW_NUMBER() OVER (PARTITION BY c_id ORDER BY t_ts DESC, t_id DESC) AS rn_last,
            ROW_NUMBER() OVER (PARTITION BY c_id ORDER BY t_ts ASC, t_id ASC) AS rn_first,
            COUNT(*) OVER (PARTITION BY c_id) AS n
        FROM cand
    )
    SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(CASE WHEN rn_first = 1 THEN val ELSE 0.0 END), 4) AS credit_first,
           ROUND(SUM(CASE WHEN rn_last = 1 THEN val ELSE 0.0 END), 4) AS credit_last,
           ROUND(SUM(val / n), 4) AS credit_linear
    FROM r GROUP BY 1
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution of purchase value to the click/view
    touches in the preceding 24 h: first/last/linear credit per touch
    type in ONE bounded range join + one window shuffle on conversion id
    (operators/sequences.py::attribution_credits)."""
    from pontem_spark.operators.sequences import attribution_credits

    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("click", "view"))
    convs = ev.filter(F.col("event_type") == "purchase")
    return attribution_credits(
        touches, convs, "user_id", "ts", "event_id", "event_type", "value",
        lookback_hours=24,
    )


def _ks_oracle() -> str:
    from pontem_spark.operators.binning import equal_width_bins_oracle_sql

    cte, bucket = equal_width_bins_oracle_sql("u", "__v", bins=64)
    return f"""
    WITH u AS (
        SELECT CAST(value AS DOUBLE) AS __v, 0 AS __is_b
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        UNION ALL
        SELECT CAST(value AS DOUBLE), 1
        FROM events WHERE event_type = 'click' AND value IS NOT NULL
    ), {cte}, counts AS (
        SELECT {bucket} AS bucket, SUM(1 - __is_b) AS na, SUM(__is_b) AS nb
        FROM u, edges GROUP BY 1
    ), cums AS (
        SELECT bucket,
            SUM(na) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS ca,
            SUM(nb) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cb,
            SUM(na) OVER () AS ta, SUM(nb) OVER () AS tb
        FROM counts
    )
    SELECT ROUND(abs(CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
                     - CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE)), 6) AS ks_stat,
           CAST(bucket AS INTEGER) AS ks_bucket
    FROM cums ORDER BY 1 DESC, 2 ASC LIMIT 1
    """


@_pending("q_profile_ks_drift", _ks_oracle())
def q_profile_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS between purchase and click value
    distributions: shared 64-bin equal-width grid (one broadcast min/max
    edge row), map-side bucketing, then CDF windows over 64 rows only.
    Integer-count cumulatives make the statistic bit-identical across
    engines (operators/profile.py::ks_two_sample)."""
    from pontem_spark.operators.profile import ks_two_sample

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    a = ev.filter(F.col("event_type") == "purchase").select("value")
    b = ev.filter(F.col("event_type") == "click").select("value")
    return ks_two_sample(a, b, "value", bins=64)


@_pending(
    "q_profile_benford",
    oracle="""
    WITH base AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(ABS(CAST(o_totalprice AS DOUBLE)))
                                     AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders
        WHERE o_totalprice IS NOT NULL
          AND FLOOR(ABS(CAST(o_totalprice AS DOUBLE))) >= 1
    ), counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY 1
    ), tot AS (SELECT SUM(n) AS t FROM counts)
    SELECT digit, n,
           ROUND(n / CAST(t AS DOUBLE), 6) AS obs_share,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS expected_share
    FROM counts, tot
    """,
)
def q_profile_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profile of order totals: string-based digit
    extraction from the floored integer part (zero float freedom — no
    log10-mantissa boundary risk), one groupBy to 9 rows, broadcast
    total (operators/profile.py::benford_profile)."""
    from pontem_spark.operators.profile import benford_profile

    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    return benford_profile(orders, "o_totalprice")


@_pending(
    "q_cdc_scd2_status_history",
    oracle="""
    WITH base AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
               LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    ), surv AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus FROM base
        WHERE prev IS NULL OR prev IS DISTINCT FROM o_orderstatus
    )
    SELECT o_custkey, o_orderstatus,
           o_orderdate AS effective_from,
           LEAD(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS effective_to,
           LEAD(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
    FROM surv
    """,
)
def q_cdc_scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the order-status change stream:
    version-compression (lag) + interval stitching (lead) share ONE
    key-partitioned exchange — the filter between the two windows
    preserves partitioning (operators/sequences.py::scd2_intervals)."""
    from pontem_spark.operators.sequences import scd2_intervals

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus"
    )
    return scd2_intervals(
        orders, "o_custkey", ["o_orderdate", "o_orderkey"], ["o_orderstatus"]
    )


@_pending(
    "q_profile_concentration",
    oracle="""
    WITH per AS (
        SELECT o_custkey AS k, SUM(CAST(o_totalprice AS DOUBLE)) AS x
        FROM orders GROUP BY 1
    ), r AS (
        SELECT k, x, ROW_NUMBER() OVER (ORDER BY x DESC, k DESC) AS j FROM per
    ), one AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS tot,
               SUM(j * x) AS sjx, SUM(x * x) AS sxx,
               SUM(CASE WHEN j = 1 THEN x ELSE 0.0 END) AS t1,
               SUM(CASE WHEN j <= 10 THEN x ELSE 0.0 END) AS tn
        FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_keys,
           ROUND((2.0 * ((n + 1.0) * tot - sjx)) / (n * tot) - (n + 1.0) / n, 6) AS gini,
           ROUND(sxx / (tot * tot), 6) AS hhi,
           ROUND(t1 / tot, 6) AS top1_share,
           ROUND(tn / tot, 6) AS top10_share
    FROM one
    """,
)
def q_profile_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-revenue concentration: Gini + HHI + top-1/top-10 shares
    in one |keys|-row rank window and one 1-row aggregate (the
    descending-rank identity avoids a second ranking pass)
    (operators/profile.py::concentration_report)."""
    from pontem_spark.operators.profile import concentration_report

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return concentration_report(orders, "o_custkey", "o_totalprice", top_n=10)


@_pending(
    "q_ts_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS pos,
               SUM(value) AS v
        FROM events GROUP BY 1, 2
    ), base AS (
        SELECT event_type, pos, v,
               SUM(v) OVER (PARTITION BY event_type) AS s,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ), cum AS (
        SELECT event_type, pos, n,
               ROUND(SUM(v - s / n) OVER (PARTITION BY event_type ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS r
        FROM base
    ), pick AS (
        SELECT event_type, pos, r, n,
               ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY abs(r) DESC, pos ASC) AS rn
        FROM cum
    )
    SELECT event_type, pos AS cp_at, r AS cusum, CAST(n AS BIGINT) AS n_points
    FROM pick WHERE rn = 1
    """,
)
def q_ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM level-shift detection over daily value
    totals: mean and running deviation sum share one key-partitioned
    exchange; the argmax is a map-side-combinable struct-max on the
    ROUNDED cusum (operators/timeseries.py::cusum_changepoints)."""
    from pontem_spark.operators.timeseries import cusum_changepoints

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    ).agg(F.sum("value").alias("daily_value"))
    return cusum_changepoints(daily, "event_type", "day_idx", "daily_value").select(
        "event_type",
        F.col("cp_at").cast("bigint").alias("cp_at"),
        "cusum",
        "n_points",
    )


@_pending(
    "q_abtest_mann_whitney",
    oracle="""
    WITH u AS (
        SELECT CAST(value AS DOUBLE) AS v, 0 AS is_b
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        UNION ALL
        SELECT CAST(value AS DOUBLE), 1
        FROM events WHERE event_type = 'click' AND value IS NOT NULL
    ), byv AS (
        SELECT v, SUM(1 - is_b) AS na, SUM(is_b) AS nb FROM u GROUP BY v
    ), r AS (
        SELECT na, nb, na + nb AS t,
               CAST(COALESCE(SUM(na + nb) OVER (ORDER BY v ROWS BETWEEN
                    UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               + (CAST(na + nb AS DOUBLE) + 1.0) / 2.0 AS rk
        FROM byv
    ), one AS (
        SELECT CAST(SUM(na) AS DOUBLE) AS n_a, CAST(SUM(nb) AS DOUBLE) AS n_b,
               SUM(na * rk) AS ra,
               CAST(SUM(t * t * t - t) AS DOUBLE) AS ties
        FROM r
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ra - n_a * (n_a + 1.0) / 2.0 AS u_a,
           ROUND(((ra - n_a * (n_a + 1.0) / 2.0) - n_a * n_b / 2.0)
                 / sqrt((n_a * n_b / 12.0)
                        * (((n_a + n_b) + 1.0)
                           - ties / ((n_a + n_b) * ((n_a + n_b) - 1.0)))), 4) AS z
    FROM one
    """,
)
def q_abtest_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between purchase and click values: ranks computed
    over DISTINCT values (one groupBy + one window over the aggregate),
    U exact cross-engine (integer/half ranks), tie-corrected normal z
    rounded (operators/abtest.py::mann_whitney_u)."""
    from pontem_spark.operators.abtest import mann_whitney_u

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("value")
    b = ev.filter(F.col("event_type") == "click").select("value")
    return mann_whitney_u(a, b, "value")


def _reconcile_oracle() -> str:
    from pontem_spark.operators.reconcile import row_hash_sql

    h = row_hash_sql(["o_custkey", "o_orderstatus", "o_orderpriority"])
    return f"""
    WITH oldt AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey % 97 <> 0
    ), newt AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 89 = 0 THEN 'X-CHANGED'
                    ELSE o_orderpriority END AS o_orderpriority
        FROM orders WHERE o_orderkey % 101 <> 0
    ), o AS (SELECT o_orderkey, {h} AS h_old FROM oldt),
    n AS (SELECT o_orderkey, {h} AS h_new FROM newt),
    j AS (
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k, h_old, h_new
        FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
    )
    SELECT CASE WHEN h_old IS NULL THEN 'added'
                WHEN h_new IS NULL THEN 'removed'
                WHEN h_old <> h_new THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM j GROUP BY 1
    """


@_pending("q_reconcile_snapshots", _reconcile_oracle())
def q_reconcile_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff summary between two deterministic order-table
    versions (simulated deletes/inserts/updates by orderkey residues):
    two map-side (key, md5 row-hash) projections + ONE full-outer join
    on the key — the shuffle carries hashes, never row bodies. Hash
    inputs are exact types only (the float-formatting trap is the
    caller's contract) (operators/reconcile.py::snapshot_diff)."""
    from pontem_spark.operators.reconcile import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    old = orders.filter(F.col("o_orderkey") % 97 != 0)
    new = orders.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 89 == 0, F.lit("X-CHANGED")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    d = snapshot_diff(
        old, new, ["o_orderkey"], ["o_custkey", "o_orderstatus", "o_orderpriority"]
    )
    return d.groupBy("change_type").agg(F.count(F.lit(1)).alias("n_keys"))


def _acf_oracle(max_lag: int = 5) -> str:
    lag_cols = ",\n               ".join(
        f"LAG(v, {i}) OVER (PARTITION BY event_type ORDER BY pos) AS y{i}"
        for i in range(1, max_lag + 1)
    )
    moments = []
    for i in range(1, max_lag + 1):
        moments.append(
            f"COUNT(CASE WHEN y{i} IS NOT NULL THEN 1 END) AS n{i},\n"
            f"           SUM(CASE WHEN y{i} IS NOT NULL THEN x END) AS sx{i},\n"
            f"           SUM(y{i}) AS sy{i},\n"
            f"           SUM(CASE WHEN y{i} IS NOT NULL THEN x * x END) AS sxx{i},\n"
            f"           SUM(y{i} * y{i}) AS syy{i},\n"
            f"           SUM(CASE WHEN y{i} IS NOT NULL THEN x * y{i} END) AS sxy{i}"
        )
    selects = []
    for i in range(1, max_lag + 1):
        n = f"CAST(n{i} AS DOUBLE)"
        cov = f"(sxy{i} / {n} - (sx{i} / {n}) * (sy{i} / {n}))"
        vx = f"(sxx{i} / {n} - (sx{i} / {n}) * (sx{i} / {n}))"
        vy = f"(syy{i} / {n} - (sy{i} / {n}) * (sy{i} / {n}))"
        selects.append(
            f"SELECT k AS event_type, {i} AS lag,\n"
            f"       CASE WHEN n{i} >= 3 AND {vx} > 1e-12 AND {vy} > 1e-12\n"
            f"            THEN ROUND({cov} / sqrt({vx} * {vy}), 4) END AS acf\n"
            f"FROM g"
        )
    return f"""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS pos,
               SUM(value) AS v
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT event_type AS k, v AS x,
               {lag_cols}
        FROM daily
    ), g AS (
        SELECT k,
           {",".join(moments)}
        FROM lagged GROUP BY k
    )
    {" UNION ALL ".join(selects)}
    """


@_pending("q_ts_acf", _acf_oracle())
def q_ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type autocorrelation table (lags 1-5) over daily value
    totals: all lag columns share ONE window sort, all 30 Pearson
    moments fold in ONE aggregate, unpivoted by a constant-size explode
    (operators/timeseries.py::acf_table)."""
    from pontem_spark.operators.timeseries import acf_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "day_idx"
        ),
    ).agg(F.sum("value").alias("daily_value"))
    out = acf_table(daily, "event_type", "day_idx", "daily_value", max_lag=5)
    return out.select("event_type", F.col("lag").cast("int").alias("lag"), "acf")


@_pending(
    "q_quality_expectations",
    oracle="""
    WITH m AS (
        SELECT
            ROUND(COUNT(o_custkey) / CAST(COUNT(*) AS DOUBLE), 6) AS m0,
            ROUND(COUNT(DISTINCT o_orderkey) / CAST(COUNT(o_orderkey) AS DOUBLE), 6) AS m1,
            ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 6) AS m2,
            ROUND(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 1 ELSE 0 END)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS m3,
            ROUND(SUM(CASE WHEN regexp_matches(CAST(o_orderpriority AS VARCHAR),
                                               '^[1-5]-') THEN 1 ELSE 0 END)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS m4
        FROM orders
    )
    SELECT 'custkey_not_null' AS rule_name, m0 AS metric, 1.0 AS threshold,
           m0 >= 1.0 AS passed FROM m
    UNION ALL
    SELECT 'orderkey_unique', m1, 1.0, m1 >= 1.0 FROM m
    UNION ALL
    SELECT 'totalprice_nonnegative', m2, 0.0, m2 >= 0.0 FROM m
    UNION ALL
    SELECT 'status_in_domain', m3, 1.0, m3 >= 1.0 FROM m
    UNION ALL
    SELECT 'priority_pattern', m4, 1.0, m4 >= 1.0 FROM m
    """,
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract check over orders: five expectations
    (completeness, uniqueness, range, domain, pattern share) evaluated
    in ONE aggregation pass — adding a rule never adds a scan; pass/fail
    compares the rounded metric
    (operators/expectations.py::run_expectations)."""
    from pontem_spark.operators.expectations import Rule, run_expectations

    orders = load_table(spark, sf_dir, "orders")
    rules = [
        Rule("custkey_not_null", "not_null", "o_custkey", 1.0),
        Rule("orderkey_unique", "unique", "o_orderkey", 1.0),
        Rule("totalprice_nonnegative", "min_ge", "o_totalprice", 0.0),
        Rule("status_in_domain", "in_set", "o_orderstatus", 1.0, values=("F", "O", "P")),
        Rule("priority_pattern", "matches", "o_orderpriority", 1.0, pattern="^[1-5]-"),
    ]
    return run_expectations(orders, rules)


@_pending(
    "q_profile_abc",
    oracle="""
    WITH per AS (
        SELECT o_custkey AS k, SUM(CAST(o_totalprice AS DOUBLE)) AS x
        FROM orders GROUP BY 1
    ), ranked AS (
        SELECT k, x,
               ROUND(SUM(x) OVER (ORDER BY x DESC, k DESC ROWS BETWEEN
                     UNBOUNDED PRECEDING AND CURRENT ROW)
                     / SUM(x) OVER (), 6) AS cum_share,
               ROUND(x / SUM(x) OVER (), 6) AS share,
               ROUND(x, 6) AS value_sum
        FROM per
    )
    SELECT k AS o_custkey, value_sum, share, cum_share,
           CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS tier
    FROM ranked
    """,
)
def q_profile_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto tiering of customers by revenue: one |keys|
    aggregate, one descending rank window with cumulative + total sums
    in the same frame; tier boundaries compare the ROUNDED cumulative
    share (operators/profile.py::abc_classification)."""
    from pontem_spark.operators.profile import abc_classification

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return abc_classification(orders, "o_custkey", "o_totalprice")


def _pq_oracle(dim: int = 64, m: int = 4, k: int = 16, pct: int = 30,
               iters: int = 2, topk: int = 10) -> str:
    """DuckDB replay of the FULL PQ pipeline: per-subspace sampled Lloyd
    (L2, rounded-centroid discipline), corpus code assignment, per-query
    lookup tables, ADC estimate + top-k. Every iteration CTE is
    MATERIALIZED (DuckDB inlines multiply-referenced CTEs otherwise)."""
    from pontem_spark.operators.sampling import hash_bucket_sql

    sub = dim // m
    hb = hash_bucket_sql("vec_id", 100)

    def l2(a: str, b: str, d: int) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, {d}), "
            f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
            f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
        )

    ctes = [
        f"samp AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE {hb} < {pct})"
    ]
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        ctes.append(
            f"s{j} AS MATERIALIZED (SELECT vec_id, embedding[{lo}:{hi}] AS sv FROM samp)"
        )
        ctes.append(
            f"""b{j}_0 AS MATERIALIZED (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS centroid_id,
               list_transform(sv, x -> ROUND(CAST(x AS DOUBLE), 6)) AS centroid
        FROM s{j} ORDER BY vec_id LIMIT {k})"""
        )
        prev = f"b{j}_0"
        for n in range(1, iters + 1):
            d2 = l2("s.sv", "c.centroid", sub)
            ctes.append(
                f"""a{j}_{n} AS MATERIALIZED (
        SELECT vec_id, sv, centroid_id FROM (
            SELECT s.vec_id, s.sv, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id
                       ORDER BY ROUND({d2}, 6) ASC, c.centroid_id) AS r
            FROM s{j} s CROSS JOIN {prev} c
        ) WHERE r = 1)"""
            )
            ctes.append(
                f"""c{j}_{n}p AS MATERIALIZED (
        SELECT centroid_id, i, ROUND(avg(CAST(sv[i] AS DOUBLE)), 6) AS mm
        FROM a{j}_{n}, generate_series(1, {sub}) AS t(i) GROUP BY 1, 2)"""
            )
            ctes.append(
                f"""b{j}_{n} AS MATERIALIZED (
        SELECT p.centroid_id, COALESCE(n.centroid, p.centroid) AS centroid
        FROM {prev} p LEFT JOIN (
            SELECT centroid_id, list(mm ORDER BY i) AS centroid
            FROM c{j}_{n}p GROUP BY 1
        ) n ON n.centroid_id = p.centroid_id)"""
            )
            prev = f"b{j}_{n}"
        code_d2 = l2(f"e.embedding[{lo}:{hi}]", "c.centroid", sub)
        ctes.append(
            f"""code{j} AS MATERIALIZED (
        SELECT vec_id, centroid_id AS cid FROM (
            SELECT e.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY ROUND({code_d2}, 6) ASC, c.centroid_id) AS r
            FROM embeddings e CROSS JOIN {prev} c
        ) WHERE r = 1)"""
        )
        lut_d2 = l2(f"q.embedding[{lo}:{hi}]", "c.centroid", sub)
        ctes.append(
            f"""lut{j} AS MATERIALIZED (
        SELECT c.centroid_id AS cid, ROUND({lut_d2}, 6) AS d
        FROM {prev} c, (SELECT embedding FROM embeddings WHERE vec_id = 0) q)"""
        )
    joins = " ".join(
        f"JOIN code{j} c{j} ON c{j}.vec_id = c0.vec_id" for j in range(1, m)
    )
    lut_joins = " ".join(f"JOIN lut{j} l{j} ON l{j}.cid = c{j}.cid" for j in range(m))
    est = " + ".join(f"l{j}.d" for j in range(m))
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block}
    SELECT c0.vec_id, ROUND({est}, 6) AS est_d2
    FROM code0 c0 {joins} {lut_joins}
    ORDER BY est_d2 ASC, c0.vec_id ASC LIMIT {topk}
    """


@_pending("q_ann_pq_adc_topk", _pq_oracle())
def q_ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search: 4 subspace codebooks (k=16)
    trained by deterministic sampled Lloyd under L2, corpus coded by a
    zero-shuffle map-side argmin fold, query distances via per-subspace
    lookup tables summed per row, TakeOrderedAndProject top-10. The
    oracle replays training, coding, LUTs and the ADC ranking end to end
    (operators/pq.py)."""
    from pontem_spark.operators.pq import pq_topk, train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(
        emb, "vec_id", "embedding", dim=64, m=4, k=16, sample_pct=30, iters=2
    )
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    return pq_topk(
        emb, books, [float(x) for x in qrow["embedding"]],
        "vec_id", "embedding", dim=64, k=10,
    ).select("vec_id", "est_d2")


@_pending(
    "q_stream_seasonal_anomaly",
    oracle="""
    WITH base AS (
        SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
               CAST(COUNT(value) AS BIGINT) AS n,
               SUM(value) AS s, SUM(value * value) AS ss
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), b2 AS (
        SELECT event_type, hr, n, s / n AS m, ss / n - (s / n) * (s / n) AS varp
        FROM base
    )
    SELECT e.event_id, e.event_type, b.hr, e.value,
           ROUND((e.value - b.m) / sqrt(b.varp), 3) AS z
    FROM events e
    JOIN b2 b ON e.event_type = b.event_type
             AND CAST(EXTRACT(hour FROM e.ts) AS INTEGER) = b.hr
    WHERE e.value IS NOT NULL AND b.n >= 5 AND b.varp > 1e-12
      AND abs(ROUND((e.value - b.m) / sqrt(b.varp), 3)) >= 2.0
    """,
)
def q_stream_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming x seasonal-baseline composition: the (event_type, hour)
    moment state accumulates across >= 3 real micro-batches
    (foreachBatch + the mergeable monoid), finalizes to the batch
    operator's exact baseline, and broadcast-gates the events. The
    oracle is the PLAIN BATCH query — hash-equality proves the
    composition is lossless however rows were sliced into batches
    (streaming/events.py::run_seasonal_anomaly)."""
    import tempfile

    from pontem_spark.streaming.events import run_seasonal_anomaly

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    ).withColumn("hr", F.hour("ts"))
    tmp = tempfile.mkdtemp(prefix="pontem_stream_season_")
    try:
        ev.select("event_type", "hr", "value").repartition(3).write.mode(
            "overwrite"
        ).parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(tmp)
        )
        out, n_batches = run_seasonal_anomaly(
            stream, ["event_type", "hr"], "value", ev, ["event_id"], threshold=2.0
        )
        if n_batches < 3:
            raise RuntimeError(f"expected >= 3 micro-batches, got {n_batches}")
        # state is localCheckpoint-materialized; safe to return after cleanup
        return out.localCheckpoint(eager=True)
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


@_pending(
    "q_stream_ks_drift",
    oracle="""
    WITH ref AS (
        SELECT CAST(LEAST(FLOOR(CAST(value AS DOUBLE) / 20.0), 19) AS INTEGER) AS bucket,
               COUNT(*) AS nr
        FROM events WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-16'
        GROUP BY 1
    ), live AS (
        SELECT CAST(LEAST(FLOOR(CAST(value AS DOUBLE) / 20.0), 19) AS INTEGER) AS bucket,
               COUNT(*) AS nl
        FROM events WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-16'
        GROUP BY 1
    ), both_b AS (
        SELECT COALESCE(r.bucket, l.bucket) AS bucket,
               COALESCE(nr, 0) AS nr, COALESCE(nl, 0) AS nl
        FROM ref r FULL OUTER JOIN live l ON r.bucket = l.bucket
    ), cums AS (
        SELECT bucket,
            SUM(nr) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cr,
            SUM(nl) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cl,
            SUM(nr) OVER () AS tr, SUM(nl) OVER () AS tl
        FROM both_b
    )
    SELECT ROUND(abs(CAST(cr AS DOUBLE) / CAST(tr AS DOUBLE)
                     - CAST(cl AS DOUBLE) / CAST(tl AS DOUBLE)), 6) AS ks_stat,
           CAST(bucket AS INTEGER) AS ks_bucket,
           CAST(tr AS BIGINT) AS n_ref, CAST(tl AS BIGINT) AS n_live
    FROM cums ORDER BY 1 DESC, 2 ASC LIMIT 1
    """,
)
def q_stream_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous drift monitor: pre-cut events are the static reference
    histogram, post-cut events stream in >= 3 micro-batches into a
    per-bin count monoid, and the binned KS folds over <= 20 rows of
    integer cumulatives (bit-identical cross-engine). The oracle is the
    plain two-slice batch KS — hash-equality proves the streamed
    histogram equals the batch one under any slicing
    (streaming/events.py::run_binned_drift)."""
    import shutil
    import tempfile

    from pontem_spark.streaming.events import run_binned_drift

    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    cut = F.lit("2024-01-16").cast("timestamp")
    ref = ev.filter(F.col("ts") < cut).select("value")
    live = ev.filter(F.col("ts") >= cut).select("value")
    tmp = tempfile.mkdtemp(prefix="pontem_stream_ks_")
    try:
        live.repartition(3).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(tmp)
        )
        out, n_batches = run_binned_drift(
            stream, ref, "value", bin_width=20.0, n_bins=20
        )
        if n_batches < 3:
            raise RuntimeError(f"expected >= 3 micro-batches, got {n_batches}")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_pending(
    "q_events_interarrival",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               CAST(date_diff('second',
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) AS DOUBLE) AS gap
        FROM events
    ), g2 AS (SELECT event_type, gap FROM gaps WHERE gap IS NOT NULL)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap, 0.5), 3) AS p50,
           ROUND(quantile_cont(gap, 0.95), 3) AS p95,
           ROUND(quantile_cont(gap, 0.99), 3) AS p99
    FROM g2 GROUP BY 1
    """,
)
def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival latency report: per-user consecutive-event gaps
    (one lag window on the user key; Spark unix_timestamp diff ==
    DuckDB date_diff('second') — both count whole-second boundaries),
    then exact p50/p95/p99 per event type in one percentile aggregate
    (operators/timeseries.py::interarrival_percentiles)."""
    from pontem_spark.operators.timeseries import interarrival_percentiles

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return interarrival_percentiles(
        ev, "user_id", "event_type", "ts", order_cols=["ts", "event_id"]
    )


@_pending(
    "q_ts_rolling_corr",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS pos,
               CAST(COUNT(*) AS DOUBLE) AS x, SUM(value) AS y
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT event_type, pos,
               CAST(COUNT(*) OVER w AS DOUBLE) AS n,
               SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
               SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
               SUM(x * y) OVER w AS sxy
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY pos
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, pos AS day_idx,
           CASE WHEN n >= 3
                 AND (sxx / n - (sx / n) * (sx / n)) > 1e-12
                 AND (syy / n - (sy / n) * (sy / n)) > 1e-12
                THEN ROUND((sxy / n - (sx / n) * (sy / n))
                           / sqrt((sxx / n - (sx / n) * (sx / n))
                                  * (syy / n - (sy / n) * (sy / n))), 4)
           END AS rolling_corr
    FROM r
    """,
)
def q_ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between daily event volume and
    daily value total per event type — all six moment sums ride ONE
    trailing window frame (one exchange + one sort total)
    (operators/timeseries.py::rolling_correlation)."""
    from pontem_spark.operators.timeseries import rolling_correlation

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    ).agg(
        F.count(F.lit(1)).cast("double").alias("x"),
        F.sum("value").alias("y"),
    )
    out = rolling_correlation(daily, "event_type", "day_idx", "x", "y", window_rows=7)
    return out.select("event_type", "day_idx", "rolling_corr")


@_pending(
    "q_pipeline_entity_resolution",
    oracle="""
    WITH RECURSIVE vocab AS (
        SELECT DISTINCT p_name AS name, string_split(p_name, ' ')[1] AS blk
        FROM part
    ), pairs AS (
        SELECT a.name AS na, b.name AS nb
        FROM vocab a JOIN vocab b ON a.blk = b.blk AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 3
    ), edges AS (
        SELECT na AS src, nb AS dst FROM pairs
        UNION
        SELECT nb, na FROM pairs
    ), reach(node, label) AS (
        SELECT name, name FROM vocab
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ), cc AS (
        SELECT node, MIN(label) AS component FROM reach GROUP BY node
    ), cl AS (
        SELECT component, CAST(COUNT(*) AS BIGINT) AS n_names
        FROM cc GROUP BY 1 HAVING COUNT(*) >= 2
    )
    SELECT cc.component AS canonical_name, cl.n_names,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(AVG(CAST(p.p_retailprice AS DOUBLE)), 4) AS avg_price
    FROM part p
    JOIN cc ON cc.node = p.p_name
    JOIN cl ON cl.component = cc.component
    GROUP BY 1, 2
    """,
)
def q_pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END TO END: blocked edit-distance candidate
    pairs over the DISTINCT name vocabulary (fuzzy_pairs), connected
    components to merge transitive matches (the distributed fixpoint;
    the oracle uses a recursive CTE — two different algorithms must
    agree), then survivorship: per multi-name cluster, the canonical
    (min) name with member and row counts and the cluster's average
    price. Pair work is per-block quadratic over the vocabulary, never
    row-quadratic; CC state is |vocab| rows with per-iteration lineage
    truncation (operators/dedup.py::fuzzy_pairs +
    operators/graph.py::connected_components)."""
    from pontem_spark.operators.dedup import fuzzy_pairs
    from pontem_spark.operators.graph import connected_components

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice"
    )
    pairs = fuzzy_pairs(part, "p_name", max_dist=3)
    nodes = part.select(F.col("p_name").alias("name")).distinct()
    edges = pairs.select(F.col("name_a").alias("src"), F.col("name_b").alias("dst"))
    cc = connected_components(nodes, edges, node_col="name")
    clusters = (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_names"))
        .filter(F.col("n_names") >= 2)
    )
    from pontem_spark.functions.compat import rnd

    members = part.join(cc, part.p_name == cc.name).join(
        F.broadcast(clusters), "component"
    )
    return members.groupBy(
        F.col("component").alias("canonical_name"), F.col("n_names")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        rnd(F.avg(F.col("p_retailprice").cast("double")), 4).alias("avg_price"),
    )


@_pending(
    "q_feature_target_encoding",
    oracle="""
    WITH cats AS (
        SELECT o_orderpriority AS c, CAST(COUNT(o_totalprice) AS BIGINT) AS n,
               SUM(CAST(o_totalprice AS DOUBLE)) AS s
        FROM orders GROUP BY 1
    ), g AS (
        SELECT c, n, s, SUM(s) OVER () / SUM(n) OVER () AS gm FROM cats
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           ROUND(CASE WHEN n - 1 + 10.0 > 0
                      THEN (s - CAST(o.o_totalprice AS DOUBLE) + 10.0 * gm)
                           / (n - 1 + 10.0)
                      ELSE gm END, 6) AS encoded
    FROM orders o JOIN g ON g.c = o.o_orderpriority
    """,
)
def q_feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe leave-one-out target encoding of order priority
    against order value (smoothing=10 pseudo-observations): one
    |categories|-row aggregate whose global mean derives from ITSELF
    (no second fact scan), broadcast back — facts never shuffle
    (operators/curation.py::target_encode_loo)."""
    from pontem_spark.operators.curation import target_encode_loo

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return target_encode_loo(
        orders, "o_orderpriority", "o_totalprice", ["o_orderkey"], smoothing=10.0
    )


@_pending(
    "q_events_session_metrics",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts FROM events
    ), flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, event_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s,
           COUNT(*) = 1 AS is_bounce
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def q_events_session_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level engagement metrics on top of gap-based
    sessionization: events-per-session, wall duration, bounce flag —
    the two window passes share ONE (user, order) shuffle and the
    rollup is a single aggregate; whole-second duration semantics are
    engine-identical (unix diff == date_diff('second'))."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("is_new", is_new)
        .withColumn("session_seq", F.sum("is_new").over(wsum).cast("bigint"))
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).cast("bigint").alias("duration_s"),
        (F.count(F.lit(1)) == 1).alias("is_bounce"),
    )
