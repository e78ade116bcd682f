"""Behavioral tests for the round-7 continuation operators — edge cases
and invariants the oracle-parity fixtures don't exercise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_kaplan_meier_monotone_and_bounded(spark):
    from pontem_spark.operators.survival import kaplan_meier

    rows = [(5, 1), (5, 1), (10, 0), (15, 1), (20, 0), (20, 1), (25, 1)]
    df = spark.createDataFrame(rows, "t_days int, ev int")
    out = kaplan_meier(df, "t_days", "ev").orderBy("t_days").collect()
    surv = [r["survival"] for r in out]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert surv == sorted(surv, reverse=True), "survival must be non-increasing"
    # death rows only
    assert all(r["events"] > 0 for r in out)


def test_kaplan_meier_hits_zero_when_last_at_risk_dies(spark):
    from pontem_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame([(1, 1), (2, 1)], "t int, ev int")
    out = {r["t"]: r["survival"] for r in kaplan_meier(df, "t", "ev").collect()}
    assert out[2] == 0.0  # d = n at the last time → S pinned to 0, no ln(0)


def test_kaplan_meier_all_censored_yields_no_rows(spark):
    from pontem_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame([(5, 0), (7, 0)], "t int, ev int")
    assert kaplan_meier(df, "t", "ev").count() == 0


def test_association_rules_lift_symmetry_and_confidence_bound(spark):
    from pontem_spark.operators.basket import association_rules

    rows = [(b, i) for b in range(40) for i in ("x", "y") if (b + hash(i)) % 3]
    rows += [(b, "z") for b in range(0, 40, 2)]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(df, "basket", "item", min_support=1.0 / 64.0).collect()
    assert out, "fixture must produce rules"
    lifts = {(r["antecedent"], r["consequent"]): r["lift"] for r in out}
    for (a, c), lv in lifts.items():
        assert lifts[(c, a)] == lv, "lift is symmetric"
        assert 0.0 < lv
    assert all(0.0 < r["confidence"] <= 1.0 for r in out)


def test_snapshot_diff_identity_is_all_unchanged(spark, sf_dir):
    from pontem_spark.operators.reconcile import snapshot_diff
    from pontem_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    d = snapshot_diff(orders, orders, ["o_orderkey"], ["o_orderstatus", "o_orderpriority"])
    kinds = {r["change_type"] for r in d.select("change_type").distinct().collect()}
    assert kinds == {"unchanged"}


def test_snapshot_diff_null_vs_empty_string_differ(spark):
    from pontem_spark.operators.reconcile import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "")], "k int, v string")
    out = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert out[0]["change_type"] == "changed"


def test_mann_whitney_u_sum_identity(spark):
    from pontem_spark.operators.abtest import mann_whitney_u

    a = spark.createDataFrame([(float(x),) for x in (1, 3, 3, 7, 9)], "v double")
    b = spark.createDataFrame([(float(x),) for x in (2, 3, 8, 8)], "v double")
    ua = mann_whitney_u(a, b, "v").head()
    ub = mann_whitney_u(b, a, "v").head()
    # U_a + U_b == n_a * n_b regardless of ties
    assert ua["u_a"] + ub["u_a"] == ua["n_a"] * ua["n_b"]
    # swapping samples negates z
    assert abs(ua["z"] + ub["z"]) < 1e-9


def test_expectations_failing_rule_reports_false(spark, sf_dir):
    from pontem_spark.operators.expectations import Rule, run_expectations
    from pontem_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = run_expectations(
        orders,
        [
            Rule("impossible_domain", "in_set", "o_orderstatus", 1.0, values=("Z",)),
            Rule("price_cap", "max_le", "o_totalprice", 1.0),
        ],
    ).collect()
    assert all(r["passed"] is False for r in out)


def test_expectations_unknown_kind_raises(spark, sf_dir):
    from pontem_spark.operators.expectations import Rule, run_expectations
    from pontem_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="unknown expectation kind"):
        run_expectations(orders, [Rule("bad", "nope", "o_custkey", 1.0)])


def test_abc_tiers_partition_and_order(spark, sf_dir):
    from pontem_spark.operators.profile import abc_classification
    from pontem_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    out = abc_classification(orders, "o_custkey", "o_totalprice").collect()
    assert {r["tier"] for r in out} <= {"A", "B", "C"}
    # every A key's cumulative share below every C key's
    a_max = max((r["cum_share"] for r in out if r["tier"] == "A"), default=0.0)
    c_min = min((r["cum_share"] for r in out if r["tier"] == "C"), default=1.0)
    assert a_max <= 0.8 < c_min


def test_scd2_compresses_identical_versions(spark):
    from pontem_spark.operators.sequences import scd2_intervals

    rows = [
        (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "b"), (1, 5, "a"),
        (2, 1, None), (2, 2, None), (2, 3, "x"),
    ]
    df = spark.createDataFrame(rows, "k int, seq int, attr string")
    out = scd2_intervals(df, "k", ["seq"], ["attr"]).orderBy("k", "effective_from").collect()
    k1 = [(r["attr"], r["effective_from"], r["effective_to"], r["is_current"])
          for r in out if r["k"] == 1]
    assert k1 == [("a", 1, 3, False), ("b", 3, 5, False), ("a", 5, None, True)]
    k2 = [(r["attr"], r["effective_from"]) for r in out if r["k"] == 2]
    assert k2 == [(None, 1), ("x", 3)], "NULL → NULL is unchanged (null-safe compare)"


def test_transition_matrix_rows_sum_to_one(spark, sf_dir):
    from pontem_spark.operators.sequences import transition_matrix
    from pontem_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = transition_matrix(ev, "user_id", ["ts", "event_id"], "event_type")
    sums = (
        out.groupBy("prev_state").agg(F.sum("p").alias("s")).collect()
    )
    assert all(abs(r["s"] - 1.0) < 1e-4 for r in sums)


def test_pq_codes_within_codebook_range(spark, sf_dir):
    from pontem_spark.operators.pq import pq_assign_codes, train_pq_codebooks
    from pontem_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(
        emb, "vec_id", "embedding", dim=64, m=4, k=8, sample_pct=30, iters=1
    )
    row = pq_assign_codes(emb, books, "vec_id", "embedding", 64).agg(
        F.max(F.array_max("codes")).alias("mx"),
        F.min(F.array_min("codes")).alias("mn"),
        F.min(F.size("codes")).alias("m"),
    ).head()
    assert row["m"] == 4 and 0 <= row["mn"] and row["mx"] <= 7


def test_pq_dim_not_divisible_raises(spark, sf_dir):
    from pontem_spark.operators.pq import train_pq_codebooks
    from pontem_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(emb, "vec_id", "embedding", dim=64, m=5)


def test_ks_identical_samples_zero(spark, sf_dir):
    from pontem_spark.operators.profile import ks_two_sample
    from pontem_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("value")
    out = ks_two_sample(ev, ev, "value", bins=32).head()
    assert out["ks_stat"] == 0.0


def test_attribution_credits_conserve_value(spark, sf_dir):
    """Each model's total credit equals the total value of ATTRIBUTED
    conversions (those with >= 1 touch in window)."""
    from pontem_spark.operators.sequences import attribution_credits
    from pontem_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("click", "view"))
    convs = ev.filter(F.col("event_type") == "purchase")
    out = attribution_credits(
        touches, convs, "user_id", "ts", "event_id", "event_type", "value"
    ).agg(
        F.sum("credit_first").alias("f"),
        F.sum("credit_last").alias("l"),
        F.sum("credit_linear").alias("n"),
    ).head()
    assert abs(out["f"] - out["l"]) < 1e-3
    assert abs(out["f"] - out["n"]) < 1e-3


def test_target_encoding_excludes_own_label(spark):
    from pontem_spark.operators.curation import target_encode_loo

    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 100.0)]
    df = spark.createDataFrame(rows, "id int, cat string, y double")
    out = {
        r["id"]: r["encoded"]
        for r in target_encode_loo(df, "cat", "y", ["id"], smoothing=0.0).collect()
    }
    # row 1's encoding = mean of the OTHER 'a' rows: (20+30)/2
    assert out[1] == 25.0 and out[2] == 20.0 and out[3] == 15.0
    # singleton category without smoothing falls back to the global mean
    assert out[4] == 40.0


def test_rolling_correlation_perfect_tracking(spark):
    from pontem_spark.operators.timeseries import rolling_correlation

    rows = [("k", i, float(i), 2.0 * i + 3.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, pos int, x double, y double")
    out = rolling_correlation(df, "k", "pos", "x", "y", window_rows=5).collect()
    full = [r["rolling_corr"] for r in out if r["pos"] >= 2]
    assert all(c == 1.0 for c in full), full


def test_interarrival_simple_gaps(spark):
    import datetime as dt

    from pontem_spark.operators.timeseries import interarrival_percentiles

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "x", t0, 1),
        (1, "x", t0 + dt.timedelta(seconds=10), 2),
        (1, "x", t0 + dt.timedelta(seconds=30), 3),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp, event_id int")
    out = interarrival_percentiles(
        df, "user_id", "event_type", "ts", order_cols=["ts", "event_id"],
        percentiles=[0.5],
    ).head()
    assert out["n_gaps"] == 2 and out["p50"] == 15.0
