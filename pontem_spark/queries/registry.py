"""Query registry: every engine capability exposed as a named, oracle-checked query.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI-SQL string DuckDB can run over the same parquet tables.
The driver (and ``tests/test_oracle.py``) executes both and compares
row-count + schema + order-insensitive value hash — so column NAMES and TYPES
must match exactly on both sides.

Float discipline: aggregate doubles are ``ROUND()``ed to a fixed number of
decimals on BOTH sides, so the two engines' different summation orders cannot
produce hash mismatches in the last ulp.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over views named like the tables; None = rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        from pontem_spark.functions.compat import portable_round_sql

        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        # ROUND() is not double-portable across engines; rewrite to the
        # deterministic floor form (see functions/compat.py).
        sql = portable_round_sql(oracle) if oracle is not None else None
        _REGISTRY[name] = Query(name, fn, sql, description or (fn.__doc__ or ""), tags)
        return fn

    return deco


# The driver records only the FIRST 50 queries it sees each round, so
# ``all_queries`` orders queries by how much a fresh driver row is worth.
#
# Evidence ledger, round 4:
# - CORRECTNESS_r03 re-verified the round-2 window (49 green, 1 red) —
#   those greens are FRESH: current code, current testdata.
# - r01 greens predate BOTH the round-2 ANN/dedup rewrites AND the round-3
#   testdata regeneration (events.ts nanos-long → TIMESTAMP_NTZ micros,
#   which broke the old loaders) — their evidence is stale, events/ts
#   consumers most of all.

# Verify FIRST, in this order (highest evidence value at the front):
# the r03-red streaming dedup (loader bug, fixed round 4), every events/ts
# consumer (the regeneration changed their input encoding), then the
# ANN/dedup family rewritten in round 2 after earning its r01 rows.
REVERIFY_PRIORITY = (
    "q_stream_dedup_daily_users",
    "q_asof_purchase_click",
    "q_range_join_price_band",
    "q_stream_hourly_rollup",
    "q_stream_session_windows",
    "q_events_hourly",
    "q_events_sessionize",
    "q_events_user_funnel",
    "q_events_json_extract",
    "q_window_time_range_avg",
    "q_pivot_event_types",
    "q_ann_ivf_topk",
    "q_ann_brute_force_topk",
    "q_ann_lsh_topk",
    "q_dedup_embedding_cosine",
    "q_dedup_clusters",
    "q_dedup_jaccard_pairs",
    "q_dedup_minhash_candidates",
    "q_minhash_quality",
)

# Green rows in CORRECTNESS_r03 under current code + current testdata —
# the freshest evidence; these queue LAST.
R03_GREEN = frozenset({
    "q2_min_cost_supplier", "q4_priority_with_discounted_items",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q11_important_parts", "q12_priority_split_by_status",
    "q13_customer_order_distribution", "q14_promo_revenue_share",
    "q15_top_supplier", "q16_supplier_count_by_part",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q19_or_of_ands_predicate", "q20_part_promotion_suppliers",
    "q21_waiting_supplier", "q22_rich_quiet_customers",
    "q_anti_join_quiet_customers", "q_api_dedup_minhash", "q_bigram_counts",
    "q_brand_volume", "q_contamination_overlap", "q_cube_status_priority",
    "q_dedup_cosine_bucketed", "q_distinct_segments", "q_embedding_quantize",
    "q_latest_order_per_customer", "q_multimodal_decode_pipeline",
    "q_profile_null_stats", "q_quality_repetition", "q_rollup_flag_status",
    "q_salted_skew_join", "q_segment_order_stats", "q_semi_join_big_spenders",
    "q_set_except_all", "q_set_except_nations", "q_set_intersect_all",
    "q_set_intersect_nations", "q_set_union_nations", "q_stratified_sample",
    "q_stream_stateful_user_stats", "q_tfidf_top_terms", "q_two_phase_agg",
    "q_window_ntile_price_band", "q_window_order_gap_days",
    "q_window_order_rank", "q_window_running_spend",
    "q_window_share_of_customer", "q_zscore_outliers",
})

# Permanently no-oracle by design (approx sketches / xxhash64 SimHash); their
# rows-only driver rows are their best evidence — never compete for slots.
NO_ORACLE = frozenset({"q_dedup_simhash_nearpairs", "q_approx_aggregates"})


def all_queries() -> dict[str, Query]:
    """Import all query modules and return the full registry, ordered so the
    driver's 50-row correctness window lands on the queries whose driver
    evidence is most stale: ``REVERIFY_PRIORITY`` first, then anything not
    green under current code+data (registration order — new round-4 queries
    land here), then stale-but-low-risk r01 greens, then fresh ``R03_GREEN``,
    with the no-oracle pair pinned last."""
    # Imports are deferred so `import pontem_spark` stays cheap.
    from pontem_spark.queries import (  # noqa: F401
        tpch2,
        tpch3,
        windows,
        tpch,
        round2,
        round4,
        multimodal,
        asof,
        dedup,
        events,
        rangeops,
        scalar,
        series_api,
        similarity,
        streaming_q,
        text,
    )

    order = {n: i for i, n in enumerate(_REGISTRY)}
    prio = {n: i for i, n in enumerate(REVERIFY_PRIORITY)}

    def key(n: str) -> tuple[int, int]:
        if n in NO_ORACLE:
            return (4, order[n])
        if n in prio:
            return (0, prio[n])
        if n in R03_GREEN:
            return (3, order[n])
        # not green under current code+data: new queries + stale r01 greens;
        # new (never-verified) work sorts ahead of old greens
        from_r01 = n in _R01_GREEN_STALE
        return (2 if from_r01 else 1, order[n])

    names = sorted(_REGISTRY, key=key)
    return {n: _REGISTRY[n] for n in names}


# r01 greens not re-verified since (evidence predates the round-3 testdata
# regeneration; low risk — none consume events.ts — but stale).
_R01_GREEN_STALE = frozenset({
    "q10_returned_items", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue", "q_api_column_expression",
    "q_api_groupby_agg", "q_api_merge_filter", "q_api_str_accessor",
    "q_conditional_agg", "q_corpus_assembly", "q_date_functions",
    "q_dedup_exact", "q_embedding_label_stats", "q_grouping_sets",
    "q_math_functions", "q_multimodal_binary_meta", "q_percentiles",
    "q_stats_corr", "q_string_functions", "q_text_bpe_tokens",
    "q_text_chunking", "q_text_fingerprint", "q_text_lang_id",
    "q_text_quality_score", "q_text_source_profile", "q_text_token_stats",
    "q_text_train_test_split", "q_udaf_weighted_avg",
})


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
