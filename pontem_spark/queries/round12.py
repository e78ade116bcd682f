"""Round-13 registration flip for the staged pending candidate.

NOT imported by ``registry.all_queries()`` yet — round 12 registers only
the r11-staged pair (queries/round11.py, flipped this round); the rest of
the r12 window is spent on the 9 r7-evidence spills + 39 r8-evidence
re-checks, all self-assembled by the evidence-age sort.

ROUND-13 FLIP (one line): add ``round12`` to the import list inside
``registry.all_queries()``. That registers q_api_ctor_order_positional
(first driver row for the construction-order spec: the r11 non-monotonic
``__ctor__`` fix AND the r12 monotonic-with-duplicates ADVICE fix, both
previously local-differential evidence only).

ROUND-13 WINDOW PLAN (written r12, measured against the ACTUAL
evidence-age sort simulated after this round's flip — post-r12 evidence
histogram: r12:50, r11:50, r10:50, r9:50, r8:10): the r13 window
self-assembles as

  1. q_api_ctor_order_positional (never-green, sorts first) — 1 slot,
  2. the 10 r8-evidence leftovers: q_ts_cusum_changepoint,
     q_abtest_mann_whitney, q_reconcile_snapshots, q_ts_acf,
     q_quality_expectations, q_profile_abc, q_ann_pq_adc_topk,
     q_stream_seasonal_anomaly, q_stream_ks_drift, q_events_interarrival,
  3. the first 39 r9-evidence queries in registration order
     (q4_priority_with_discounted_items, q12_priority_split_by_status,
     q14_promo_revenue_share, q16_supplier_count_by_part, ...).

~11 r9 queries spill to r14 (q_api_explode_tokens, q_api_grouped_transform,
q_curation_pii_redaction, q_dedup_apply_removal, q_graph_triangles, ...);
after r14 no query evidence is older than r10. Register nothing else in
r13 unless it is worth evicting an r9-stale re-check.

The candidate is oracle-proven at sf0.001 AND sf0.01 by
tests/test_pending_queries.py and pre-armed in BENCH_BASELINE.json.
"""

from __future__ import annotations

from pontem_spark.queries.registry import register
from pontem_spark.queries.round12_pending import PENDING as _PENDING


def _flip() -> None:
    for name, fn, oracle in _PENDING:
        register(name, oracle=oracle)(fn)


_flip()
