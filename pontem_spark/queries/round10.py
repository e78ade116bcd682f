"""Round-11 registration flip for the staged pending candidate(s).

FLIPPED in round 11: ``round10`` is in the import list inside
``registry.all_queries()``. That registers q_ts_series_resample (the r9
Series.resample API's first driver row — pandas complete grid +
start_day anchoring pinned cross-engine via a day-dividing '6h' and a
non-dividing '7h' freq), q_dedup_simhash_collapsed_pairs (the r10
exact-duplicate-pressure scale path's first driver row), and
q_ts_asfreq (the r10 Series.asfreq surface — first-observation anchor +
ASOF-join ffill oracle).

ROUND-11 WINDOW PLAN (written r10, measured against the actual
evidence-age sort after CORRECTNESS_r09 — not guessed): with the r10
window consumed by the 6 r5-stale + 44 r6-stale re-checks (verified
self-assembly: q_api_reset_index_enumerate, q_stream_static_enrich,
q_dedup_jaccard_pairs, q_corpus_assembly, q_text_chunking,
q_text_train_test_split, then q1_pricing_summary — r6 evidence, the
round9.py docstring mislabeled it r5 — through
q_api_topk_per_group_agg), the r11 window self-assembles as:

  1. q_ts_series_resample + q_dedup_simhash_collapsed_pairs +
     q_ts_asfreq (never-green, sort first) — 3 slots,
  2. the 6 r6-evidence spills from r10: q_multimodal_decode_pipeline,
     q_asof_forward_next_click, q_dedup_jaccard_prefix,
     q_dedup_containment, q_stream_stream_join, q_stream_sliding_rollup,
  3. ~41 of the 50 r7-evidence queries in registration order
     (q3_shipping_priority, q5_local_supplier_volume,
     q6_forecast_revenue, q10_returned_items, q_stream_dedup_daily_users,
     q_dedup_minhash_jaccard, the SimHash family, q_sequence_packing,
     q_sketch_hll_users, ...).

~9 r7 queries spill to r12; after r12 no query evidence is older
than r8. Register nothing else in r11 unless it is worth evicting an
r7-stale re-check.

Every candidate here is oracle-proven at sf0.001 AND sf0.01 by
tests/test_pending_queries.py.
"""

from __future__ import annotations

from pontem_spark.queries.registry import register
from pontem_spark.queries.round10_pending import PENDING as _PENDING


def _flip() -> None:
    for name, fn, oracle in _PENDING:
        tags = ("streaming",) if name.startswith("q_stream_") else ()
        register(name, oracle=oracle, tags=tags)(fn)


_flip()
