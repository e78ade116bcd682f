"""Round-12 registration flip for the staged pending candidates.

NOT imported by ``registry.all_queries()`` yet — round 11 registers only
the r10-staged trio (queries/round10.py, flipped this round); the rest of
the r11 window is spent on the 6 r6-evidence spills + 41 r7-evidence
re-checks, all self-assembled by the evidence-age sort.

ROUND-12 FLIP (one line): add ``round11`` to the import list inside
``registry.all_queries()``. That registers q_api_rank_na_option (the r10
rank na_option tail's first driver row) and q_api_nextreme_keep (the
nlargest/nsmallest keep= tail's first driver row).

ROUND-12 WINDOW PLAN (written r11, measured against the ACTUAL
evidence-age sort after the r10 correctness run + this round's flip —
not guessed): with the r11 window consumed by the 3 never-green
(q_ts_series_resample, q_ts_asfreq, q_dedup_simhash_collapsed_pairs),
the 6 r6 spills (q_multimodal_decode_pipeline, q_asof_forward_next_click,
q_dedup_jaccard_prefix, q_dedup_containment, q_stream_stream_join,
q_stream_sliding_rollup) and the first 41 r7-evidence queries
(q3_shipping_priority through q_ann_lsh_topk in registration order),
the r12 window self-assembles as:

  1. q_api_rank_na_option + q_api_nextreme_keep (never-green, sort
     first) — 2 slots,
  2. the 9 r7-evidence spills from r11: q_embedding_label_stats,
     q_ann_ivf_topk, q_stream_hourly_rollup, q_stream_session_windows,
     q_text_token_stats, q_text_quality_score, q_text_lang_id,
     q_text_fingerprint, q_text_source_profile,
  3. ~39 of the r8-evidence queries in registration order
     (q_api_interpolate_ffill, q_api_ewm_mean, q_api_cut,
     q_api_get_dummies, q_join_bloom_prefilter, q_sketch_cms_counts,
     q_text_bigram_pmi, q_profile_trend_fit, q_graph_pagerank_dangling,
     q_chunk_rag_windows, ...).

~10 r8 queries spill to r13; after r13 no query evidence is older than
r9. Register nothing else in r12 unless it is worth evicting an r8-stale
re-check.

Both candidates are oracle-proven at sf0.001 AND sf0.01 by
tests/test_pending_queries.py.
"""

from __future__ import annotations

from pontem_spark.queries.registry import register
from pontem_spark.queries.round11_pending import PENDING as _PENDING


def _flip() -> None:
    for name, fn, oracle in _PENDING:
        register(name, oracle=oracle)(fn)


_flip()
