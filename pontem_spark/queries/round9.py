"""Round-9 registration flip for the staged pending candidates.

NOT imported by ``registry.all_queries()`` yet — the r8 window is fully
spent on the 54 round8-flipped queries (the 4 registration-order-last of
which spill to r9; see queries/round8.py's window plan).

ROUND-9 FLIP (one line): add ``round9`` to the import list inside
``registry.all_queries()``. That registers q_cdc_upsert_readback and
q_maintenance_compaction_readback (the write side's first
oracle-checked driver queries) — they sort never-green together with
the 4 r8 spills, and the remaining ~44 slots rotate back to the 49
r5-evidence queries automatically (evidence-age sort). Register
nothing else new in r9 unless it is worth evicting an r5-stale
re-check.

Every candidate here is oracle-proven at sf0.001 AND sf0.01 by
tests/test_pending_queries.py.

ROUND-10 WINDOW PLAN (written r9, per the r8 verdict's rotation
discipline): register NOTHING new in r10 unless it is worth evicting a
stale re-check. With the r9 window consumed by the 6 never-green
queries + 44 r5-stale re-checks, the evidence-age sort will
self-assemble the r10 window as: the 6 r5-stale spills
(q_api_reset_index_enumerate — displaced when the r9 triangles rewrite
earned a CHANGED_IN_ROUND re-check slot — plus q_stream_static_enrich,
q_dedup_jaccard_pairs, q_corpus_assembly, q_text_chunking,
q_text_train_test_split; q1_pricing_summary was listed here as r5-stale
but actually carries r6 evidence — r10 docstring fix) followed
by ~44 of the 50 r6-evidence queries (q1_pricing_summary and
q_set_intersect_all through
q_multimodal_decode_pipeline in registration order). The ~6 r6
queries that spill (q_asof_forward_next_click, q_dedup_jaccard_prefix,
q_dedup_containment, q_stream_stream_join, q_stream_sliding_rollup,
plus one boundary query) join the r7 block as the r11 budget — after
r11, no query evidence older than r8.
"""

from __future__ import annotations

from pontem_spark.queries.registry import register
from pontem_spark.queries.round9_pending import PENDING as _PENDING


def _flip() -> None:
    for name, fn, oracle in _PENDING:
        tags = ("streaming",) if name.startswith("q_stream_") else ()
        register(name, oracle=oracle, tags=tags)(fn)


_flip()
