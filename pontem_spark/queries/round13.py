"""Round-14 registration flip for the staged pending candidate.

NOT imported by ``registry.all_queries()`` yet — round 13 registers only
the r12-staged candidate (queries/round12.py, flipped this round); the
rest of the r13 window is spent on the 10 r8-evidence spills + 39
r9-evidence re-checks, all self-assembled by the evidence-age sort.

ROUND-14 FLIP (one line): add ``round13`` to the import list inside
``registry.all_queries()``. That registers q_api_rowalign_dup_labels
(first driver row for the r12 duplicate-label aligner campaign AND the
r13 same-anchor positional-op rebuild — both previously local
differential evidence only) and q_api_frame_align_arith (first driver
row for the r13 frame ⊕ frame / frame ⊕ Series two-axis alignment
surface — judged worth evicting one r10-stale re-check).

ROUND-14 WINDOW PLAN (written r13, measured against the evidence-age sort
simulated after this round's flip — post-r13 evidence histogram expected:
r13:50, r12:50, r11:50, r10:50, r9:~11): the r14 window self-assembles as

  1. q_api_rowalign_dup_labels + q_api_frame_align_arith (never-green,
     sort first) — 2 slots,
  2. the ~11 r9-evidence leftovers (q_api_explode_tokens,
     q_api_grouped_transform, q_curation_pii_redaction,
     q_dedup_apply_removal, q_graph_triangles, ... — whichever the
     CORRECTNESS_r13 window did not reach),
  3. the first ~37 r10-evidence queries in registration order.

~13 r10 queries spill to r15; after r15 no query evidence is older than
r11. Register nothing else in r14 unless it is worth evicting an
r10-stale re-check.

The candidate is oracle-proven at sf0.001 AND sf0.01 by
tests/test_pending_queries.py and pre-armed in BENCH_BASELINE.json.
"""

from __future__ import annotations

from pontem_spark.queries.registry import register
from pontem_spark.queries.round13_pending import PENDING as _PENDING


def _flip() -> None:
    for name, fn, oracle in _PENDING:
        register(name, oracle=oracle)(fn)


_flip()
