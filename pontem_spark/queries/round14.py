"""Round-15 registration flip for the r14-staged candidates.

NOT imported by ``registry.all_queries()`` yet — round 14 registers the
two r13-staged candidates (queries/round13.py, flipped this round) and
spends the rest of its window on the 5 CHANGED_IN_ROUND plan-changed
re-checks + the r9/r10-stale tier, all self-assembled by the
evidence-age sort.

ROUND-15 FLIP (one line): add ``round14`` to the import list inside
``registry.all_queries()``. That registers q_api_frame_axis0_mod (first
driver evidence for the r14 axis=0 Series broadcast and the
pandas-corrected frame mod/floordiv/pow helpers) and
q_api_multiindex_align_fill (first driver evidence for the r14
cross-anchor dtype/missing-mask fix, MultiIndex frame alignment, and the
from_spark index_col list form) — both oracle-proven at sf0.001 and
sf0.01 by tests/test_pending_queries.py and pre-armed in
BENCH_BASELINE.json.

ROUND-15 WINDOW PLAN (written r14, measured against the evidence-age
sort simulated after this round's flip — post-r14 evidence histogram
expected: r14:50, r13:50, r12:50, r11:50, r10:~13, assuming
CORRECTNESS_r14 covers its 50-query window of 5 plan-changed + 2 flips
+ 11 r9-stale + 32 r10-stale): the r15 window self-assembles as

  1. q_api_frame_axis0_mod + q_api_multiindex_align_fill (never-green,
     sort first) — 2 slots,
  2. the ~13 r10-evidence leftovers (whichever of the r10 tier the
     CORRECTNESS_r14 window did not reach),
  3. the first ~35 r11-evidence queries in registration order.

After r15 no query evidence is older than r11. Register nothing else in
r15 unless it is worth evicting an r11-stale re-check.
"""

from __future__ import annotations

from pontem_spark.queries.registry import register
from pontem_spark.queries.round14_pending import PENDING as _PENDING


def _flip() -> None:
    for name, fn, oracle in _PENDING:
        register(name, oracle=oracle)(fn)


_flip()
