"""Round-8 registration flip for the staged pending candidates.

NOT imported by ``registry.all_queries()`` yet: the round-7 driver
window is budgeted exactly (3 formerly-no-oracle queries + the 47
r4-stale queries = 50 slots), and any new registration sorts FIRST
(never-green) and would evict a stale-evidence query from its freshness
re-check.

ROUND-8 FLIP (one line): add ``round8`` to the import list inside
``registry.all_queries()``. Budget note for that session: 54 candidates
all sort into the never-green group and OVERFLOW the 50-slot window by
four — the spilled candidates (registration order sorts last) earn
their first driver rows in round 9; don't register anything else new
that round, and expect zero freshness re-checks of old queries in r8.

Every candidate was oracle-proven in round 7 at sf0.001 AND sf0.01
(tests/test_pending_queries.py + the verify driver-sim) and pre-timed
at sf0.1 (~80 s total; see the round-7 SCALE.md notes).
"""

from __future__ import annotations

from pontem_spark.queries.registry import register
from pontem_spark.queries.round7_pending import PENDING as _PENDING_A
from pontem_spark.queries.round8_pending import PENDING as _PENDING_B


def _flip() -> None:
    for name, fn, oracle in _PENDING_A + _PENDING_B:
        # oracles are already portable-rounded by the staging decorator;
        # portable_round_sql is idempotent (no ROUND( tokens remain), so
        # register()'s second pass is a no-op.
        tags = ("streaming",) if name.startswith("q_stream_") else ()
        register(name, oracle=oracle, tags=tags)(fn)


_flip()
