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
"""

from __future__ import annotations

from pontem_spark.queries.registry import register
from pontem_spark.queries.round9_pending import PENDING as _PENDING


def _flip() -> None:
    for name, fn, oracle in _PENDING:
        tags = ("streaming",) if name.startswith("q_stream_") else ()
        register(name, oracle=oracle, tags=tags)(fn)


_flip()
