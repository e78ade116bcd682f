"""Round-8 registration flip for the staged pending candidates.

FLIPPED in round 8: ``round8`` is imported by ``registry.all_queries()``,
registering all 54 staged candidates. They sort never-green-first, so
the r8 driver window is exactly the first 50 of them; the four
registration-order-last candidates spill to round 9:

    q_ts_rolling_corr, q_pipeline_entity_resolution,
    q_feature_target_encoding, q_events_session_metrics

ROUND-9 WINDOW PLAN (written in r8 so the r9 session doesn't re-derive
it): after r8, evidence freshness is r8:50 / r7:50 / r6:50 / r5:49.
The r9 window self-assembles from the evidence-age sort as:
  - the 4 spilled candidates above (never-green -> sort first), plus
  - any NEW r9 registration (e.g. the planned upsert_parquet read-back
    query, already staged in queries/round9_pending.py; budget AT MOST
    1-2 new ones), plus
  - the oldest-evidence queries: the 49 r5-green queries (TPC-H
    q11-q22 tail, window family, set-ops family) fill the remaining
    ~44-45 slots; the last few spill to r10 with the r6-green block.
No hand-editing needed — _latest_green_rounds() computes this — the
only r9 decision is HOW MANY new queries to register (each one evicts
an r5-stale re-check).

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
