"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running aggregates (event count, value sum, max value) maintained
in grouped state across micro-batches — the escape hatch for streaming
semantics that built-in windowed aggregations can't express (per-key
algorithmic state, custom eviction, cross-batch counters).

State discipline for scale: the state value is a fixed-size tuple per key
(no unbounded lists); keys are users, so state size is O(active users);
GroupStateTimeout would evict idle keys in a production config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"
STATE_SCHEMA = "n bigint, total double, mx double"


def _update_user_stats(key, pdf_iter, state: GroupState):
    import pandas as pd

    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Streaming per-user running stats; emits the latest state each batch."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
