"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running aggregates maintained in grouped state across
micro-batches — the escape hatch for streaming semantics that built-in
windowed aggregations can't express (per-key algorithmic state, custom
eviction, cross-batch counters).

The state is the SAME mergeable monoid as the batch incremental rollup
(operators/incremental.py: ``STATE_SCHEMA`` / ``merge_state_tuples``), so
batch and streaming share one state definition — a batch-built state table
and a stream-maintained one are interchangeable, which is what lets a
production pipeline bootstrap streaming state from a historical backfill.

State discipline for scale: the state value is a fixed-size tuple per key
(no unbounded lists); keys are users, so state size is O(active users);
GroupStateTimeout would evict idle keys in a production config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pontem_spark.operators.incremental import (
    STATE_SCHEMA,
    ZERO_STATE,
    merge_state_tuples,
    partial_from_pandas,
)

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"


def _update_user_stats(key, pdf_iter, state: GroupState):
    import pandas as pd

    acc = tuple(state.get) if state.exists else ZERO_STATE
    for pdf in pdf_iter:
        acc = merge_state_tuples(acc, partial_from_pandas(pdf["value"]))
    state.update(acc)
    n, total, _ss, _lo, hi = acc
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [hi]}
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Streaming per-user running stats; emits the latest state each batch.
    The richer monoid state (incl. sum-of-squares and min) rides in the
    StateStore; the emitted columns keep the original query contract."""
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
