"""Oracle-checked STREAMING queries: each runs a real Structured Streaming
pipeline (file source → watermarked stateful aggregation → memory sink,
drained with availableNow) and returns the final batch result — which must
hash-match the same ANSI SQL any batch engine computes. Streaming
correctness checked by the same gate as everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.queries.registry import register
from pontem_spark.streaming import (
    hourly_rollup,
    read_event_stream,
    run_to_memory,
    session_windows,
)


@register(
    "q_stream_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS event_hour,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window", "agg"),
)
def q_stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-hour streaming aggregation, drained and compared
    against plain batch SQL — proving the streaming state machinery loses
    and duplicates nothing."""
    result = run_to_memory(hourly_rollup(read_event_stream(spark, sf_dir)), mode="complete")
    return result.select(
        "event_hour", "event_type", "n_events", rnd(F.col("total_value"), 2).alias("total_value")
    )


@register(
    "q_stream_session_windows",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts FROM events
    ), flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    tags=("streaming", "session", "state"),
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session_window (30-min gap) vs the relational
    LAG/cumsum sessionization in SQL: identical sessions, starts, and
    counts. A strong equivalence — two entirely different algorithms (state
    merge vs window scan) must agree row-for-row."""
    result = run_to_memory(session_windows(read_event_stream(spark, sf_dir)), mode="complete")
    return result.select("user_id", "session_start_us", "n_events")


# Gap-based streaming sessionization matches the batch construction because
# both use the same inactivity-gap >1800s rule on microsecond-truncated
# timestamps. Spark's session_window merges on gap <= 30min boundaries the
# same way the LAG >1800 flag splits them: a gap of exactly 1800s keeps the
# session alive in both formulations? NO — session_window extends the window
# to [ts, ts+gap), so an event at exactly ts+gap starts a NEW session, while
# `> 1800` keeps it. With microsecond timestamps an exact-1800.000000s gap
# does not occur in practice; if this dataset ever produced one, the oracle
# would catch it — which is the point of checking streaming differentially.


@register(
    "q_stream_stream_join",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts
        FROM events
    )
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           date_diff('microsecond', c.ts, p.ts) AS delay_us
    FROM e c JOIN e p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 4 HOURS
    """,
    tags=("streaming", "join", "state"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-STREAM interval join (click→purchase attribution
    within 4 hours), drained with availableNow and hash-compared against the
    batch interval join — proving the buffered-state matching emits exactly
    the relational join, no more, no less. The time-range condition bounds
    the join state (streaming/events.py::stream_stream_attribution); an
    unbounded-state join shape cannot be expressed through this helper."""
    from pontem_spark.streaming import stream_stream_attribution

    clicks = read_event_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    purchases = read_event_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    joined = stream_stream_attribution(clicks, purchases)
    return run_to_memory(joined, mode="append")


@register(
    "q_stream_sliding_rollup",
    oracle="""
    WITH e AS (
        SELECT event_type, value,
               date_trunc('hour', ts) AS h
        FROM events
    ), expanded AS (
        SELECT event_type, value, h AS win_start FROM e
        UNION ALL
        SELECT event_type, value, h - INTERVAL 1 HOUR FROM e
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM expanded
    GROUP BY 1, 2
    """,
    tags=("streaming", "window", "sliding", "agg"),
)
def q_stream_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour/1-hour streaming windows vs the relational expansion
    (each event contributes to exactly TWO hop starts: its hour and the
    hour before), proving the overlapping-pane state machinery assigns
    every event to every covering window exactly once."""
    from pontem_spark.streaming.events import sliding_rollup

    result = run_to_memory(
        sliding_rollup(read_event_stream(spark, sf_dir)), mode="complete"
    )
    return result.select(
        "win_start", "event_type", "n_events", rnd(F.col("total_value"), 2).alias("total_value")
    )
