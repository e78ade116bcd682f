"""Event-stream (batch-over-log) queries: time bucketing, JSON, sessionization.

The `events` table is the stream-shaped fixture (FIXTURES.md §2). These are
the batch forms; `pontem_spark.streaming` holds the Structured Streaming
equivalents (same transformations over readStream).

Precision note: the parquet stores timestamp[ns]; Spark truncates to
microseconds on read while DuckDB keeps nanoseconds, so every oracle first
``date_trunc('microseconds', ts)`` to see the same instants Spark sees.
Timestamps returned to the comparator are formatted as strings so neither
engine's native precision leaks into the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table


@register(
    "q_events_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS event_hour,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "time", "agg"),
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour rollup (the batch twin of a streaming windowed agg).
    COUNT(DISTINCT) expands to a two-phase partial-distinct plan — still one
    logical pass over the scan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("event_hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "q_events_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
    tags=("events", "json"),
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props column, JVM-side (no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.select("event_id", k.alias("k_value")).filter(F.col("k_value") >= 50)


@register(
    "q_events_sessionize",
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
        SELECT user_id, event_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    tags=("events", "session", "window"),
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): LAG to flag session
    starts, running SUM to number sessions, then events-per-session. Two
    window passes share ONE shuffle (same partitionBy/orderBy)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.select("user_id", "event_id", "ts")
        .withColumn("is_new", is_new)
        .withColumn("session_seq", F.sum("is_new").over(wsum).cast("bigint"))
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "q_events_user_funnel",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN date_trunc('microseconds', ts) END)   AS first_signup,
               min(CASE WHEN event_type = 'purchase' THEN date_trunc('microseconds', ts) END) AS first_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           date_diff('second', first_signup, first_purchase) AS signup_to_purchase_s
    FROM firsts
    WHERE first_signup IS NOT NULL AND first_purchase IS NOT NULL
      AND first_purchase > first_signup
    """,
    tags=("events", "funnel", "agg"),
)
def q_events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: seconds from first signup to first purchase per
    user — conditional aggregation, single shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    first_signup = F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
    first_purchase = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    return (
        ev.groupBy("user_id")
        .agg(first_signup.alias("first_signup"), first_purchase.alias("first_purchase"))
        .filter(
            F.col("first_signup").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") > F.col("first_signup"))
        )
        .select(
            "user_id",
            (F.unix_timestamp("first_purchase") - F.unix_timestamp("first_signup")).alias(
                "signup_to_purchase_s"
            ),
        )
    )
