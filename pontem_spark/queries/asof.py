"""As-of join query: for each purchase event, the user's most recent click
at-or-before it. The oracle uses DuckDB's native ASOF JOIN; the Spark side is
pontem_spark.operators.asof (union + window, ONE shuffle on the key — no
exploded range join).

Timestamps are exchanged as epoch microseconds (bigint) so neither engine's
sub-second formatting enters the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.operators.asof import asof_join
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table


@register(
    "q_asof_purchase_click",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type, value,
               date_trunc('microseconds', ts) AS ts
        FROM events
    ), purchases AS (
        SELECT * FROM e WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT * FROM e WHERE event_type = 'click'
    )
    SELECT p.event_id,
           p.user_id,
           epoch_us(p.ts) AS ts_us,
           epoch_us(c.ts) AS click_ts_us,
           ROUND(c.value, 2) AS click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("asof", "join", "events"),
)
def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (pandas merge_asof semantics) built from one
    union + one window shuffle — reference has no joins at all (SURVEY §2.G)."""
    from pontem_spark.functions.compat import rnd

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(purchases, clicks, on="ts", by="user_id", right_prefix="click_")
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.unix_micros(F.col("click_ts")).alias("click_ts_us"),
        rnd(F.col("click_value"), 2).alias("click_value"),
    )


@register(
    "q_asof_forward_next_click",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type, value,
               date_trunc('microseconds', ts) AS ts
        FROM events
    ), purchases AS (
        SELECT * FROM e WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT * FROM e WHERE event_type = 'click'
    ), nxt AS (
        SELECT p.event_id, MIN(c.ts) AS cts
        FROM purchases p JOIN clicks c
          ON p.user_id = c.user_id AND c.ts >= p.ts
        GROUP BY 1
    )
    SELECT p.event_id,
           p.user_id,
           epoch_us(p.ts) AS ts_us,
           epoch_us(n.cts) AS click_ts_us,
           ROUND(c.value, 2) AS click_value
    FROM purchases p
    LEFT JOIN nxt n ON n.event_id = p.event_id
    LEFT JOIN clicks c ON c.user_id = p.user_id AND c.ts = n.cts
    """,
    tags=("asof", "join", "events", "forward"),
)
def q_asof_forward_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (merge_asof direction='forward'): each purchase
    matched to the user's next click at-or-after it — same single-shuffle
    union+window construction, first(ignorenulls) over the following frame
    instead of last over the preceding. The oracle derives the next click
    relationally (min at-or-after timestamp, then payload equi-join), so
    the window formulation is proven against the naive definition."""
    from pontem_spark.functions.compat import rnd

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, clicks, on="ts", by="user_id", right_prefix="click_",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.unix_micros(F.col("click_ts")).alias("click_ts_us"),
        rnd(F.col("click_value"), 2).alias("click_value"),
    )
