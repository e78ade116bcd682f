"""Range-frame windows and non-equi (range) joins.

Absent in the reference (SURVEY.md §2.G "window functions: ∅", "joins: ∅");
these complete the window/join inventory with the two shapes the rest of the
suite doesn't cover: a time-RANGE window frame (physical-time rolling
aggregate, the building block for feature engineering over event streams) and
a band/interval join (non-equi predicate against a small dimension).

Scale notes:
- The RANGE window shuffles once on ``user_id``; frame bounds are evaluated
  per-row against the sorted run, so cost is O(rows in frame), not O(n^2).
  At 100 TB the partition key (user) keeps per-partition state bounded.
- The band join broadcasts the 3-row dimension, so the non-equi predicate is
  evaluated map-side with NO shuffle of the fact table — the plan to want for
  any small-interval-table lookup (BroadcastNestedLoopJoin over a 3-row side
  is effectively free; a shuffle range-join would not be).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table

_MICROS_PER_HOUR = 3_600_000_000


@register(
    "q_window_time_range_avg",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN {_MICROS_PER_HOUR} PRECEDING AND CURRENT ROW), 4) AS rolling_avg_1h
    FROM events
    """,
    tags=("window", "range-frame", "time"),
)
def q_window_time_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour average of ``value`` with a physical-time RANGE
    frame (not a row-count frame): every event sees exactly the events in the
    preceding hour. Ordering on epoch microseconds makes the frame identical
    in Spark and DuckDB regardless of timestamp sub-second precision."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_MICROS_PER_HOUR, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        rnd(F.avg("value").over(w), 4).alias("rolling_avg_1h"),
    )


_BANDS = [
    ("budget", 0.0, 1200.0),
    ("mid", 1200.0, 1700.0),
    ("premium", 1700.0, 1e9),
]


@register(
    "q_range_join_price_band",
    oracle="""
    SELECT b.band_name, COUNT(*) AS n_parts,
           ROUND(AVG(p.p_retailprice), 2) AS avg_price
    FROM part p
    JOIN (VALUES ('budget', 0.0, 1200.0),
                 ('mid', 1200.0, 1700.0),
                 ('premium', 1700.0, 1e9)) AS b(band_name, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band_name
    """,
    tags=("join", "range-join", "broadcast"),
)
def q_range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/band join: assign each part to a price band via a non-equi
    predicate against a broadcast 3-row dimension, then aggregate per band.
    The broadcast keeps the fact side shuffle-free."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_BANDS, "band_name string, lo double, hi double")
    joined = part.join(
        F.broadcast(bands),
        (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        "inner",
    )
    return joined.groupBy("band_name").agg(
        F.count(F.lit(1)).alias("n_parts"),
        rnd(F.avg("p_retailprice"), 2).alias("avg_price"),
    )
