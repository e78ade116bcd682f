"""SQL over pandas-like frames: register pontem DataFrames/Series as temp
views and run any Spark SQL — the full declarative surface on top of the
pandas-like one, one Catalyst plan end to end."""

from __future__ import annotations

from pyspark.sql import SparkSession

from pontem_spark.core.frame import DataFrame
from pontem_spark.core.internal import default_session
from pontem_spark.core.io import from_spark


def sql(query: str, spark: SparkSession | None = None, **frames) -> DataFrame:
    """Run SQL with pontem frames bound as views.

    >>> out = sql("SELECT seg, sum(v) AS s FROM t GROUP BY seg", t=my_frame)
    """
    spark = spark or default_session()
    for name, frame in frames.items():
        sdf = frame.to_spark() if hasattr(frame, "to_spark") else frame
        sdf.createOrReplaceTempView(name)
    return from_spark(spark.sql(query))
