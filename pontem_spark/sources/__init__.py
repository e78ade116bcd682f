"""Data sources / sinks.

The reference has **no file IO at all** (SURVEY.md §2.A A3: its only
"sources" are in-memory iterables / RDDs, ``pontem/series/data_prep.py:23-100``,
and its only "sink" is ``show()`` to the driver). Here sources are Spark-native
readers so every scan benefits from predicate pushdown, column pruning, and
partition pruning.
"""

from pontem_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from pontem_spark.sources.readers import read_parquet, read_csv, read_json, read_orc
from pontem_spark.sources.writers import write_parquet, write_csv, write_json, write_orc

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "write_parquet",
    "write_orc",
    "write_csv",
    "write_json",
]
