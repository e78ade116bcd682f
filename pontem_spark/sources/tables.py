"""Loaders for the driver's deterministic test tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. At 100 TB each
"file" is a directory of many row-groups/files; ``spark.read.parquet`` handles
both identically, and Catalyst pushes filters + prunes columns into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H fixes
# region at 5 rows and nation at 25 rows regardless of SF; supplier/part/
# customer grow with SF and must NOT be assumed broadcastable).
ALWAYS_BROADCAST = {"region", "nation"}


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Normalize every timestamp-ish column to plain TIMESTAMP (LTZ).

    The test parquet has shipped two encodings of ``events.ts`` across
    driver generations:

    - TIMESTAMP(NANOS): under ``spark.sql.legacy.parquet.nanosAsLong`` it
      arrives as raw nanos (long), which we truncate to microsecond
      timestamps (integer ``div`` — a double division would lose precision
      on ~1.7e18 nano values);
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads it as
      TIMESTAMP_NTZ, which half the chrono builtins (unix_micros,
      unix_timestamp, window watermarks declared on LTZ) reject. The
      session timezone is pinned to UTC (session.py), so casting NTZ →
      TIMESTAMP is value-preserving and matches DuckDB's naive reading.

    Normalizing at the scan keeps every downstream operator agnostic to
    which writer produced the files — the property a 100 TB lake needs,
    where files from different pipeline eras coexist in one table.
    """
    for fld in df.schema.fields:
        if fld.name == "ts" and fld.dataType.typeName() == "long":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif fld.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(fld.name, F.col(fld.name).cast("timestamp"))
    return df


# Parquet FOOTER-SCHEMA cache (metadata only — never data). Without an
# explicit schema every spark.read.parquet() call re-runs schema inference
# on the driver (~90 ms/table here), and the bench pays that on every
# build of every query: profiled at ~2/3 of a typical TPC-H query's
# construction time (OPTIMIZATION_r14.md item 18). The key carries the
# path's stat signature so a rewritten file (new mtime/size) re-infers —
# the cache can serve stale METADATA only if a writer mutates bytes
# in-place without changing mtime or size, which no parquet writer does.
# Unstatable paths (object stores) skip the cache entirely.
_SCHEMA_CACHE: dict[tuple, StructType] = {}  # (path, mtime_ns, size, nanosAsLong)

# Lazy-DataFrame cache, layered on the same stat signature and keyed
# weakly by session (a DataFrame is session-bound; a stopped session's
# entries vanish with it). This is PLAN-object reuse, not result caching:
# the cached object is an unexecuted scan + the timestamp-normalization
# projection — every action on it still reads the parquet bytes. It
# removes the remaining ~25 ms of reader-construction py4j chatter per
# load_table call (DataFrames are immutable, so sharing one across
# queries is safe; Spark itself shares the session FileStatusCache the
# same way).
_DF_CACHE: "object" = None  # created lazily to keep import cost nil


def _df_cache_for(spark: SparkSession) -> dict:
    global _DF_CACHE
    if _DF_CACHE is None:
        import weakref

        _DF_CACHE = weakref.WeakKeyDictionary()
    return _DF_CACHE.setdefault(spark, {})


def _stat_key(path: str) -> tuple[str, int, int] | None:
    """Stat signature for a REGULAR FILE table. Returns None (→ no caching)
    for directories as well as unstatable paths: a directory's root
    mtime/size change only when direct entries are added or removed, so a
    partition-level rewrite INSIDE a nested subdir (dynamic partition
    overwrite writing tbl.parquet/part=1/...) would leave the root stat
    unchanged and both caches would serve a stale schema / stale file
    listing (r15, ADVICE r14 + VERDICT "what's wrong" #2)."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    if not os.path.isfile(path):
        return None
    return (path, st.st_mtime_ns, st.st_size)


def _evict_same_path(cache: dict, path: str, keep_key) -> None:
    """Keep at most one cache entry per path: a rewritten file gets a new
    stat signature and the superseded entry would otherwise leak for the
    process lifetime (r15, ADVICE r14)."""
    stale = [k for k in cache if k[0] == path and k != keep_key]
    for k in stale:
        del cache[k]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Lazy — no job runs until an action (the schema
    normalization reads only the parquet footer at plan time, and only
    on the FIRST load of a given file signature — see _SCHEMA_CACHE)."""
    if name == "events":
        # Runtime-settable; required even when the caller (e.g. the driver)
        # built its own session without pontem_spark.session.get_spark().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ→TIMESTAMP cast in normalize_timestamps is value-preserving
        # only under a UTC session timezone; pin it here too, not just in
        # session.py, so an externally-built non-UTC session cannot shift
        # epoch-derived values vs the DuckDB oracle.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    key = _stat_key(path)
    if key is None:  # unstatable path OR a directory table: no caching
        return normalize_timestamps(spark.read.parquet(path))
    # Schema inference and the analyzed normalization plan both depend on
    # session conf: nanosAsLong decides whether TIMESTAMP(NANOS) arrives as
    # long, and the NTZ→TIMESTAMP cast binds the session timezone at
    # analysis time — so both ride in the cache keys (r15, ADVICE r14: a
    # conf change mid-session must re-read, not serve the frozen plan).
    # (no "" fallbacks: RuntimeConfig.get validates the fallback string
    # against the entry's type — '' is an invalid timezone. timeZone always
    # has a session default; nanosAsLong's valid default is "false".)
    tz = spark.conf.get("spark.sql.session.timeZone")
    nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    per_session = _df_cache_for(spark)
    df_key = key + (tz, nanos)
    cached = per_session.get(df_key)
    if cached is not None:
        return cached
    schema_key = key + (nanos,)  # tz never changes the INFERRED schema
    schema = _SCHEMA_CACHE.get(schema_key)
    if schema is not None:
        df = spark.read.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[schema_key] = df.schema
        _evict_same_path(_SCHEMA_CACHE, path, schema_key)
    df = normalize_timestamps(df)
    per_session[df_key] = df
    _evict_same_path(per_session, path, df_key)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so ``spark.sql`` can use it."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
