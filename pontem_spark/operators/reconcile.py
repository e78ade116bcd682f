"""Snapshot reconciliation: diff two versions of a table by key.

The data-engineering acceptance gate — after a backfill, a migration, or
an upsert batch, classify every key as added / removed / changed /
unchanged WITHOUT comparing columns pairwise driver-side: each side
reduces to (key, row_hash) map-side, and one full-outer join on the key
classifies everything. At 100 TB the shuffle carries two hashes per key,
never row bodies.

Float trap (documented, caller-controlled): hashing a raw DOUBLE's
string form is engine- and locale-dependent (Java's ``1.0E7`` vs
DuckDB's ``10000000.0``), so ``row_hash`` hashes the CALLER's columns as
given — cast floats to DECIMAL/BIGINT (e.g. cents) before diffing, the
same discipline as every md5-bucket operator in this package.

Reference parity: extension surface (SURVEY.md §2.G data-ops); the
reference engine has no reconciliation operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_NULL_MARK = "\x00null\x00"
_SEP = "\x1f"


def row_hash(cols: Sequence[str]) -> Column:
    """md5 over null-marked, unit-separated string forms of ``cols``.

    The null mark and separator make the encoding prefix-free enough for
    reconciliation ((“a”, “bc”) never collides with (“ab”, “c”), and NULL
    never collides with the empty string).
    """
    parts = []
    for c in cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit(_NULL_MARK)))
    return F.md5(F.concat_ws(_SEP, *parts))


def row_hash_sql(cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`row_hash` for oracle SQL."""
    parts = ", ".join(
        f"COALESCE(CAST({c} AS VARCHAR), chr(0) || 'null' || chr(0))" for c in cols
    )
    return f"md5(concat_ws(chr(31), {parts}))"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Per-key change classification between two snapshots.

    Returns one row per key present in either side:
    (key..., change_type) with change_type in
    {'added', 'removed', 'changed', 'unchanged'}.

    Plan: two map-side (key, hash) projections, ONE full-outer join on
    the key — the join payload is a 32-char hash regardless of row
    width. Aggregate with ``groupBy('change_type').count()`` for the
    summary, or anti-filter 'unchanged' for an incremental-processing
    changelog (both stay on the same single-join plan).
    """
    keys = list(key_cols)
    o = old.select(*keys, row_hash(compare_cols).alias("__h_old"))
    n = new.select(*keys, row_hash(compare_cols).alias("__h_new"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*keys, change.alias("change_type"))
