"""Document chunking for retrieval pipelines (RAG ingestion).

Splits each document into fixed-size token windows with optional overlap —
the standard pre-embedding step of a retrieval corpus build. The whole
operator is a projection plus one ``posexplode`` Generate: zero shuffles,
zero UDFs, scales with executor count alone; at 100 TB the output is
written straight to a partitioned sink without any chunk ever crossing an
Exchange.

Reference scope: the reference engine (pontem) has no chunking surface;
this is part of the training-data/retrieval extension layer
(SURVEY.md §2.G).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_by_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    overlap: int = 0,
) -> DataFrame:
    """Fixed-size token-window chunking with overlap.

    Tokens are whitespace splits; window starts advance by
    ``step = size - overlap`` while ``start < n_tokens`` (the simple
    sliding rule every splitter implements — the final window may be a
    short suffix). Output: one row per chunk with ``(id, chunk_id,
    chunk_text, n_tokens)``; ``chunk_id`` is the 0-based window ordinal.

    Plan shape: Project → Generate(posexplode) → Project. The token array
    is built once per row and sliced per window — no shuffle, no UDF, and
    at scale the Generate's fan-out (≈ n_tokens/step rows per doc) is the
    only cost. Rows with NULL text are dropped by an explicit filter
    (``greatest`` skips NULLs in both Spark and DuckDB, so without it a
    NULL document would leak one NULL chunk).
    """
    if size <= 0:
        raise ValueError("size must be positive")
    if not 0 <= overlap < size:
        raise ValueError("overlap must satisfy 0 <= overlap < size")
    step = size - overlap
    out = (
        df.filter(F.col(text_col).isNotNull())
        .withColumn("__t", F.split(F.trim(F.col(text_col)), r"\s+"))
        .withColumn("__n", F.size("__t"))
        .select(
            id_col,
            "__t",
            F.posexplode(F.expr(f"sequence(0, greatest(__n - 1, 0), {step})")).alias(
                "chunk_id", "__start"
            ),
        )
    )
    return out.select(
        id_col,
        "chunk_id",
        F.expr(f"array_join(slice(__t, __start + 1, {size}), ' ')").alias(
            "chunk_text"
        ),
        F.expr(f"size(slice(__t, __start + 1, {size}))").cast("bigint").alias(
            "n_tokens"
        ),
    )


def chunk_by_tokens_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    size: int,
    overlap: int = 0,
) -> str:
    """DuckDB twin of :func:`chunk_by_tokens` (1-based ``list_slice`` with
    clamped end mirrors Spark's ``slice``; ``generate_series`` has the same
    inclusive-bound semantics as Spark's ``sequence``)."""
    step = size - overlap
    return f"""
    WITH t AS (
        SELECT {id_col}, regexp_split_to_array(trim({text_col}), '\\s+') AS toks
        FROM {table} WHERE {text_col} IS NOT NULL
    ), s AS (
        SELECT {id_col}, toks, len(toks) AS n FROM t
    ), g AS (
        SELECT {id_col}, toks, n,
               unnest(generate_series(0, greatest(n - 1, 0), {step})) AS start
        FROM s
    )
    SELECT {id_col},
           CAST(start // {step} AS INTEGER) AS chunk_id,
           array_to_string(toks[start + 1 : least(start + {size}, n)], ' ')
               AS chunk_text,
           CAST(least(start + {size}, n) - start AS BIGINT) AS n_tokens
    FROM g
    """
