"""Round-2 queries: new operators added this round.

Registered immediately after the previously-unverified tpch2/tpch3/windows/
tpch families so they land inside the driver's 50-row correctness window.

Queries are added here by the operators they exercise:
- bucketed cosine near-dup pairs (LSH buckets -> per-bucket BLAS kernel)
- SimHash banded near-pair candidates (equi-join, no O(n^2) scan)
- public pandas-like API surface for the dedup/similarity operators
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table

_COS4_SQL = (
    "ROUND(list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(generate_series(1, len({b})), "
    "i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))), 4)"
)


def _bucketed_cosine_oracle(n_planes: int = 4, dim: int = 64, threshold: float = 0.4) -> str:
    from pontem_spark.queries.oracle_fragments import lsh_sig_sql

    return f"""
    WITH b AS (
        SELECT vec_id, embedding, {lsh_sig_sql('embedding', n_planes, dim)} AS bucket
        FROM embeddings
    ), pairs AS (
        SELECT x.vec_id AS id_a, y.vec_id AS id_b,
               {_COS4_SQL.format(a='x.embedding', b='y.embedding')} AS cos_sim
        FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= {threshold}
    """


from pontem_spark.queries.oracle_fragments import minhash_oracle  # no registrations


@register(
    "q_api_dedup_minhash",
    oracle=minhash_oracle(8, 4),
    tags=("api", "dedup", "minhash", "lsh"),
)
def q_api_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH dedup pipeline driven ENTIRELY through the public
    pandas-like API: read_parquet → df.dedup.minhash_candidates(...) —
    proving the north-star surface runs the same scale-shaped plan as the
    operator layer (same oracle as q_dedup_minhash_candidates)."""
    from pontem_spark.core.io import read_parquet

    pdf = read_parquet(f"{sf_dir}/documents.parquet", spark=spark)
    cands = pdf.dedup.minhash_candidates("doc_id", "text", num_hashes=8, rows_per_band=4, ngram=3)
    return cands.to_spark().select("id_a", "id_b")


@register(
    "q_dedup_cosine_bucketed",
    oracle=_bucketed_cosine_oracle(),
    tags=("dedup", "embedding", "cosine", "lsh"),
)
def q_dedup_cosine_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via LSH buckets + per-bucket BLAS kernel:
    one hash shuffle on the bucket key, no driver collect — the
    linear-shuffle 100 TB counterpart of the exact tiled all-pairs."""
    from pontem_spark.operators.similarity import cosine_pairs_bucketed

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_bucketed(emb, "vec_id", "embedding", threshold=0.4, n_planes=4, dim=64, round_digits=4)


@register(
    "q_stream_stateful_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def q_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running (count, sum, max) maintained in grouped state across
    micro-batches, drained with availableNow — the FINAL state per key must
    hash-match the plain batch aggregation. Update mode can emit a key once
    per batch; the final emission is selected via max-by-count (n_events is
    strictly increasing per emission), so the check is multi-batch-safe."""
    from pyspark.sql import functions as F

    from pontem_spark.functions.compat import rnd
    from pontem_spark.streaming import read_event_stream, run_to_memory
    from pontem_spark.streaming.stateful import running_user_stats

    emitted = run_to_memory(
        running_user_stats(read_event_stream(spark, sf_dir)), mode="update"
    )
    final = (
        emitted.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value", "max_value")).alias("s"))
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            rnd(F.col("s.total_value"), 2).alias("total_value"),
            F.col("s.max_value").alias("max_value"),
        )
    )
    return final
