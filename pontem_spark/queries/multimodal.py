"""Multimodal-column queries. The binary-metadata query is fully
oracle-checked (sha256/byte-length are engine-portable); the decode path
(stubbed codec, real mapInPandas plumbing) is rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.operators import multimodal as M
from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table


@register(
    "q_multimodal_binary_meta",
    oracle="""
    SELECT doc_id AS id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS content_sha256
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def q_multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column packing + typed metadata, JVM-side: byte length and
    content digest of the media payload (here: utf-8 of text)."""
    docs = load_table(spark, sf_dir, "documents")
    packed = M.attach_binary(docs, "doc_id", "text", mime="text/plain")
    return packed.select(
        "id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_sha256").alias("content_sha256"),
    )


# hex pair -> 0..255, portable SQL (no hex-cast dialect dependence)
_HEXBYTE = (
    "((strpos('0123456789abcdef', substr(md5(text), {i}, 1)) - 1) * 16 + "
    "strpos('0123456789abcdef', substr(md5(text), {j}, 1)) - 1)"
)


@register(
    "q_multimodal_decode_pipeline",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id AS id,
               CAST(64 + {_HEXBYTE.format(i=1, j=2)} % 192 AS INT) AS width,
               CAST(64 + {_HEXBYTE.format(i=3, j=4)} % 192 AS INT) AS height
        FROM documents
    ), scaled AS (
        SELECT id, width, height,
               CASE WHEN greatest(width, height) <= 128 THEN CAST(1.0 AS DOUBLE)
                    ELSE 128.0 / greatest(width, height) END AS s
        FROM dims
    )
    SELECT id, width, height,
           CAST(floor(width * s + 0.5) AS INT) AS target_width,
           CAST(floor(height * s + 0.5) AS INT) AS target_height
    FROM scaled
    """,
    tags=("multimodal", "decode", "mapInPandas"),
)
def q_multimodal_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode → resize-plan pipeline over Arrow batches: build VALID
    PNG binaries JVM-side (md5-derived dimensions), mapInPandas decode with
    a REAL header parser (PNG IHDR), then aspect-preserving resize geometry
    JVM-side. The oracle predicts the dimensions a correct IHDR parse must
    recover — the codec round-trip is hash-checked, not just row-counted."""
    docs = load_table(spark, sf_dir, "documents")
    packed = M.attach_synthetic_png(docs, "doc_id", "text")
    decoded = M.decode_media(packed)
    return M.resize_media(decoded, max_side=128)
