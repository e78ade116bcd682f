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


@register(
    "q_multimodal_decode_pipeline",
    oracle=None,  # stubbed codec → rows-only check; plumbing is real mapInPandas
    tags=("multimodal", "decode", "mapInPandas"),
)
def q_multimodal_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode → resize-plan pipeline over Arrow batches: pack binaries,
    mapInPandas 'decode' (stub codec, production batch contract), then the
    aspect-preserving resize geometry JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    packed = M.attach_binary(docs, "doc_id", "text", mime="image/fake")
    decoded = M.decode_media(packed)
    return M.resize_media(decoded, max_side=128)
