"""Multimodal columns: image/audio/video as opaque ``binary`` columns with a
typed metadata struct, plus decode / feature-extract / resize / frame-sample
operators over ``mapInPandas``.

The Spark-side plumbing — schemas, Arrow batch shapes, partition-parallel
UDF execution — is real and tested. The codec step itself is STUBBED
(`_FAKE_DECODER`): this container has no image/audio libraries, so the
decoder derives deterministic pseudo-metadata from the bytes' md5. Swap
``decode_fn`` for a real Pillow/ffmpeg call in production; nothing else
changes, because the batch contract (pandas DataFrame in → pandas DataFrame
out) is already exactly what a real decoder needs.

At 100 TB: binaries ride in parquet alongside metadata; ``mapInPandas``
processes them partition-by-partition with Arrow transfer and constant
memory per batch (spark.sql.execution.arrow.maxRecordsPerBatch). Filters on
the metadata struct (width/height/mime) prune BEFORE decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "id bigint, n_bytes bigint, content_sha256 string, mime string, "
    "width int, height int, channels int"
)


def attach_binary(df: DataFrame, id_col: str, payload_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Pack a column into (id, media binary, meta struct). For the synthetic
    corpus the 'media' is the utf-8 bytes of the text column; with real data
    this is the parquet binary column as stored."""
    bin_col = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("id"),
        bin_col.alias("media"),
        F.struct(
            F.length(bin_col).cast("bigint").alias("n_bytes"),
            F.sha2(bin_col, 256).alias("content_sha256"),
            F.lit(mime).alias("mime"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder (deterministic fake): pseudo image dimensions derived
    from the content hash. Replace with a real codec in production."""
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 192,        # 64..255
        "height": 64 + h[1] % 192,
        "channels": 1 + h[2] % 3,        # 1..3
    }


def decode_media(
    df: DataFrame,
    decode_fn: Callable[[bytes], dict] | None = None,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode binaries to typed metadata via mapInPandas (Arrow batches).

    ``df`` must have columns (id, media, meta) from :func:`attach_binary`.
    The per-batch loop is the real production shape: batch in, vectorized
    work, batch out — only ``decode_fn`` is a stub here.
    """
    decode = decode_fn or _fake_decode

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            metas = [decode(bytes(b)) for b in pdf["media"]]
            out = pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "n_bytes": [len(bytes(b)) for b in pdf["media"]],
                    "content_sha256": [m["content_sha256"] for m in pdf["meta"]],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                }
            )
            yield out

    return df.mapInPandas(batches, MEDIA_META_SCHEMA)


def resize_media(df: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize stub: computes the TARGET geometry (aspect-preserving clamp to
    ``max_side``) JVM-side from decoded metadata — the arithmetic any real
    resizer needs — and raises on the pixel path.

    Input: output of :func:`decode_media`. The actual pixel transform would
    run in the same mapInPandas slot as decode_media; fused in production.
    """
    scale = F.when(
        F.greatest(F.col("width"), F.col("height")) <= max_side, F.lit(1.0)
    ).otherwise(max_side / F.greatest(F.col("width"), F.col("height")))
    return df.select(
        "id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub for video binaries: emits the frame-index plan
    (which frames a real decoder would extract) as an array column. The
    pseudo frame count derives from n_bytes — a real implementation reads
    the container header instead."""
    n_frames = (F.col("n_bytes") % 300 + 30).cast("int")  # fake: 30..329 frames
    return df.select(
        "id",
        n_frames.alias("n_frames"),
        F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)).alias("sampled_frame_indices"),
    )


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction stub: a deterministic pseudo-embedding from the
    content hash (mapInPandas, Arrow-batched — the real model-inference
    shape; swap the body for an ONNX/torch call)."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            for b in pdf["media"]:
                h = hashlib.sha256(bytes(b)).digest()
                feats.append([h[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"id": pdf["id"].values, "features": feats})

    return df.mapInPandas(batches, "id bigint, features array<double>")
