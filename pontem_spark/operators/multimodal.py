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


def _hex4(col):  # 8-hex-char big-endian u32
    return F.lpad(F.lower(F.hex(col)), 8, "0")


def attach_synthetic_png(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pack each row into a VALID minimal PNG binary, built entirely JVM-side
    (hex assembly + crc32 — no UDF): signature, an IHDR chunk whose
    width/height derive deterministically from md5(text) (64..255, RGB
    8-bit), an IDAT chunk carrying the raw text bytes (never inflated — the
    decoder reads headers only), and IEND. Because the dimensions are
    md5-derived, a SQL oracle can predict what a real header parse must
    return — the codec round-trip itself becomes oracle-checkable."""
    payload = F.encode(F.col(text_col), "UTF-8")
    md5hex = F.md5(payload)
    w = (F.lit(64) + F.conv(F.substring(md5hex, 1, 2), 16, 10).cast("int") % 192).cast("bigint")
    h = (F.lit(64) + F.conv(F.substring(md5hex, 3, 2), 16, 10).cast("int") % 192).cast("bigint")
    hexbin = lambda c: F.to_binary(c, F.lit("hex"))  # noqa: E731
    ihdr_td = F.concat(  # chunk type + 13-byte body
        hexbin(F.lit("49484452")),  # 'IHDR'
        hexbin(F.concat(_hex4(w), _hex4(h), F.lit("0802000000"))),  # depth 8, RGB
    )
    idat_td = F.concat(hexbin(F.lit("49444154")), payload)  # 'IDAT' + raw bytes
    png = F.concat(
        hexbin(F.lit("89504e470d0a1a0a")),  # PNG signature
        hexbin(F.lit("0000000d")), ihdr_td, hexbin(_hex4(F.crc32(ihdr_td))),
        hexbin(_hex4(F.length(payload).cast("bigint"))), idat_td, hexbin(_hex4(F.crc32(idat_td))),
        hexbin(F.lit("0000000049454e44ae426082")),  # IEND
    )
    return df.select(
        F.col(id_col).alias("id"),
        png.alias("media"),
        F.struct(
            F.length(png).cast("bigint").alias("n_bytes"),
            F.sha2(png, 256).alias("content_sha256"),
            F.lit("image/png").alias("mime"),
        ).alias("meta"),
    )


def parse_image_header(payload: bytes) -> dict | None:
    """REAL header-parse codec (pure Python, no image libraries): reads
    dimensions/channels from PNG IHDR, JPEG SOF0/1/2, or GIF logical screen
    descriptor. Returns None for unrecognized bytes (caller falls back)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        color_type = payload[25]
        return {
            "mime": "image/png",
            "width": int.from_bytes(payload[16:20], "big"),
            "height": int.from_bytes(payload[20:24], "big"),
            "channels": {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(int(color_type), 0),
        }
    if payload[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF marker
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                return {
                    "mime": "image/jpeg",
                    "height": int.from_bytes(payload[i + 5 : i + 7], "big"),
                    "width": int.from_bytes(payload[i + 7 : i + 9], "big"),
                    "channels": int(payload[i + 9]),
                }
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return {
            "mime": "image/gif",
            "width": int.from_bytes(payload[6:8], "little"),
            "height": int.from_bytes(payload[8:10], "little"),
            "channels": 3,
        }
    return None


def _fake_decode(payload: bytes) -> dict:
    """Fallback for unrecognized payloads (deterministic pseudo-dimensions
    from the content hash) — kept for opaque media the header parser can't
    read; clearly a stub, never used for real PNG/JPEG/GIF bytes."""
    h = hashlib.md5(payload).digest()
    return {
        "mime": None,
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

    ``df`` must have columns (id, media, meta) from :func:`attach_binary` or
    :func:`attach_synthetic_png`. The default decoder is the REAL
    header-parse codec (:func:`parse_image_header` — PNG/JPEG/GIF); payloads
    it cannot read fall back to the labeled deterministic stub.
    """
    if decode_fn is None:
        def decode(b: bytes) -> dict:
            return parse_image_header(b) or _fake_decode(b)
    else:
        decode = decode_fn

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            metas = [decode(bytes(b)) for b in pdf["media"]]
            out = pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "n_bytes": [len(bytes(b)) for b in pdf["media"]],
                    "content_sha256": [m["content_sha256"] for m in pdf["meta"]],
                    "mime": [d["mime"] or m["mime"] for d, m in zip(metas, pdf["meta"])],
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
        # floor(x+0.5) instead of round(): portable half-up (compat.rnd form)
        F.floor(F.col("width") * scale + F.lit(0.5)).cast("int").alias("target_width"),
        F.floor(F.col("height") * scale + F.lit(0.5)).cast("int").alias("target_height"),
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
