"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature-extract kernels need codec libraries that are not in this
container, so the *kernels* are stubs (deterministic fake features behind
``fake=True``, ``NotImplementedError`` otherwise) — but the Spark-side
plumbing is real and tested: schema, Arrow batch shape, ``mapInPandas``
iterator contract, partition sizing.

At scale: binary payloads ride in their own column so column pruning keeps
metadata-only queries from ever reading the bytes; decode fans out with
``mapInPandas`` (streaming Arrow batches, bounded memory per task).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, declared_mime string"
)
META_SCHEMA = (
    "media_id long, kind string, n_bytes long, magic string, payload_sha256 string"
)
FEATURE_SCHEMA = "media_id long, feature array<float>, feat_dim int"


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of the doc text
    (stands in for image/audio bytes; schema and sizes are what matter)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("declared_mime"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata extraction — pure JVM expressions, no decode needed:
    byte length, 4-byte magic sniff (hex), payload sha256."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.upper(F.hex(F.substring("payload", 1, 4))).alias("magic"),
        F.sha2("payload", 256).alias("payload_sha256"),
    ).orderBy("media_id")


MEDIA_METADATA_SQL = """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           upper(hex(encode(substr(text, 1, 4)))) AS magic,
           sha256(text) AS payload_sha256
    FROM documents
    ORDER BY media_id
"""


def decode_features(media: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """'Decode + feature-extract' over Arrow batches (``mapInPandas``).

    With ``fake=True`` the feature is a deterministic function of the payload
    sha256 (so tests exercise the full distributed path end-to-end); with
    ``fake=False`` it raises ``NotImplementedError`` where a real codec
    (PIL / ffmpeg / torchaudio) would be called."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this container (PIL/ffmpeg); use fake=True"
                )
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                arr = np.frombuffer(digest[: dim * 4], dtype="<u4").astype(np.float64)
                feats.append((arr / np.float64(2**32)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "feat_dim": np.int32(dim),
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, thumb binary"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame_offset_s double, frame string"


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """'Resize' kernel over Arrow batches.  With ``fake=True`` the thumb is a
    deterministic function of (payload sha256, target size) — byte plumbing,
    batch shape and schema are real; ``fake=False`` marks where PIL/opencv
    would decode+resample (not in this container)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL/opencv; use fake=True"
                )
            thumbs = []
            for payload in pdf["payload"]:
                seed = hashlib.sha256(bytes(payload) + f"{width}x{height}".encode())
                # deterministic fake pixel buffer of the right byte size
                reps = (width * height * 3 + 31) // 32
                thumbs.append((seed.digest() * reps)[: width * height * 3])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "thumb": thumbs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, fps: float = 1.0, max_frames: int = 4, fake: bool = True
) -> DataFrame:
    """'Frame-sample' kernel for video payloads: emit ≤ ``max_frames`` rows
    per media at 1/fps spacing.  Fake frames are sha256(payload ‖ idx); real
    decode (ffmpeg) is the documented NotImplementedError."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg; use fake=True"
                )
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                # fake duration: 1 second per 64 payload bytes
                n = min(max_frames, max(1, len(bytes(payload)) // 64))
                for i in range(n):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": i,
                            "frame_offset_s": i / fps,
                            "frame": hashlib.sha256(
                                bytes(payload) + i.to_bytes(4, "big")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_offset_s", "frame"]
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(kernel, FRAMES_SCHEMA)
    )


def feature_values(media: DataFrame, dim: int = 8) -> DataFrame:
    """Driver-facing projection of :func:`decode_features`: the raw
    ``array<float>`` column is not canonicalizable by the oracle harness
    (pandas cannot factorize lists), so explode it to scalar
    ``(media_id, idx, value)`` rows.  Bit-exact against DuckDB: both sides
    compute float32(round(u4 / 2^32)) with IEEE round-to-nearest."""
    feats = decode_features(media, dim=dim, fake=True)
    return (
        feats.select("media_id", F.posexplode("feature").alias("idx", "value"))
        .orderBy("media_id", "idx")
    )


def feature_values_sql(dim: int = 8) -> str:
    """DuckDB oracle for :func:`feature_values`: re-derive the fake feature
    from sha256 hex — word *i* is the little-endian uint32 at byte offset
    ``4*i`` of the digest, divided by 2^32 and cast to FLOAT."""
    le_word = (
        "'0x' || substr(h, 8*w.idx+7, 2) || substr(h, 8*w.idx+5, 2)"
        " || substr(h, 8*w.idx+3, 2) || substr(h, 8*w.idx+1, 2)"
    )
    return f"""
    WITH media AS (SELECT doc_id AS media_id, sha256(text) AS h FROM documents)
    SELECT m.media_id,
           CAST(w.idx AS INT) AS idx,
           CAST(CAST({le_word} AS BIGINT) / 4294967296.0 AS FLOAT) AS value
    FROM media m CROSS JOIN (SELECT unnest(range({dim})) AS idx) w
    ORDER BY media_id, idx
    """
