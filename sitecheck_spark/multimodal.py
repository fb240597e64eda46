"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side architecture is real and tested — schema, partitioning, Arrow
batch shape, mapInPandas signatures; only the codec call itself is stubbed
(no image/audio libraries in this container). Swap `_decode_image_real` for
a PIL/ffmpeg call on a real cluster and nothing else changes.

Design for 100 TB of media:
- binary payloads stay opaque until the single mapInPandas decode pass
  (column pruning keeps them out of every other scan)
- decode emits fixed-size feature rows, never re-emits the payload
- batches are capped via spark.sql.execution.arrow.maxRecordsPerBatch so a
  batch of large blobs fits executor memory
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, width int, height int, "
    "mean_luma double, decode_ok boolean"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"


def _decode_image_real(payload: bytes):  # pragma: no cover - needs PIL
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; wire PIL.Image.open(io.BytesIO(payload)) here"
    )


def _decode_image_fake(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in decode: dims/luma derived from payload bytes."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    arr = np.frombuffer((payload * ((width * height) // max(1, len(payload)) + 1))[: width * height], dtype=np.uint8)
    return width, height, float(arr.mean())


def image_features_batches(use_real_codec: bool = False):
    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                sha = hashlib.sha256(raw).hexdigest()
                try:
                    if use_real_codec:
                        w, h, luma = _decode_image_real(raw)
                    else:
                        w, h, luma = _decode_image_fake(raw)
                    rows.append((media_id, len(raw), sha, w, h, luma, True))
                except NotImplementedError:
                    rows.append((media_id, len(raw), sha, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "sha256", "width", "height",
                         "mean_luma", "decode_ok"],
            )

    return fn


def extract_image_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """One vectorized decode pass: (media_id, payload) -> typed features."""
    return media.select("media_id", "payload").mapInPandas(
        image_features_batches(use_real_codec), IMAGE_FEATURES_SCHEMA
    )


def sample_frames_batches(every_n: int = 10):
    """Video frame-sampling stub: emits deterministic per-frame hashes.

    Real implementation replaces the chunking below with an ffmpeg seek;
    the Spark-side contract (1 input row -> N output rows) is the part
    under test.
    """

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                raw = bytes(payload) if payload is not None else b""
                n_frames = max(1, int(duration or 0) // (40 * every_n))
                for i in range(min(n_frames, 32)):
                    chunk = raw[i::max(1, n_frames)]
                    rows.append((media_id, i, hashlib.sha256(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha256"])

    return fn


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        sample_frames_batches(every_n), FRAME_SAMPLE_SCHEMA
    )


def binary_metadata(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Pure-JVM binary metadata: size + magic bytes (no Python)."""
    return df.select(
        F.col(id_col),
        F.octet_length(binary_col).alias("n_bytes"),
        F.substring(F.hex(F.col(binary_col)), 1, 8).alias("magic_hex"),
    )
