"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via ``mapInPandas`` in Arrow
batches.

The decode step is STUBBED (no image/audio libraries in this
container): ``decoder="fake"`` produces a deterministic pseudo-decode
derived from the bytes' sha256, so the Spark-side plumbing — schema,
batching, partitioning, UDF signatures, output shapes — is real and
tested end-to-end; ``decoder="pil"``/``"libav"`` raise
NotImplementedError until the libraries exist on the cluster.

Scale notes: media rows are fat — the operators deliberately
``select`` only (id, payload) before the Python stage (column pruning
on the binary column is what keeps the Arrow transfer bounded), and
``mapInPandas`` streams batch-by-batch instead of materializing a
whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),      # media-type-dependent
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("feat_dim", IntegerType()),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-decode: sha256-seeded feature vector.
    Stands in for PIL/librosa/libav decode + model feature extraction."""
    h = hashlib.sha256(payload or b"").digest()
    buf = b""
    c = 0
    while len(buf) < 4 * dim:
        buf += hashlib.sha256(h + c.to_bytes(4, "big")).digest()
        c += 1
    raw = np.frombuffer(buf[: 4 * dim], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(
    media: DataFrame,
    dim: int = 64,
    decoder: str = "fake",
    batch_note_col: str | None = None,
) -> DataFrame:
    """media(… payload binary) → (media_id, feature array<float>, feat_dim).

    Real decoders are gated: install the media libs on the cluster and
    implement the branch; the Spark plumbing does not change."""
    if decoder not in ("fake",):
        raise NotImplementedError(
            f"decoder {decoder!r} needs media libraries not present in this "
            "environment; only the deterministic 'fake' decoder is available"
        )

    pruned = media.select("media_id", "payload")

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(x) for x in _fake_decode(p, dim)] for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "feat_dim": dim,
                }
            )

    return pruned.mapInPandas(_proc, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — plumbing-complete, decode stubbed. Output keeps
    the media schema with updated dims and a re-encoded payload (fake:
    truncated/padded sha-stream standing in for the resized encoding)."""
    pruned = media.select("media_id", "kind", "mime", "payload")

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = [
                bytes(_fake_decode(p, (width * height) // 4).tobytes())
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                    "duration_ms": 0,
                    "payload": out_payload,
                }
            )

    return pruned.mapInPandas(_proc, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — emits one pseudo-frame row per sampled
    timestamp (UDTF-shaped: one input row → many output rows)."""
    pruned = media.select("media_id", "duration_ms", "payload")
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_ms", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, times, frames = [], [], []
            for mid, dur, p in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                for t in range(0, int(dur or 0), every_ms):
                    ids.append(mid)
                    times.append(t)
                    frames.append(
                        hashlib.sha256((p or b"") + t.to_bytes(8, "big")).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_ms": times, "frame": frames}
            )

    return pruned.mapInPandas(_proc, schema)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=256, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64,
                48,
                5000 if kind == "video" else 0,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
