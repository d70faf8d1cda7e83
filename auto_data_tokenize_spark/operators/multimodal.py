"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via ``mapInPandas`` in Arrow
batches.

Decoders come in three tiers:
- ``"wav"`` / ``"bmp"``: REAL decoders for the self-describing
  formats the Python stdlib can parse (RIFF/PCM audio via ``wave``,
  uncompressed 24-bit BI_RGB bitmaps via ``struct``+numpy) — actual
  sample/pixel features, actual nearest-neighbor resize, round-trip
  tested against independently-built payloads.
- ``"fake"``: deterministic sha256 pseudo-decode, so the Spark-side
  plumbing — schema, batching, partitioning, UDF signatures, output
  shapes — stays testable for opaque payloads.
- ``"pil"`` / ``"libav"``: compressed formats (png/jpeg/mp4) raise
  NotImplementedError until the media libraries exist on the cluster;
  the Spark plumbing does not change when they do.

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


# -- real stdlib decoders (WAV / uncompressed BMP) ------------------------


def parse_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/PCM WAV → (sample_rate, mono float64 samples in [-1, 1]).
    Pure stdlib (``wave``): 8/16/32-bit integer PCM; multi-channel
    input is averaged to mono."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch, sampwidth, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sampwidth)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {sampwidth}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sampwidth == 1:  # 8-bit WAV is unsigned
        x = x - 128.0
    x /= float(2 ** (8 * sampwidth - 1))
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return rate, x


def parse_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB bitmap → HxWx3 uint8 RGB array.
    Pure struct/numpy parse of BITMAPFILEHEADER + BITMAPINFOHEADER
    (handles bottom-up and top-down rows, 4-byte row padding)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP is stdlib-decodable (got bpp={bpp},"
            f" compression={comp}); compressed images need the gated decoders"
        )
    stride = (w * 3 + 3) & ~3
    rows = abs(h)
    arr = (
        np.frombuffer(data, np.uint8, count=stride * rows, offset=off)
        .reshape(rows, stride)[:, : w * 3]
        .reshape(rows, w, 3)
    )
    if h > 0:  # bottom-up storage
        arr = arr[::-1]
    return arr[..., ::-1].copy()  # BGR → RGB


def encode_bmp(rgb: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → uncompressed 24-bit bottom-up BMP bytes
    (exact inverse of ``parse_bmp``)."""
    hgt, wid, _ = rgb.shape
    stride = (wid * 3 + 3) & ~3
    body = np.zeros((hgt, stride), dtype=np.uint8)
    body[:, : wid * 3] = rgb[::-1, :, ::-1].reshape(hgt, wid * 3)
    pix = body.tobytes()
    header = (
        b"BM"
        + (14 + 40 + len(pix)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + wid.to_bytes(4, "little")
        + hgt.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pix).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + pix


def _wav_features(data: bytes, dim: int) -> np.ndarray:
    """dim-length RMS envelope over equal sample windows."""
    _, x = parse_wav(data)
    if len(x) == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, len(x), dim + 1).astype(np.int64)
    out = np.empty(dim, dtype=np.float32)
    for i in range(dim):
        seg = x[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out[i] = np.sqrt(np.mean(seg * seg))
    return out


def _bmp_features(data: bytes, dim: int) -> np.ndarray:
    """Grayscale grid flattened to dim values in [0, 1]
    (nearest-neighbor sampled g×g grid, g = ceil(sqrt(dim)))."""
    rgb = parse_bmp(data)
    gray = rgb.astype(np.float64).mean(axis=2) / 255.0
    g = int(np.ceil(np.sqrt(dim)))
    return resize_nearest(gray, g, g).ravel()[:dim].astype(np.float32)


_DECODERS = {
    "fake": _fake_decode,
    "wav": _wav_features,
    "bmp": _bmp_features,
}


def extract_features(
    media: DataFrame,
    dim: int = 64,
    decoder: str = "fake",
    batch_note_col: str | None = None,
) -> DataFrame:
    """media(… payload binary) → (media_id, feature array<float>, feat_dim).

    decoder: "wav"/"bmp" decode real payloads (stdlib formats),
    "fake" pseudo-decodes opaque bytes; compressed formats stay gated
    until the media libs exist on the cluster — the Spark plumbing is
    identical for all of them. Poison payloads (null / truncated /
    wrong format) quarantine as a NULL feature instead of failing the
    stage."""
    if decoder not in _DECODERS:
        raise NotImplementedError(
            f"decoder {decoder!r} needs media libraries not present in this "
            "environment; available: fake (opaque), wav, bmp (stdlib)"
        )
    decode = _DECODERS[decoder]

    pruned = media.select("media_id", "payload")

    def _one(p):
        try:
            return [float(x) for x in decode(bytes(p or b""), dim)]
        except Exception:
            return None

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "feat_dim": dim,
                }
            )

    return pruned.mapInPandas(_proc, FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Parse REAL metadata out of stdlib-decodable payloads: WAV
    sample_rate/n_samples/duration, BMP width/height/mean intensity.
    Unknown formats yield nulls (never fail the batch) — at 100 TB a
    poison payload must quarantine, not kill the stage."""
    pruned = media.select("media_id", "payload")
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("fmt", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("duration_ms", IntegerType()),
            StructField("mean_intensity", FloatType()),
        ]
    )

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p or b"")
                try:
                    if p[:2] == b"BM":
                        rgb = parse_bmp(p)
                        rows.append(
                            (mid, "bmp", rgb.shape[1], rgb.shape[0], None,
                             None, None, float(rgb.mean() / 255.0))
                        )
                        continue
                    if p[:4] == b"RIFF":
                        rate, x = parse_wav(p)
                        rows.append(
                            (mid, "wav", None, None, rate, len(x),
                             int(1000 * len(x) / rate) if rate else None,
                             float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                        )
                        continue
                except Exception:
                    pass
                rows.append((mid, None, None, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return pruned.mapInPandas(_proc, schema)


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an HxWx3 array (pure numpy)."""
    ys = (np.arange(height) * rgb.shape[0] // height).clip(0, rgb.shape[0] - 1)
    xs = (np.arange(width) * rgb.shape[1] // width).clip(0, rgb.shape[1] - 1)
    return rgb[np.ix_(ys, xs)]


def resize_images(
    media: DataFrame, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """Image resize. decoder="bmp": REAL decode → nearest-neighbor
    resample → re-encode (payload round-trips through ``parse_bmp``);
    unparseable/null payloads quarantine as a NULL output payload
    instead of failing the stage. decoder="fake": deterministic
    pseudo-payload for opaque bytes. Output keeps the media schema
    with updated dims."""
    if decoder not in ("fake", "bmp"):
        raise NotImplementedError(
            f"decoder {decoder!r} needs media libraries not present in this "
            "environment; available: fake (opaque), bmp (stdlib)"
        )
    pruned = media.select("media_id", "kind", "mime", "payload")

    def _one(p) -> bytes | None:
        # both branches share the quarantine contract: a NULL payload
        # (or, for bmp, an unparseable one) becomes a NULL output —
        # never a fabricated image, never a failed stage (one poison
        # row must not kill a 100 TB job)
        if p is None or (isinstance(p, float) and p != p):  # None / NaN
            return None
        try:
            if decoder == "bmp":
                return encode_bmp(resize_nearest(parse_bmp(bytes(p)), width, height))
            return bytes(_fake_decode(bytes(p), (width * height) // 4).tobytes())
        except Exception:
            return None

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = [_one(p) for p in pdf["payload"]]
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


def synth_wav(seed: int, ms: int = 50, rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV: a seed-pitched sine burst."""
    import io
    import wave

    t = np.arange(int(rate * ms / 1000)) / rate
    freq = 220.0 + 55.0 * (seed % 12)
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def synth_bmp(seed: int, width: int = 16, height: int = 12) -> bytes:
    """Deterministic 24-bit BMP: a seeded RGB gradient."""
    y, x = np.mgrid[0:height, 0:width]
    rgb = np.stack(
        [
            (x * 255 // max(width - 1, 1)).astype(np.uint8),
            (y * 255 // max(height - 1, 1)).astype(np.uint8),
            np.full((height, width), seed % 256, dtype=np.uint8),
        ],
        axis=2,
    )
    return encode_bmp(rgb)


def synth_real_media(spark, n: int = 30, seed: int = 42) -> DataFrame:
    """Media table whose image/audio payloads are REAL (stdlib-
    decodable BMP/WAV); video stays an opaque container payload."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            payload, w, h, dur = synth_bmp(i), 16, 12, 0
        elif kind == "audio":
            payload, w, h, dur = synth_wav(i), 0, 0, 50
        else:
            payload = bytes(rng.integers(0, 256, size=256, dtype=np.uint8))
            w, h, dur = 0, 0, 5000
        mime = {"image": "image/bmp", "audio": "audio/wav", "video": "video/mp4"}[kind]
        rows.append((i, kind, mime, w, h, dur, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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


# --- image near-duplicates (average-hash) ---------------------------------

AHASH_GRID = 8


def synth_image_pixels(
    media_id: int, width: int = 16, height: int = 12
) -> list:
    """Deterministic pure-Python pixel field for the image-dedup
    fixtures: md5-seeded RGB noise per (id, y, x); ids >= 1000 are
    NEAR-COPIES of id-1000 with a sparse lattice of pixels bumped by
    +8 (every 37th position) — visually identical, a few aHash bits
    apart. Pure ints so the datagen golden and the Spark-side synth
    build bit-identical images on any machine."""
    if media_id >= 1000:
        px = synth_image_pixels(media_id - 1000, width, height)
        for y in range(height):
            for x in range(width):
                if (y * width + x) % 37 == 0:
                    px[y][x] = [(c + 8) % 256 for c in px[y][x]]
        return px
    px = []
    for y in range(height):
        row = []
        for x in range(width):
            h = hashlib.md5(
                f"adt-img:{media_id}:{y}:{x}".encode()
            ).digest()
            row.append([h[0], h[1], h[2]])
        px.append(row)
    return px


def synth_image_corpus(
    spark, n_base: int = 40, n_copies: int = 20,
    width: int = 16, height: int = 12,
) -> DataFrame:
    """Real-BMP image corpus with planted near-duplicates: ids
    0..n_base-1 are independent noise images, ids 1000..1000+n_copies-1
    are perturbed copies of 0..n_copies-1 (``synth_image_pixels``)."""
    ids = list(range(n_base)) + [1000 + i for i in range(n_copies)]
    rows = [
        (
            i,
            encode_bmp(
                np.array(
                    synth_image_pixels(i, width, height), dtype=np.uint8
                )
            ),
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def image_ahash(
    media: DataFrame,
    grid: int = AHASH_GRID,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual average-hash over REAL decoded bitmaps — the image
    arm of corpus dedup (pHash-family; aHash is the DCT-free variant
    computable without media libs). Integer-exact spec, so independent
    implementations agree bit-for-bit (datagen's golden is pure-Python
    loops, this operator is numpy — same 64 bits):

      1. gray = (299·R + 587·G + 114·B) // 1000 per pixel
      2. nearest-sample a grid×grid lattice: src = (t · dim) // grid
      3. mean = sum(lattice) // grid²
      4. bit (grid²-1-k) = 1 iff gray_k > mean (row-major k)

    Poison payloads (null / truncated / non-BMP) quarantine as NULL.
    Scale: payload-pruned projection before mapInPandas, one Arrow
    pass, output is (id, int64) — the 100 TB image corpus reduces to
    8 bytes per image before any join."""
    pruned = media.select(id_col, payload_col)
    bits_n = grid * grid
    if bits_n > 64:
        raise ValueError("grid too large for a 64-bit hash")

    def _one(p):
        try:
            rgb = parse_bmp(bytes(p or b"")).astype(np.int64)
        except Exception:
            return None
        h, w = rgb.shape[:2]
        gray = (
            rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114
        ) // 1000
        ys = (np.arange(grid) * h) // grid
        xs = (np.arange(grid) * w) // grid
        g = gray[np.ix_(ys, xs)]
        m = int(g.sum()) // (grid * grid)
        v = 0
        for b in (g > m).ravel():
            v = (v << 1) | int(b)
        return v - (1 << 64) if v >= (1 << 63) else v

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "ahash": pd.array(
                        [_one(p) for p in pdf[payload_col]],
                        dtype="Int64",
                    ),
                }
            )

    return pruned.mapInPandas(_proc, "media_id long, ahash long")


def image_near_dups(
    hashes: DataFrame,
    max_hamming: int = 8,
    id_col: str = "media_id",
    hash_col: str = "ahash",
) -> DataFrame:
    """All image pairs within ``max_hamming`` aHash bits — exact by the
    pigeonhole block guarantee (max_hamming+1 blocks over the 64-bit
    hash: any pair within the budget collides on at least one block),
    the same completeness argument as ``dedup.simhash_near_dups``.
    Quarantined (NULL-hash) images are excluded. Output (a, b, hamming)
    with a < b. Shuffles: one (block_idx, block_key) candidate join +
    a pair dedupe; the verify is pure JVM bit_count — no all-pairs
    stage, no Python after the hash."""
    n_blocks = int(max_hamming) + 1
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    )
    keys = []
    for i in range(n_blocks):
        lo = i * 64 // n_blocks
        hi = (i + 1) * 64 // n_blocks
        mask = (1 << (hi - lo)) - 1
        keys.append(
            F.struct(
                F.lit(i).alias("_bi"),
                F.expr(f"shiftrightunsigned(_h, {lo}) & {mask}").alias(
                    "_bk"
                ),
            )
        )
    blk = h.select(
        "_id", "_h", F.explode_outer(F.array(*keys)).alias("_b")
    ).select("_id", "_h", F.col("_b._bi").alias("_bi"), F.col("_b._bk").alias("_bk"))
    a = blk.select("_bi", "_bk", F.col("_id").alias("a"), F.col("_h").alias("_ha"))
    b = blk.select("_bi", "_bk", F.col("_id").alias("b"), F.col("_h").alias("_hb"))
    pairs = (
        a.join(b, ["_bi", "_bk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "_ha", "_hb")
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming", F.expr("cast(bit_count(_ha ^ _hb) as int)")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
