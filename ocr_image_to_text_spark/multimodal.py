"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Training-data-pipeline components (build mandate): media payloads travel
as `binary` columns with a typed metadata struct; decode / feature-extract
/ resize / frame-sample run as Arrow-batched pandas UDFs via mapInPandas.

DECODE IS STUBBED: this container ships no image/audio codecs, so
`_decode_*_stub` produce a DETERMINISTIC FAKE decode (seeded from the
payload bytes) with the correct shapes/dtypes. The Spark-side plumbing —
schemas, partitioning, UDF signatures, per-batch memory shaping — is real
and tested; swapping in PIL/ffmpeg is a one-function change per kind
(clearly marked below).

Scale notes: payloads dominate row size, so batches are kept small via a
pre-UDF repartition on media_id and `spark.sql.execution.arrow.
maxRecordsPerBatch`; feature outputs drop the payload column as early as
possible (column pruning works *between* stages, not inside a UDF).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("codec", StringType()),
    ])),
])


def _rng_bytes(seed: bytes, n: int) -> np.ndarray:
    """Deterministic byte stream from a payload (md5 counter mode)."""
    out = np.empty(n, dtype=np.uint8)
    pos = 0
    counter = 0
    while pos < n:
        h = hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        take = min(16, n - pos)
        out[pos:pos + take] = np.frombuffer(h[:take], dtype=np.uint8)
        pos += take
        counter += 1
    return out


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — deterministic fake decode. Real impl: PIL.Image.open(BytesIO)."""
    return _rng_bytes(payload[:64], width * height * 3).reshape(height, width, 3)


def _decode_audio_stub(payload: bytes, duration_ms: int,
                       rate: int = 8000) -> np.ndarray:
    """STUB — deterministic fake PCM. Real impl: soundfile/ffmpeg."""
    n = max(duration_ms * rate // 1000, 1)
    raw = _rng_bytes(payload[:64], n)
    return (raw.astype(np.float32) - 127.5) / 127.5


IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, "
    "mean_r double, mean_g double, mean_b double, phash long"
)


def image_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Decode → per-channel means + 64-bit average-hash ("phash").

    The hash is an 8x8 block-mean threshold signature — the standard
    near-dup key for images, joinable exactly like doc_simhash.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload, meta in zip(b["media_id"], b["payload"], b["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                img = _decode_image_stub(bytes(payload), w, h)
                means = img.reshape(-1, 3).mean(axis=0)
                # 8x8 average hash: crop to multiples of 8, block-mean, threshold
                hh, ww = (h // 8) * 8, (w // 8) * 8
                g = img[:hh, :ww].mean(axis=2)
                blocks = g.reshape(8, hh // 8, 8, ww // 8).mean(axis=(1, 3))
                bits = (blocks > blocks.mean()).astype(np.uint64).flatten()
                unsigned = sum(int(v) << i for i, v in enumerate(bits))
                phash = unsigned - (1 << 64) if unsigned >= (1 << 63) else unsigned
                rows.append((int(mid), w, h, float(means[0]), float(means[1]),
                             float(means[2]), phash))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "mean_r", "mean_g", "mean_b",
                "phash"])

    src = media.filter(F.col("kind") == "image")
    if partitions:
        src = src.repartition(partitions, "media_id")
    return src.mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, payload binary"


def image_resize(media: DataFrame, max_side: int = 256,
                 partitions: int | None = None) -> DataFrame:
    """Ratio-preserving resize cap (analog of src/ocr/nanonets_ocr.py:59-65).

    STUB: emits a deterministic payload for the target dims; real impl
    resamples the decoded array. Dimension math is the real contract.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload, meta in zip(b["media_id"], b["payload"], b["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                out = _decode_image_stub(bytes(payload), nw, nh).tobytes()
                rows.append((int(mid), nw, nh, out))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "payload"])

    src = media.filter(F.col("kind") == "image")
    if partitions:
        src = src.repartition(partitions, "media_id")
    return src.mapInPandas(gen, RESIZE_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_idx int, ts_ms int, frame binary"


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 partitions: int | None = None) -> DataFrame:
    """Sample video frames every `every_ms` — one output row per frame.

    STUB decode; the explode shape (media_id, frame_idx, ts_ms, frame)
    and the per-row fan-out are the real contract.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload, meta in zip(b["media_id"], b["payload"], b["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                dur = int(meta["duration_ms"])
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    frame = _decode_image_stub(
                        bytes(payload) + ts.to_bytes(4, "big"), w, h)
                    rows.append((int(mid), i, ts, frame.tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms",
                                              "frame"])

    src = media.filter(F.col("kind") == "video")
    if partitions:
        src = src.repartition(partitions, "media_id")
    return src.mapInPandas(gen, FRAMES_SCHEMA)


AUDIO_FEATURES_SCHEMA = "media_id long, duration_ms int, rms double, zero_cross long"


def audio_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Decode PCM (stub) → RMS energy + zero-crossing count."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload, meta in zip(b["media_id"], b["payload"], b["meta"]):
                dur = int(meta["duration_ms"])
                pcm = _decode_audio_stub(bytes(payload), dur)
                rms = float(np.sqrt(np.mean(pcm * pcm)))
                zc = int(np.count_nonzero(np.diff(np.signbit(pcm))))
                rows.append((int(mid), dur, rms, zc))
            yield pd.DataFrame(rows, columns=["media_id", "duration_ms", "rms",
                                              "zero_cross"])

    src = media.filter(F.col("kind") == "audio")
    if partitions:
        src = src.repartition(partitions, "media_id")
    return src.mapInPandas(gen, AUDIO_FEATURES_SCHEMA)


def synthetic_media(spark, n: int = 60, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests/benchmarks (no external data)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w = rng.choice([32, 64, 96])
        h = rng.choice([32, 48, 80])
        dur = rng.choice([500, 1500, 3200]) if kind != "image" else 0
        payload = hashlib.md5(f"media:{seed}:{i}".encode()).digest() * 4
        rows.append((i, kind, bytearray(payload),
                     (w, h, dur, "stub")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
