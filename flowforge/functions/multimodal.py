"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-friendly
batch iteration (mapInPandas), Arrow batch shapes, deterministic fake
feature extraction — while the actual media decode is STUBBED behind
``NotImplementedError`` (no image/audio libraries in this container).
Swap `_decode_image_real` for a Pillow/ffmpeg call on a real cluster; the
engine-side contract (signature, batch shape, schema) does not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),       # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def synth_media(spark, rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload + metadata)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])
    data = []
    for i in range(rows):
        kind = str(kinds[i % 3])
        size = int(rng.integers(64, 4096))
        payload = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        data.append((
            i, kind, payload,
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            int(rng.integers(16, 1920)) if kind != "audio" else None,
            int(rng.integers(16, 1080)) if kind != "audio" else None,
            int(rng.integers(100, 60000)) if kind != "image" else None,
        ))
    return spark.createDataFrame(data, MEDIA_SCHEMA)


def _decode_image_real(payload: bytes):  # pragma: no cover - stub
    raise NotImplementedError(
        "real image decode needs Pillow/libvips (not in this container); "
        "the mapInPandas plumbing below is the real engine-side contract"
    )


def _fake_feature(payload: bytes | None, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector: a
    normalized byte histogram folded to `dim` buckets (vectorized)."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def extract_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Feature extraction over media batches via mapInPandas.

    Batches stream through Arrow; each worker processes a pandas chunk —
    the partitioning/batch shape is exactly what a real decoder would see."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                pdf["payload"].map(_decode_image_real)
            feats = pdf["payload"].map(lambda p: _fake_feature(p).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int32"),
                "feature": feats,
            })

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp.

    Pure Spark (sequence+explode) — the decode of each planned frame is the
    stubbed step; the plan/partitioning layer is real."""
    frames = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )

RESIZED_SCHEMA = ("media_id long, width int, height int, "
                  "payload binary, resized_from string")


def resize_images(df: DataFrame, max_w: int = 256, max_h: int = 256,
                  real_decode: bool = False) -> DataFrame:
    """Aspect-preserving image resize over mapInPandas batches.

    The geometry (target dims from aspect-ratio math) and the Spark plumbing
    are real; the pixel work is the stubbed step — the deterministic fake
    payload is a byte-histogram fingerprint of the source scaled to the
    target pixel count, so downstream size accounting behaves like a real
    thumbnail would."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if real_decode:
                # decoded pixels would feed the resize; the stub raises
                pdf = pdf.assign(payload=pdf["payload"].map(_decode_image_real))
            w = pdf["width"].fillna(max_w).astype("int64").clip(lower=1)
            h = pdf["height"].fillna(max_h).astype("int64").clip(lower=1)
            scale = np.minimum(1.0, np.minimum(max_w / w, max_h / h))
            new_w = np.maximum(1, (w * scale)).astype("int32")
            new_h = np.maximum(1, (h * scale)).astype("int32")
            sizes = (new_w.to_numpy(dtype=np.int64) * new_h.to_numpy(dtype=np.int64) // 64)
            payloads = [
                None if p is None else
                (_fake_feature(p, 64).tobytes() * (int(s) // 256 + 1))[: int(s)]
                for p, s in zip(pdf["payload"], sizes)
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": new_w,
                "height": new_h,
                "payload": payloads,
                # use the fillna'd int dims: Arrow nullable ints surface as
                # float64 in pandas, which would render '1024.0x768.0'
                "resized_from": w.astype("string") + "x" + h.astype("string"),
            })

    return df.mapInPandas(fn, RESIZED_SCHEMA)
