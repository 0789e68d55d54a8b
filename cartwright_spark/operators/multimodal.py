"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as ``mapInPandas``
batch transforms. The actual codec step is STUBBED (no image/audio libs in
this container): ``decode_image`` raises NotImplementedError unless the
deterministic fake decoder is requested, which derives a small fake raster
from the bytes — so the Spark-side plumbing (schema, partitioning, UDF
signature, Arrow batch shape) is real and fully tested while the codec is a
drop-in replacement point.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image | audio | video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload_sha256", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode image bytes → HxWx3 uint8. REAL CODEC NOT AVAILABLE HERE.

    With fake=True, returns a deterministic 8x8x3 raster derived from the
    payload digest — stable plumbing test double."""
    if not fake:
        raise NotImplementedError(
            "no image codec in this environment; pass fake=True for the "
            "deterministic test decoder or plug a codec in here")
    d = hashlib.sha256(payload).digest()
    arr = np.frombuffer((d * 6)[:8 * 8 * 3], dtype=np.uint8)
    return arr.reshape(8, 8, 3).copy()


def extract_features(media: DataFrame, fake_decode: bool = True,
                     feat_dim: int = 16) -> DataFrame:
    """media table → per-item feature vector via mapInPandas. The feature is
    a deterministic byte-histogram projection of the (fake-)decoded raster —
    the real embedding model slots into `_featurize`."""

    def _featurize(raster: np.ndarray) -> list[float]:
        hist, _ = np.histogram(raster, bins=feat_dim, range=(0, 255))
        total = max(int(hist.sum()), 1)
        return (hist / total).astype(np.float32).tolist()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar batch construction — the only per-item Python is the
        # codec boundary itself (sha256/decode are inherently per-payload);
        # no iterrows row boxing (round-1 hygiene item)
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "payload_sha256": [hashlib.sha256(p).hexdigest()
                                   for p in payloads],
                "n_bytes": np.fromiter((len(p) for p in payloads),
                                       dtype=np.int64, count=len(payloads)),
                "feature": [_featurize(decode_image(p, fake=fake_decode))
                            for p in payloads],
            }, columns=[f.name for f in FEATURE_SCHEMA.fields])

    cols = ["media_id", "kind", "payload", "meta"]
    return media.select(*cols).mapInPandas(fn, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("raster", T.BinaryType(), False),
])


def resize_images(media: DataFrame, width: int = 4, height: int = 4,
                  fake_decode: bool = True) -> DataFrame:
    """Image resize as a mapInPandas batch transform: decode (stub codec,
    same boundary as extract_features) → area-average downsample (real
    numpy kernel — exact for integer scale factors) → raw raster bytes
    out. The Spark-side plumbing (schema, batching, binary columns) is
    production-shaped; swap `decode_image` for a real codec to go live."""

    def _resize(raster: np.ndarray, w: int, h: int) -> np.ndarray:
        H, W, C = raster.shape
        ys = (np.arange(h + 1) * H // h)
        xs = (np.arange(w + 1) * W // w)
        out = np.empty((h, w, C), dtype=np.uint8)
        for i in range(h):
            for j in range(w):
                block = raster[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
                out[i, j] = block.mean(axis=(0, 1)).astype(np.uint8)
        return out

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            rasters = [_resize(decode_image(p, fake=fake_decode),
                               width, height) for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "width": np.full(len(payloads), width, dtype=np.int32),
                "height": np.full(len(payloads), height, dtype=np.int32),
                "raster": [r.tobytes() for r in rasters],
            }, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.where(F.col("kind") == "image") \
        .select("media_id", "kind", "payload").mapInPandas(fn, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame-sampling plan (media_id, frame_ts_ms) — pure exprs; the
    decode of each frame is the stubbed codec step."""
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.col("meta.duration_ms").alias("duration_ms"))
        .where(F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0))
        .select("media_id",
                F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1,
                                     F.lit(every_ms))).alias("frame_ts_ms"))
    )


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    def build(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 5)
                rows.append({
                    "media_id": i, "kind": kind, "payload": payload,
                    "meta": {"mime": f"{kind}/x-fake", "width": 64, "height": 64,
                             "duration_ms": 4000 + 100 * (i % 7)},
                })
            yield pd.DataFrame(rows)
    return spark.range(n).mapInPandas(build, MEDIA_SCHEMA)
