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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, height: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Undo PNG per-scanline filters (types 0-4) → H x stride bytes."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = int(raw[pos]); pos += 1
        line = raw[pos:pos + stride].astype(np.int32)
        pos += stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:              # Up
            cur = (line + prev) % 256
        elif ftype in (1, 3, 4):      # Sub / Average / Paeth need left-scan
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """From-scratch PNG decode (stdlib zlib + numpy): 8-bit grayscale /
    gray+alpha / RGB / RGBA, non-interlaced → HxWx3 uint8 (alpha dropped,
    gray broadcast). Enough PNG to run the multimodal path end-to-end on
    real bytes in this codec-less sandbox; not a general codec (no 16-bit,
    palette, or Adam7)."""
    import struct
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    width = height = None
    bit_depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # incl. CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} interlace={interlace} unsupported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color_type={color_type} unsupported")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    px = _png_unfilter(raw, height, stride, channels) \
        .reshape(height, width, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()


def encode_png(raster: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0, 8-bit RGB) — fixture generator for
    the decoder's round-trip tests."""
    import struct
    import zlib
    h, w, c = raster.shape
    assert c == 3 and raster.dtype == np.uint8

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xffffffff))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scanlines = b"".join(b"\x00" + raster[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines))
            + chunk(b"IEND", b""))


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode image bytes → HxWx3 uint8.

    Real PNG payloads decode via the from-scratch stdlib-zlib decoder
    above; baseline JPEG via operators/jpeg.py (from-scratch Huffman +
    IDCT). Other formats (WebP, progressive JPEG, video) still raise —
    this function is the drop-in point for a codec lib. With fake=True,
    returns a deterministic 8x8x3 raster derived from the payload
    digest — stable plumbing test double."""
    if fake:
        d = hashlib.sha256(payload).digest()
        arr = np.frombuffer((d * 6)[:8 * 8 * 3], dtype=np.uint8)
        return arr.reshape(8, 8, 3).copy()
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xFF\xD8":
        from cartwright_spark.operators.jpeg import decode_jpeg
        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from cartwright_spark.operators.gif import decode_gif
        return decode_gif(payload)[0][1]   # first frame as a still
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from cartwright_spark.operators.avi import decode_avi_mjpeg
        from cartwright_spark.operators.jpeg import decode_jpeg
        return decode_jpeg(decode_avi_mjpeg(payload).frames[0])
    raise NotImplementedError(
        "only PNG, baseline JPEG, GIF, and MJPEG-AVI decode in this "
        "environment (from-scratch decoders); other codecs raise — pass "
        "fake=True for the deterministic test decoder or plug a codec "
        "in here")


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

    from cartwright_spark.functions.partitioning import fan_out
    cols = ["media_id", "kind", "payload", "meta"]
    return fan_out(media.select(*cols)).mapInPandas(fn, FEATURE_SCHEMA)


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

    from cartwright_spark.functions.partitioning import fan_out
    return fan_out(media.where(F.col("kind") == "image")
                   .select("media_id", "kind", "payload")) \
        .mapInPandas(fn, RESIZED_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame", T.IntegerType(), False),
    T.StructField("t_ms", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("raster", T.BinaryType(), False),
])


def video_frames(media: DataFrame, every_ms: int | None = None) -> DataFrame:
    """REAL video frame extraction (operators/avi.py + jpeg.py): each
    MJPEG-AVI payload is container-parsed, its frames JPEG-decoded, and
    one row per (sampled) frame emitted with the EXACT bitstream timing
    (dwScale/dwRate rational from the stream header). `every_ms=None`
    decodes every frame; otherwise one frame per window via
    avi.sample_frame_indices — frame-sample made real, superseding the
    plan-only frame_sample_plan for MJPEG payloads.

    Scale shape: mapInPandas over fan_out'ed binary rows — map-only, no
    shuffle; only the sampled frames are JPEG-decoded (the container
    walk itself never entropy-decodes), so every_ms bounds decode cost
    per video regardless of frame count."""
    from cartwright_spark.operators.avi import (decode_avi_mjpeg,
                                                sample_frame_indices)
    from cartwright_spark.operators.jpeg import decode_jpeg

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].to_numpy(),
                                    pdf["payload"]):
                vid = decode_avi_mjpeg(bytes(payload))
                idxs = (range(vid.n_frames) if every_ms is None
                        else sample_frame_indices(vid, every_ms))
                for i in idxs:
                    raster = decode_jpeg(vid.frames[i])
                    rows.append((int(mid), int(i), vid.frame_t_ms(i),
                                 raster.shape[1], raster.shape[0],
                                 raster.tobytes()))
            yield pd.DataFrame(rows, columns=[
                f.name for f in VIDEO_FRAME_SCHEMA.fields])

    from cartwright_spark.functions.partitioning import fan_out
    return fan_out(media.select("media_id", "payload")) \
        .mapInPandas(fn, VIDEO_FRAME_SCHEMA)


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
