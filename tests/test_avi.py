"""AVI/MJPEG container codec + the real video_frames operator.

Follows the GIF/JPEG test strategy (test_jpeg.py, test_codec_properties):
exact round trips on closed-form rasters, loud failures on torn input,
and the distributed operator value-checked against the local codec.
"""
import struct

import numpy as np
import pytest

from cartwright_spark.operators.avi import (MJpegVideo, decode_avi_mjpeg,
                                            encode_avi_mjpeg,
                                            sample_frame_indices)
from cartwright_spark.operators.jpeg import decode_jpeg, encode_jpeg

H, W = 16, 32


def _frames(seed: int, nf: int = 3) -> tuple[list[bytes], list[int]]:
    """Exact-round-trip JPEG frames (8x8-constant even grayscale blocks
    at quality 50 — the jpeg.py exactness contract) + their pixel sums."""
    by = np.arange(H)[:, None] // 8
    bx = np.arange(W)[None, :] // 8
    out, sums = [], []
    for f in range(nf):
        v = (((seed * 37 + f * 11 + by * 17 + bx * 29) % 128) * 2) \
            .astype(np.uint8)
        rgb = np.repeat(v[:, :, None], 3, axis=2)
        out.append(encode_jpeg(rgb, quality=50, subsampling="420",
                               restart_interval=1))
        sums.append(int(rgb.sum()))
    return out, sums


def test_round_trip_frames_and_timing():
    frames, sums = _frames(7)
    vid = decode_avi_mjpeg(encode_avi_mjpeg(frames, W, H, rate=25, scale=1))
    assert (vid.width, vid.height) == (W, H)
    assert (vid.rate, vid.scale) == (25, 1)
    assert vid.n_frames == 3
    assert [vid.frame_t_ms(i) for i in range(3)] == [0, 40, 80]
    assert vid.duration_ms == 120
    for i, fb in enumerate(vid.frames):
        dec = decode_jpeg(fb)
        assert dec.shape == (H, W, 3)
        assert int(dec.sum()) == sums[i]


def test_rational_fps_timing():
    # 30000/1001 NTSC-style rational: exact integer floor timing
    frames, _ = _frames(3, nf=4)
    vid = decode_avi_mjpeg(
        encode_avi_mjpeg(frames, W, H, rate=30000, scale=1001))
    assert [vid.frame_t_ms(i) for i in range(4)] == [0, 33, 66, 100]


def test_truncated_container_raises():
    frames, _ = _frames(1)
    avi = encode_avi_mjpeg(frames, W, H)
    with pytest.raises(ValueError, match="overruns"):
        decode_avi_mjpeg(avi[:-10])


def test_frame_count_mismatch_raises():
    frames, _ = _frames(2)
    avi = bytearray(encode_avi_mjpeg(frames, W, H))
    # dwLength lives at strh body +32; find strh and bump the count
    i = bytes(avi).index(b"strh") + 8
    (n,) = struct.unpack_from("<I", avi, i + 32)
    struct.pack_into("<I", avi, i + 32, n + 1)
    with pytest.raises(ValueError, match="torn container"):
        decode_avi_mjpeg(bytes(avi))


def test_non_mjpg_handler_raises():
    frames, _ = _frames(4)
    avi = bytearray(encode_avi_mjpeg(frames, W, H))
    i = bytes(avi).index(b"strh") + 8
    avi[i + 4:i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi_mjpeg(bytes(avi))


def test_not_avi_raises():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")


def test_sample_frame_indices_exact():
    frames, _ = _frames(9, nf=6)
    vid = decode_avi_mjpeg(encode_avi_mjpeg(frames, W, H, rate=25, scale=1))
    # 40 ms/frame, 240 ms total: windows at 0,100,200 → frames 0,3,5
    assert sample_frame_indices(vid, 100) == [0, 3, 5]
    assert sample_frame_indices(vid, 40) == [0, 1, 2, 3, 4, 5]
    assert sample_frame_indices(vid, 1000) == [0]
    with pytest.raises(ValueError):
        sample_frame_indices(vid, 0)


def test_sample_never_decodes_unsampled():
    # sampling math is pure container metadata — works even when the
    # unsampled frames would not decode (non-JPEG guard happens per
    # chunk at parse; use a real container and only check index math)
    vid = MJpegVideo(width=8, height=8, rate=1000, scale=1,
                     frames=[b"\xFF\xD8"] * 500)
    assert sample_frame_indices(vid, 100) == [0, 100, 200, 300, 400]


def test_video_frames_operator(spark):
    import pandas as pd
    from cartwright_spark.operators.multimodal import video_frames
    payloads, exp = [], {}
    for mid in range(6):
        frames, sums = _frames(mid)
        payloads.append((mid, encode_avi_mjpeg(frames, W, H,
                                               rate=25, scale=1)))
        for f, s in enumerate(sums):
            exp[(mid, f)] = s
    media = spark.createDataFrame(
        pd.DataFrame(payloads, columns=["media_id", "payload"]))
    rows = video_frames(media).collect()
    assert len(rows) == 18
    for r in rows:
        raster = np.frombuffer(r["raster"], dtype=np.uint8)
        assert (r["width"], r["height"]) == (W, H)
        assert r["t_ms"] == 40 * r["frame"]
        assert int(raster.sum(dtype=np.int64)) == exp[(r["media_id"],
                                                       r["frame"])]


def test_video_frames_sampling(spark):
    import pandas as pd
    from cartwright_spark.operators.multimodal import video_frames
    frames, _ = _frames(11, nf=6)
    media = spark.createDataFrame(pd.DataFrame(
        [(0, encode_avi_mjpeg(frames, W, H, rate=25, scale=1))],
        columns=["media_id", "payload"]))
    got = sorted(r["frame"] for r in video_frames(media, every_ms=100)
                 .collect())
    assert got == [0, 3, 5]


def test_decode_image_routes_avi_first_frame():
    from cartwright_spark.operators.multimodal import decode_image
    frames, sums = _frames(5)
    out = decode_image(encode_avi_mjpeg(frames, W, H))
    assert out.shape == (H, W, 3)
    assert int(out.sum()) == sums[0]
