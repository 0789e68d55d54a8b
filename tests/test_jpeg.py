"""From-scratch baseline-JPEG codec (operators/jpeg.py).

Reference parity note: the reference has no multimodal layer at all —
this is engine scope from the build brief (multimodal columns as opaque
binary + real decode where feasible). The codec is spec-driven
(ITU T.81 baseline), not ported from anything.
"""
from __future__ import annotations

import numpy as np
import pytest

from cartwright_spark.operators.jpeg import (QUANT_LUMA, ZIGZAG,
                                             _scaled_quant, decode_jpeg,
                                             encode_jpeg)


def _block_gray(h_blocks: int, w_blocks: int, seed: int = 7) -> np.ndarray:
    """Grayscale RGB image of 8x8-constant EVEN-valued blocks — the
    closed-form exact-round-trip case (DC divides the Q50 luma step 16,
    chroma identically 128, R=G=B keeps the color transform exact)."""
    rng = np.random.default_rng(seed)
    v = (rng.integers(0, 128, (h_blocks, w_blocks)) * 2).astype(np.uint8)
    img = np.repeat(np.repeat(v, 8, 0), 8, 1)
    return np.repeat(img[:, :, None], 3, axis=2)


def test_exact_roundtrip_444_and_420():
    rgb = _block_gray(3, 4)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(rgb, quality=50, subsampling=sub))
        assert np.array_equal(out, rgb), sub


def test_exact_roundtrip_with_restart_markers():
    rgb = _block_gray(4, 6, seed=11)
    enc = encode_jpeg(rgb, quality=50, subsampling="420",
                      restart_interval=1)
    assert b"\xFF\xD0" in enc          # at least one RST0 actually emitted
    assert np.array_equal(decode_jpeg(enc), rgb)
    enc444 = encode_jpeg(rgb, quality=50, subsampling="444",
                         restart_interval=3)
    assert np.array_equal(decode_jpeg(enc444), rgb)


def test_lossy_gradient_error_bounded():
    """Smooth gradients at quality 90 stay within a few code values —
    catches zigzag/dequant/IDCT misalignment (any of which explodes the
    error) without requiring exactness from a lossy format."""
    y, x = np.mgrid[0:40, 0:56]
    grad = np.stack([np.clip(y * 4, 0, 255), np.clip(x * 3, 0, 255),
                     np.clip(120 + y - x, 0, 255)], axis=2).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(grad, quality=90, subsampling="444"))
    err = np.abs(dec.astype(int) - grad.astype(int))
    assert err.max() <= 4
    assert err.mean() <= 1.5


def test_odd_dimensions_cropped():
    img = np.clip(np.mgrid[0:19, 0:13][0] * 7, 0, 255).astype(np.uint8)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    for sub, rst in (("444", 0), ("420", 2)):
        dec = decode_jpeg(encode_jpeg(rgb, quality=85, subsampling=sub,
                                      restart_interval=rst))
        assert dec.shape == (19, 13, 3)
        err = np.abs(dec.astype(int) - rgb.astype(int))
        assert err.max() <= 6


def test_noise_roundtrip_executes_and_bounded():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(noise, quality=50))
    assert dec.shape == noise.shape
    # noise at Q50 is heavily quantized — just require plausibility
    assert np.abs(dec.astype(int) - noise.astype(int)).mean() < 80


def test_progressive_rejected():
    enc = bytearray(encode_jpeg(_block_gray(2, 2), quality=50))
    i = enc.find(b"\xFF\xC0")
    enc[i + 1] = 0xC2                  # SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(enc))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnope")


def test_decode_image_dispatches_jpeg_and_png():
    from cartwright_spark.operators.multimodal import (decode_image,
                                                       encode_png)
    rgb = _block_gray(2, 2)
    assert np.array_equal(decode_image(encode_jpeg(rgb, 50)), rgb)
    assert np.array_equal(decode_image(encode_png(rgb)), rgb)
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WEBP")


def test_zigzag_is_a_permutation_and_quality_scaling():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    q50 = _scaled_quant(QUANT_LUMA, 50)
    assert np.array_equal(q50, QUANT_LUMA)       # Q50 = base tables
    assert (_scaled_quant(QUANT_LUMA, 90) <= q50).all()
    assert (_scaled_quant(QUANT_LUMA, 10) >= q50).all()
    assert _scaled_quant(QUANT_LUMA, 1).max() <= 255
    assert _scaled_quant(QUANT_LUMA, 100).min() >= 1


def test_dht_tables_spec_valid():
    """Encoder Huffman tables: count bytes ≤255, canonical codes leave
    the all-ones code unused at every length (T.81 requirement)."""
    from cartwright_spark.operators.jpeg import (_AC_COUNTS, _AC_ENC,
                                                 _DC_COUNTS, _DC_ENC)
    for counts, enc in ((_DC_COUNTS, _DC_ENC), (_AC_COUNTS, _AC_ENC)):
        assert all(0 <= c <= 255 for c in counts)
        for code, length in enc.values():
            assert code != (1 << length) - 1
            assert code < (1 << length)


def test_jpeg_features_end_to_end_spark(spark):
    """extract_features over real JPEG payloads (fake_decode=False) —
    the executor-side codec boundary on actual bytes."""
    import hashlib

    import pandas as pd

    from cartwright_spark.operators.multimodal import extract_features
    rows = []
    for i in range(12):
        rgb = _block_gray(2, 2, seed=i)
        payload = encode_jpeg(rgb, quality=50,
                              subsampling="420" if i % 2 else "444")
        rows.append({"media_id": i, "kind": "image", "payload": payload,
                     "meta": {"mime": "image/jpeg", "width": 16,
                              "height": 16, "duration_ms": None}})
    media = spark.createDataFrame(pd.DataFrame(rows))
    out = extract_features(media, fake_decode=False).toPandas() \
        .set_index("media_id").sort_index()
    assert len(out) == 12
    for i in range(12):
        rgb = _block_gray(2, 2, seed=i)
        payload = encode_jpeg(rgb, quality=50,
                              subsampling="420" if i % 2 else "444")
        assert out.loc[i, "payload_sha256"] == \
            hashlib.sha256(payload).hexdigest()
        hist, _ = np.histogram(rgb, bins=16, range=(0, 255))
        np.testing.assert_allclose(
            np.asarray(out.loc[i, "feature"]), hist / hist.sum(),
            atol=1e-6)
