"""aHash perceptual image hashing + Hamming near-dup pairs."""
import numpy as np
import pytest


def _brute_ahash(img):
    a = np.asarray(img, np.int64)
    if a.ndim == 3:
        a = a.sum(axis=2)
    h, w = a.shape
    cells = np.zeros((8, 8), np.int64)
    for cy in range(8):
        for cx in range(8):
            cells[cy, cx] = a[cy * (h // 8):(cy + 1) * (h // 8),
                              cx * (w // 8):(cx + 1) * (w // 8)].sum()
    total = cells.sum()
    sig = 0
    for cy in range(8):
        for cx in range(8):
            if 64 * cells[cy, cx] > total:
                sig |= 1 << (cy * 8 + cx)
    return sig - (1 << 64) if sig >= 1 << 63 else sig


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_ahash64_matches_bruteforce_and_guards():
    from cartwright_spark.operators.phash import ahash64
    rng = np.random.default_rng(5)
    for shape in [(16, 24, 3), (8, 8), (64, 32, 3), (8, 16)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert ahash64(img) == _brute_ahash(img)
    for bad in [(7, 8), (8, 9), (0, 8)]:
        with pytest.raises(ValueError):
            ahash64(np.zeros(bad, np.uint8))


def test_ahash_small_edit_small_distance():
    from cartwright_spark.operators.phash import ahash64
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    h0 = ahash64(img)
    edited = img.copy()
    edited[3, 4] = 255 - edited[3, 4]          # one pixel inverted
    assert _ham(h0, ahash64(edited)) <= 2
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert _ham(h0, ahash64(other)) > 8        # unrelated image is far


def test_image_ahash_png_path_and_pairs(spark):
    """End to end through the real binary-media path: raster ->
    encode_png -> binary -> decode_png -> hash; band-join pairs equal
    the brute-force Hamming relation, and every within-family pair is
    recalled."""
    import pandas as pd

    from cartwright_spark.operators.multimodal import encode_png
    from cartwright_spark.operators.phash import (ahash64, ahash_near_pairs,
                                                  image_ahash)
    rng = np.random.default_rng(11)
    rasters, rows = {}, []
    for fam in range(6):
        base = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        for v in range(3):
            img = base.copy()
            img[v, 2 * v] = 255 - img[v, 2 * v]
            mid = fam * 3 + v
            rasters[mid] = img
            rows.append((mid, bytearray(encode_png(img))))
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {(r.id_a, r.id_b): r.hamming
           for r in ahash_near_pairs(image_ahash(df), max_hamming=8,
                                     band_bits=7).collect()}
    sigs = {m: ahash64(img) for m, img in rasters.items()}
    ids = sorted(sigs)
    want = {(a, b): _ham(sigs[a], sigs[b])
            for i, a in enumerate(ids) for b in ids[i + 1:]
            if _ham(sigs[a], sigs[b]) <= 8}
    assert got == want
    for fam in range(6):                       # family recall
        a, b, c = fam * 3, fam * 3 + 1, fam * 3 + 2
        assert (a, b) in got and (a, c) in got and (b, c) in got


def test_ahash_near_pairs_band_guard(spark):
    from cartwright_spark.operators.phash import ahash_near_pairs
    df = spark.createDataFrame([(1, 0)], "id long, simhash long")
    with pytest.raises(ValueError):
        ahash_near_pairs(df, max_hamming=10, band_bits=8)  # 8 bands <= 10
