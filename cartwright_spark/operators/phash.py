"""Perceptual-hash image near-duplicate detection (aHash).

Average-hash: box-downsample the image to an 8x8 grid, emit one bit
per cell — 1 iff the cell's brightness exceeds the global mean. Robust
to resizing, mild compression, and small pixel edits, so near-duplicate
images land within a few bits of Hamming distance; the pair search is
the same pigeonhole band join the text SimHash tier uses
(`operators/dedup.py simhash_near_pairs`), reused verbatim.

Integer-exact formulation (no float means): with H, W divisible by 8
every cell has the same pixel count, so

    bit(cell) = 1  iff  64 * cell_sum > total_sum

is exactly the cell-mean > global-mean test in pure int64 arithmetic —
engine, oracle, and test brute force can never diverge by rounding.
Multi-channel images use the channel SUM as brightness (again exact;
proportional to the mean).

Scale shape (the 100 TB audit): hashing is mapInPandas over the media
column — embarrassingly parallel, one pass, no shuffle; each image
reduces to ONE int64 row however large the corpus of binaries is. The
pair search inherits simhash_near_pairs' banding: pairs within
Hamming distance d agree exactly on >= 1 of the nbands disjoint bit
bands (pigeonhole, d < nbands), so candidates come from equi-joins on
(band, band_key) — never an all-pairs comparison.
"""
from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash of a (H, W) or (H, W, C) uint8 raster.
    Requires H % 8 == 0 and W % 8 == 0 (equal-size cells keep the
    mean test integer-exact); raises otherwise. Bit position is
    row-major: pos = cell_y * 8 + cell_x. Returns a SIGNED int64
    (two's complement) so the value drops straight into a Spark
    `long` column."""
    a = np.asarray(img, dtype=np.int64)
    if a.ndim == 3:
        a = a.sum(axis=2)
    if a.ndim != 2:
        raise ValueError("ahash64: expected (H, W) or (H, W, C) raster")
    h, w = a.shape
    if h % 8 or w % 8 or h == 0 or w == 0:
        raise ValueError(f"ahash64: H and W must be positive multiples "
                         f"of 8, got {h}x{w}")
    cells = a.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
    total = int(cells.sum())
    bits = (64 * cells.reshape(-1) > total)
    sig = 0
    for p in np.flatnonzero(bits):
        sig |= 1 << int(p)
    if sig >= 1 << 63:
        sig -= 1 << 64
    return sig


def image_ahash(df: DataFrame, media_col: str = "media",
                id_col: str = "media_id",
                decode: Callable[[bytes], np.ndarray] | None = None,
                ) -> DataFrame:
    """(id, simhash): aHash each binary image in ``df[media_col]``
    through ``decode`` (bytes -> uint8 raster; defaults to the
    from-scratch PNG codec). mapInPandas, map-only — the column is
    named `simhash` so the result feeds simhash_near_pairs directly."""
    if decode is None:
        from cartwright_spark.operators.multimodal import decode_png
        decode = decode_png
    from cartwright_spark.functions.partitioning import fan_out
    dec = decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = np.fromiter(
                (ahash64(dec(bytes(b))) for b in pdf[media_col]),
                dtype=np.int64, count=len(pdf))
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(),
                                "simhash": sigs})

    out_schema = f"id {dict(df.dtypes)[id_col]}, simhash long"
    return fan_out(df.select(id_col, media_col)).mapInPandas(fn, out_schema)


def ahash_near_pairs(hashes: DataFrame, max_hamming: int = 8,
                     band_bits: int = 7) -> DataFrame:
    """(id_a, id_b, hamming) for pairs within ``max_hamming`` bits.
    Delegates to the SimHash pigeonhole band join — requires
    64 // band_bits > max_hamming for completeness (default 9 bands
    of 7 bits versus d = 8)."""
    from cartwright_spark.operators.dedup import simhash_near_pairs
    if 64 // band_bits <= max_hamming:
        raise ValueError("ahash_near_pairs: need more bands than "
                         "max_hamming for pigeonhole completeness")
    return simhash_near_pairs(hashes, max_hamming=max_hamming,
                              band_bits=band_bits)
