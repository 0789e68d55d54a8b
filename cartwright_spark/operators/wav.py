"""From-scratch RIFF/WAVE PCM codec (stdlib + numpy) — the audio
modality.

Like the PNG (operators/multimodal.py), baseline-JPEG
(operators/jpeg.py), GIF (operators/gif.py), and MJPEG-AVI
(operators/avi.py) codecs, this exists because no media library ships
in this environment: the container is public (Microsoft/IBM RIFF WAVE,
1991; PCM per the Multimedia Programming Interface spec), and a
from-scratch implementation makes the AUDIO path of the multimodal
tier real — typed binary column in, decoded sample matrix out —
instead of a stub.

Decoder: RIFF header validation, chunk walk with even-byte padding
(RIFF word alignment), `fmt ` parse (PCM format tag 1 only — the
honest codec boundary; compressed formats raise), 8/16/24/32-bit
little-endian sample widths, channel de-interleave. Unknown chunks
(LIST, fact, cue, bext...) are skipped by size, and the `data` chunk
is trusted only up to its declared length.

Encoder (for deterministic fixtures): canonical 44-byte header +
interleaved little-endian PCM.

Reference parity: jataware/cartwright has no media layer (its scope is
per-column profiling, cartwright/categorize.py); audio lands in the
drop-in point's multimodal tier beside image decode, per the
training-data-pipeline brief. Scale shape: decode is per-row work
inside mapInPandas/Arrow batches — embarrassingly parallel, no
shuffle; stats reduce per (file, channel) locally before any exchange.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1

_WIDTHS = {8: np.uint8, 16: np.int16, 32: np.int32}


def encode_wav(samples: np.ndarray, sample_rate: int,
               bits: int = 16) -> bytes:
    """Encode a (n_samples, n_channels) int array as PCM WAVE bytes.

    8-bit WAVE is unsigned with a 128 bias (per spec); 16/32-bit are
    signed little-endian. Values must already fit the target width.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits not in _WIDTHS:
        raise ValueError(f"unsupported bit width {bits}")
    lo, hi = ((0, 255) if bits == 8 else
              (-(1 << (bits - 1)), (1 << (bits - 1)) - 1))
    if samples.min() < lo or samples.max() > hi:
        raise ValueError(f"samples out of range for {bits}-bit PCM")
    pcm = samples.astype(_WIDTHS[bits]).tobytes()  # C-order = interleaved
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", _PCM, ch, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    if len(pcm) % 2:
        body += b"\x00"  # RIFF word alignment pad (not part of data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAVE bytes -> ((n_samples, n_channels) int64 array,
    sample_rate). 8-bit samples are returned bias-removed (value-128)
    so all widths share a signed, zero-centred scale.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    if payload[8:12] != b"WAVE":
        raise ValueError("RIFF form is not WAVE")
    riff_len = struct.unpack("<I", payload[4:8])[0]
    end = min(len(payload), 8 + riff_len)
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        chunk = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size % 2)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag, ch, rate, _byterate, _block, bits = fmt
    if tag != _PCM:
        raise NotImplementedError(
            f"compressed WAVE format tag {tag} not supported "
            "(PCM-only codec boundary)")
    if bits == 24:
        raw = np.frombuffer(data[:len(data) - len(data) % 3],
                            np.uint8).reshape(-1, 3).astype(np.int64)
        vals = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
    elif bits in _WIDTHS:
        dt = np.dtype(_WIDTHS[bits]).newbyteorder("<")
        width = bits // 8
        vals = np.frombuffer(
            data[:len(data) - len(data) % width], dt).astype(np.int64)
        if bits == 8:
            vals = vals - 128
    else:
        raise ValueError(f"unsupported bit width {bits}")
    n = len(vals) // ch
    return vals[:n * ch].reshape(n, ch), rate


def wav_channel_stats(samples: np.ndarray) -> list[tuple[int, int, int,
                                                         int, int]]:
    """Integer-exact per-channel stats from a decoded sample matrix:
    (channel, n_samples, sum_sq, peak_abs, zero_cross).

    sum_sq is the exact energy (Python-int accumulation via object
    dtype is unnecessary: |s| <= 2^31 so s^2 <= 2^62 and n*2^62 could
    wrap — accumulate in chunks with overflow guard instead).
    zero_cross counts sign CHANGES between consecutive samples,
    zero-valued samples carrying the previous sign (the standard
    hold-last-sign convention).
    """
    out = []
    n, ch = samples.shape
    for c in range(ch):
        v = samples[:, c]
        sq = v * v  # |v| <= 2^31 -> fits int64 per element
        total = 0
        step = 1 << 20
        for off in range(0, n, step):
            total += int(sq[off:off + step].sum())
        peak = int(np.abs(v).max()) if n else 0
        sgn = np.sign(v)
        # hold last nonzero sign through zeros
        nz = sgn != 0
        idx = np.where(nz, np.arange(n), -1)
        np.maximum.accumulate(idx, out=idx)
        held = np.where(idx >= 0, sgn[np.maximum(idx, 0)], 0)
        zc = int(np.count_nonzero((held[1:] != held[:-1])
                                  & (held[1:] != 0) & (held[:-1] != 0)))
        out.append((c, n, total, peak, zc))
    return out
