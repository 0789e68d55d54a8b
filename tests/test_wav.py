"""From-scratch RIFF/WAVE PCM codec (operators/wav.py)."""

import struct

import numpy as np
import pytest

from cartwright_spark.operators.wav import (decode_wav, encode_wav,
                                            wav_channel_stats)


def test_roundtrip_16bit_stereo():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32767, size=(1000, 2), dtype=np.int64)
    out, rate = decode_wav(encode_wav(s, 44100, bits=16))
    assert rate == 44100
    np.testing.assert_array_equal(out, s)


def test_roundtrip_8bit_bias_removed():
    s = np.array([[0], [128], [255]], dtype=np.int64)
    out, rate = decode_wav(encode_wav(s, 8000, bits=8))
    assert rate == 8000
    np.testing.assert_array_equal(out[:, 0], [-128, 0, 127])


def test_roundtrip_32bit_mono_odd_length_padded():
    # odd byte count only possible at 8-bit; for 32-bit check large mags
    s = np.array([[-(1 << 31)], [(1 << 31) - 1], [5]], dtype=np.int64)
    out, _ = decode_wav(encode_wav(s, 16000, bits=32))
    np.testing.assert_array_equal(out, s)


def test_8bit_odd_sample_count_pads_riff():
    s = np.array([[1], [2], [3]], dtype=np.int64) + 128
    payload = encode_wav(s, 8000, bits=8)
    assert len(payload) % 2 == 0  # word-aligned container
    out, _ = decode_wav(payload)
    assert out.shape == (3, 1)  # pad byte NOT decoded as a sample


def test_24bit_decode_hand_built():
    # hand-pack two 24-bit LE samples: -2 and 0x123456
    data = b"\xfe\xff\xff" + b"\x56\x34\x12"
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out, _ = decode_wav(payload)
    assert out[:, 0].tolist() == [-2, 0x123456]


def test_unknown_chunks_skipped_and_odd_padding():
    s = np.array([[10], [-10]], dtype=np.int64)
    base = encode_wav(s, 8000, bits=16)
    # splice an odd-sized LIST chunk (padded to even) before fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    spliced = base[:12] + junk + base[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", struct.unpack("<I", base[4:8])[0] + len(junk)) + spliced[8:]
    out, _ = decode_wav(spliced)
    np.testing.assert_array_equal(out, s)


def test_non_pcm_raises():
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 1000, 1, 16)  # MP3 tag
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0))
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="format tag 85"):
        decode_wav(payload)


def test_garbage_raises():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError, match="WAVE"):
        decode_wav(b"RIFF\x04\x00\x00\x00AVI ")


def test_channel_stats_exact():
    s = np.array([[1, 0], [-1, 3], [0, -3], [-1, 0], [2, 0]],
                 dtype=np.int64)
    stats = {c: row for row in wav_channel_stats(s)
             for c in [row[0]]}
    # ch0: [1,-1,0,-1,2] -> sum_sq 7, peak 2, signs 1,-1,-1(held),-1,1 -> 2
    assert stats[0] == (0, 5, 7, 2, 2)
    # ch1: [0,3,-3,0,0] -> sum_sq 18, peak 3, held 0,1,-1,-1,-1 -> 1
    assert stats[1] == (1, 5, 18, 3, 1)


def test_stats_sum_sq_no_overflow_chunking():
    # 3M samples at max 16-bit magnitude: 3e6 * 2^30 ~ 2^51, exact
    s = np.full((3_000_000, 1), -32768, dtype=np.int64)
    (_, n, sq, peak, zc) = wav_channel_stats(s)[0]
    assert (n, sq, peak, zc) == (3_000_000, 3_000_000 * 32768 ** 2, 32768, 0)
