"""From-scratch GIF87a/89a codec (stdlib + numpy) — multiframe decode.

Like the PNG (operators/multimodal.py) and baseline-JPEG
(operators/jpeg.py) codecs, this exists because no image library ships
in this environment: the spec is public (CompuServe GIF89a, 1990;
LZW per Welch 1984), and a from-scratch implementation makes the
MULTIFRAME media path real — animated-GIF frame extraction with actual
per-frame delays — instead of a stub. True video (H.264 etc.) remains
honestly out; this is the drop-in point's first real multiframe format.

Decoder: header + logical screen descriptor, global/local color
tables, graphic-control extensions (per-frame delay), full LZW with
variable code width (up to 12 bits) and deferred-clear handling.
Frames are composited over the previous frame at their (left, top)
offset (disposal "none"/"do not dispose" semantics — what our encoder
and typical web GIFs emit), transparent pixels keep the previous screen
content, and interlaced images are de-interlaced (the 8/8/4/2-row pass
order of GIF89a appendix E).

Encoder (for deterministic fixtures): palette-indexed frames, GIF89a
with a graphic-control block per frame. LZW output uses literal codes
only but tracks the decoder's table growth exactly (width bumps, clear
at 4096) so any conforming decoder accepts it.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF89 = b"GIF89a"
_GIF87 = b"GIF87a"


# --------------------------------------------------------------------- LZW

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # bit reader: LSB-first
    bitbuf = 0
    bitcnt = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while n_out < n_pixels:
        while bitcnt < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out[n_out:n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out != n_pixels:
        raise ValueError(f"LZW decoded {n_out} pixels, wanted {n_pixels}")
    return out


def _lzw_encode_literals(indices: np.ndarray, min_code_size: int) -> bytes:
    """Valid LZW stream that emits every pixel as a literal code, while
    mirroring the decoder's table-growth bookkeeping (width bumps after
    the table fills a width, clear before the 12-bit table overflows)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    width = min_code_size + 1
    emit(clear, width)
    table_size = end + 1
    prev_sent = False
    for px in indices.tolist():
        emit(int(px), width)
        # the decoder adds one table entry per code AFTER the first
        # post-clear code
        if prev_sent:
            table_size += 1
            if table_size == (1 << width) and width < 12:
                width += 1
            elif table_size >= 4095:    # keep clear of the 12-bit cap
                emit(clear, width)
                width = min_code_size + 1
                table_size = end + 1
                prev_sent = False
                continue
        prev_sent = True
    emit(end, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# --------------------------------------------------------------------- API

def encode_gif(frames: list[np.ndarray], palette: np.ndarray,
               delays_cs: list[int] | None = None) -> bytes:
    """GIF89a bytes from palette-indexed frames (each HxW uint8 indices
    into ``palette`` of shape (P, 3) uint8, P ≤ 256) with per-frame
    delays in centiseconds."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    p = len(palette)
    if delays_cs is None:
        delays_cs = [10] * len(frames)
    gct_bits = max(1, int(np.ceil(np.log2(max(p, 2)))))
    gct_size = 1 << gct_bits
    out = bytearray(_GIF89)
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    tbl = np.zeros((gct_size, 3), np.uint8)
    tbl[:p] = palette
    out += tbl.tobytes()
    min_code = max(2, gct_bits)
    for fr, delay in zip(frames, delays_cs):
        if fr.shape != (h, w):
            raise ValueError("all frames must share the screen size")
        # graphic control extension: delay, no transparency, disposal=1
        out += b"\x21\xF9" + bytes([4, 0x04]) \
            + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode_literals(fr.reshape(-1), min_code))
    out += b"\x3B"
    return bytes(out)


def decode_gif(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """[(delay_cs, HxWx3 uint8), ...] — every frame composited onto the
    logical screen (frames with offsets draw over the previous frame)."""
    if payload[:6] not in (_GIF87, _GIF89):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 1 << ((flags & 0x07) + 1)
        gct = np.frombuffer(payload[pos:pos + 3 * n], np.uint8) \
            .reshape(n, 3)
        pos += 3 * n
    screen = np.zeros((h, w, 3), np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    delay = 0
    transparent = -1
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:       # trailer
            break
        if b == 0x21:       # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:   # graphic control
                size = payload[pos]
                gflags = payload[pos + 1]
                delay = struct.unpack("<H", payload[pos + 2:pos + 4])[0]
                transparent = payload[pos + 4] if gflags & 0x01 else -1
                pos += size + 1
            while payload[pos] != 0:    # skip (remaining) sub-blocks
                pos += payload[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB",
                                                  payload[pos:pos + 9])
        pos += 9
        lct = gct
        if iflags & 0x80:
            n = 1 << ((iflags & 0x07) + 1)
            lct = np.frombuffer(payload[pos:pos + 3 * n], np.uint8) \
                .reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF image without any color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = _lzw_decode(bytes(data), min_code, fw * fh).reshape(fh, fw)
        if iflags & 0x40:
            # interlaced: rows are stored in 4 passes (8k, 8k+4, 4k+2,
            # 2k+1 — GIF89a appendix E); undo the reordering
            order = np.concatenate([np.arange(0, fh, 8),
                                    np.arange(4, fh, 8),
                                    np.arange(2, fh, 4),
                                    np.arange(1, fh, 2)])
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        region = screen[top:top + fh, left:left + fw]
        rgb = lct[idx]
        if transparent >= 0:
            # transparent pixels keep the previous screen content
            mask = (idx == transparent)[:, :, None]
            rgb = np.where(mask, region, rgb)
        screen[top:top + fh, left:left + fw] = rgb
        frames.append((delay, screen.copy()))
        delay = 0
        transparent = -1
    return frames
