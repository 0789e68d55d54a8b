"""From-scratch baseline-JPEG codec (stdlib + numpy) — the multimodal
layer's second real image format after the r03 PNG codec.

No codec library ships in this container, so like `multimodal.decode_png`
this implements the format directly: baseline sequential DCT (SOF0),
Huffman entropy coding, 4:4:4 or 4:2:0 chroma subsampling, restart
markers, non-multiple-of-8 dimensions. The decoder is fully table-driven
(quant + Huffman tables are read from the stream's DQT/DHT segments, as
the spec requires), so it decodes any baseline JPEG, not just this
encoder's output. Progressive (SOF2) and arithmetic coding raise
NotImplementedError — honest boundaries, same policy as the PNG codec's
no-Adam7 line.

The encoder is the fixture generator for round-trip tests. It emits
standard Annex-K quantization tables (scaled by the libjpeg quality
formula) but builds its own canonical fixed-length Huffman tables
(4-bit DC / 9-bit AC codes covering every category), writing them into
DHT — valid per the spec, and it keeps the encoder free of the long
Annex-K Huffman listings. JPEG is lossy in general, but an 8x8-aligned
grayscale image whose blocks are constant EVEN values round-trips
EXACTLY at quality 50 (DC = 8*(v-128) divides the luma DC quant step 16,
chroma is identically 128, and R=G=B makes the color transform exact) —
that closed-form case is what the `multimodal_jpeg_decode` contract
query value-checks against a pure-SQL oracle.

Design-for-scale note: the codec runs executor-side inside mapInPandas
batches (see operators/multimodal.py) — per-payload Python is the
inherent codec boundary, never per-pixel-per-row driver work. The
block transforms (FDCT/IDCT) are vectorized over all blocks of a
component with one einsum; only the entropy coder is a per-symbol loop.
"""
from __future__ import annotations

import struct

import numpy as np

# standard JPEG zigzag scan order (flat index into the 8x8 block)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1/K.2 base quantization tables (row-major 8x8)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# orthonormal 8-point DCT-II basis: coeffs = A @ block @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _A[_u, _x] = (np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)) * \
            np.cos((2 * _x + 1) * _u * np.pi / 16)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → per-coefficient divisors."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    """MSB-first bit packer with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """MSB-first reader over an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            byte = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        raw = self.read(size)
        return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


def _build_decode_table(counts: list[int], symbols: list[int]) -> dict:
    """(length, code) → symbol, canonical JPEG code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _fixed_huffman(n_symbols: int, length: int):
    """Canonical table giving symbols 0..n-1 (nearly) uniform code
    lengths. A DHT count byte caps at 255 symbols per length, so any
    overflow symbols spill to length+1 — canonical assignment keeps the
    all-ones code unused (spec requirement) because 2**length > n.
    counts/symbols are the DHT wire form; the encode map is
    symbol → (code, length)."""
    assert (1 << length) > n_symbols
    counts = [0] * 16
    first = min(n_symbols, 255)
    counts[length - 1] = first
    if n_symbols > first:
        counts[length] = n_symbols - first
    symbols = list(range(n_symbols))
    enc = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            enc[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return counts, symbols, enc


_DC_COUNTS, _DC_SYMBOLS, _DC_ENC = _fixed_huffman(12, 4)
_AC_COUNTS, _AC_SYMBOLS, _AC_ENC = _fixed_huffman(256, 9)


def _encode_block(bw: _BitWriter, qcoef: np.ndarray, dc_pred: int) -> int:
    """Huffman-encode one quantized block (zigzag vector), return new DC."""
    dc = int(qcoef[0])
    diff = dc - dc_pred
    s = _category(diff)
    code, length = _DC_ENC[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(qcoef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_ENC[0xF0]      # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = _AC_ENC[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = _AC_ENC[0x00]          # EOB
        bw.write(code, length)
    return dc


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """H*W plane (multiples of 8) → (n, 8, 8) blocks in raster order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _pad_edge(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = img.shape[:2]
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    if ph or pw:
        img = np.pad(img, [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2),
                     mode="edge")
    return img


def encode_jpeg(raster: np.ndarray, quality: int = 50,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """HxWx3 uint8 RGB → baseline JFIF bytes (SOF0, Huffman)."""
    assert raster.ndim == 3 and raster.shape[2] == 3
    assert raster.dtype == np.uint8
    h, w = raster.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = 2 if subsampling == "420" else 1

    rgb = raster.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    mcu = 8 * sub
    y = _pad_edge(y, mcu, mcu)
    cb = _pad_edge(cb, mcu, mcu)
    cr = _pad_edge(cr, mcu, mcu)
    if sub == 2:     # 2x2 box average
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2) \
            .mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2) \
            .mean(axis=(1, 3))

    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    def quantize(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
        blocks = _plane_blocks(plane - 128.0)
        coefs = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)
        q = np.round(coefs / qt).astype(np.int64)
        return q.reshape(-1, 64)[:, ZIGZAG]     # zigzag vectors

    zy, zcb, zcr = quantize(y, qy), quantize(cb, qc), quantize(cr, qc)

    # MCU-ordered interleave: sub==1 → 1 Y + Cb + Cr per MCU;
    # sub==2 → 4 Y (2x2) + Cb + Cr
    mby, mbx = y.shape[0] // mcu, y.shape[1] // mcu
    ybw = y.shape[1] // 8

    out = bytearray(b"\xFF\xD8")                 # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_qy = qy.reshape(64)[ZIGZAG]
    zz_qc = qc.reshape(64)[ZIGZAG]
    seg(0xDB, bytes([0x00]) + bytes(int(v) for v in zz_qy))
    seg(0xDB, bytes([0x01]) + bytes(int(v) for v in zz_qc))
    seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (sub << 4) | sub, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for cls, counts, symbols in ((0x00, _DC_COUNTS, _DC_SYMBOLS),
                                 (0x10, _AC_COUNTS, _AC_SYMBOLS),
                                 (0x01, _DC_COUNTS, _DC_SYMBOLS),
                                 (0x11, _AC_COUNTS, _AC_SYMBOLS)):
        seg(0xC4, bytes([cls]) + bytes(counts) + bytes(symbols))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    bw = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    n_mcu = 0
    for my in range(mby):
        for mx in range(mbx):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                bw.flush()
                out.extend(bw.out)
                out.extend((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0, 0, 0]
            for by in range(sub):
                for bx in range(sub):
                    idx = (my * sub + by) * ybw + (mx * sub + bx)
                    preds[0] = _encode_block(bw, zy[idx], preds[0])
            cbw = cb.shape[1] // 8
            preds[1] = _encode_block(bw, zcb[my * cbw + mx], preds[1])
            preds[2] = _encode_block(bw, zcr[my * cbw + mx], preds[2])
            n_mcu += 1
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xFF\xD9")                      # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → HxWx3 uint8 RGB (grayscale broadcast)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:                       # EOI
            break
        (length,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:                       # DQT (may hold several)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                b += 1
                if pq:                           # 16-bit table
                    vals = np.frombuffer(body[b:b + 128],
                                         dtype=">u2").astype(np.int64)
                    b += 128
                else:
                    vals = np.frombuffer(body[b:b + 64],
                                         dtype=np.uint8).astype(np.int64)
                    b += 64
                qt = np.zeros(64, np.int64)
                qt[ZIGZAG] = vals
                qtables[tq] = qt.reshape(8, 8)
        elif marker == 0xC4:                     # DHT (may hold several)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                counts = list(body[b + 1:b + 17])
                n = sum(counts)
                symbols = list(body[b + 17:b + 17 + n])
                htables[(tc, th)] = _build_decode_table(counts, symbols)
                b += 17 + n
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 (baseline/ext seq)
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xDA:                     # SOS — entropy data follows
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c:3 + 2 * c]
                scan_comps.append({"id": cid, "td": tt >> 4,
                                   "ta": tt & 0x0F})
            # find entropy span: up to next non-RST/non-stuffed marker
            start = pos
            p = pos
            while p + 1 < len(payload):
                if payload[p] == 0xFF and payload[p + 1] not in (0x00,) \
                        and not (0xD0 <= payload[p + 1] <= 0xD7):
                    break
                p += 1 if payload[p] != 0xFF else 2
            scan = {"comps": scan_comps, "data": payload[start:p]}
            pos = p
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mbx = (w + mcu_w - 1) // mcu_w
    mby = (h + mcu_h - 1) // mcu_h

    # entropy segments split at restart markers, each unstuffed
    segments = []
    cur = bytearray()
    data = scan["data"]
    i = 0
    while i < len(data):
        if data[i] == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(data[i])
        i += 1
    segments.append(bytes(cur))

    by_id = {c["id"]: c for c in comps}
    for sc in scan["comps"]:
        c = by_id[sc["id"]]
        c["dc_table"] = htables[(0, sc["td"])]
        c["ac_table"] = htables[(1, sc["ta"])]
    for c in comps:
        bw_c = mbx * c["h"]
        bh_c = mby * c["v"]
        c["coef"] = np.zeros((bh_c * bw_c, 64), dtype=np.int64)
        c["bw"] = bw_c

    n_mcu_total = mbx * mby
    per_seg = restart_interval or n_mcu_total
    mcu_i = 0
    for seg_bytes in segments:
        reader = _BitReader(seg_bytes)
        preds = {c["id"]: 0 for c in comps}
        for _ in range(min(per_seg, n_mcu_total - mcu_i)):
            my, mx = divmod(mcu_i, mbx)
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        vec = np.zeros(64, np.int64)
                        s = _huff_decode(reader, c["dc_table"])
                        diff = reader.receive_extend(s)
                        preds[c["id"]] += diff
                        vec[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, c["ac_table"])
                            if rs == 0x00:       # EOB
                                break
                            if rs == 0xF0:       # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run overflow")
                            vec[k] = reader.receive_extend(rs & 0x0F)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = vec
            mcu_i += 1
    # dequantize + IDCT, vectorized per component
    planes = {}
    for c in comps:
        qt = qtables[c["tq"]]
        blocks = np.zeros((len(c["coef"]), 64), np.float64)
        blocks[:, ZIGZAG] = c["coef"]
        blocks = blocks.reshape(-1, 8, 8) * qt
        spatial = np.einsum("xu,nuv,yv->nxy", _A.T, blocks, _A.T)
        bh_c = mby * c["v"]
        bw_c = c["bw"]
        plane = (spatial.reshape(bh_c, bw_c, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh_c * 8, bw_c * 8)) + 128.0
        # upsample to full MCU-padded resolution, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[c["id"]] = plane[:h, :w]

    if len(comps) == 1:
        y = np.clip(np.round(planes[comps[0]["id"]]), 0, 255) \
            .astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y = planes[comps[0]["id"]]
    cb = planes[comps[1]["id"]] - 128.0
    cr = planes[comps[2]["id"]] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
