"""From-scratch S2 cell ids, vectorized with numpy.

Implements the public S2 geometry scheme (S2CellId layout: 3 face bits +
60 Hilbert-curve position bits + sentinel lsb; quadratic ST projection) —
no S2 library exists in this environment, so this is written from the
published algorithm description. Used for: coordinate → cell encoding at a
chosen level, parent/child hierarchy, cell centers, and containment ranges
for prefix joins (SURVEY.md §2.3 J6/J7).

All entry points accept numpy arrays and run inside Arrow-batched pandas
UDFs (see `cell_udf`) — no per-row Python in Spark plans.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

_POS_TO_IJ = np.array([
    [0, 1, 3, 2],   # orientation 0: (0,0) (0,1) (1,1) (1,0)
    [0, 2, 3, 1],   # swap
    [3, 2, 0, 1],   # invert
    [3, 1, 0, 2],   # swap | invert
], dtype=np.int64)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)

_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level, i, j, orig_orient, pos, orient):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
        _lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(level, i + (int(r[idx]) >> 1), j + (int(r[idx]) & 1),
                     orig_orient, pos + idx,
                     orient ^ int(_POS_TO_ORIENT[idx]))


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


# ---------------------------------------------------------------------------
# lat/lng ↔ face/uv/st/ij
# ---------------------------------------------------------------------------

def _ll_to_xyz(lat_deg, lon_deg):
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    theta = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    cos_phi = np.cos(phi)
    return np.cos(theta) * cos_phi, np.sin(theta) * cos_phi, np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay,
                    np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2)).astype(np.int64)
    # negative major axis → face + 3
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)
    # u/v per face (S2 face frame convention); errstate: divisions by the
    # non-major axes can hit 0 but those lanes are masked out by `sel`
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    with np.errstate(divide="ignore", invalid="ignore"):
        sel = face == 0
        u[sel] = (y / x)[sel]; v[sel] = (z / x)[sel]
        sel = face == 1
        u[sel] = (-x / y)[sel]; v[sel] = (z / y)[sel]
        sel = face == 2
        u[sel] = (-x / z)[sel]; v[sel] = (-y / z)[sel]
        sel = face == 3
        u[sel] = (z / x)[sel]; v[sel] = (y / x)[sel]
        sel = face == 4
        u[sel] = (z / y)[sel]; v[sel] = (-x / y)[sel]
        sel = face == 5
        u[sel] = (-y / z)[sel]; v[sel] = (-x / z)[sel]
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    x = np.empty_like(u); y = np.empty_like(u); z = np.empty_like(u)
    sel = face == 0
    x[sel], y[sel], z[sel] = 1.0, u[sel], v[sel]
    sel = face == 1
    x[sel], y[sel], z[sel] = -u[sel], 1.0, v[sel]
    sel = face == 2
    x[sel], y[sel], z[sel] = -u[sel], -v[sel], 1.0
    sel = face == 3
    x[sel], y[sel], z[sel] = -1.0, -v[sel], -u[sel]
    sel = face == 4
    x[sel], y[sel], z[sel] = v[sel], -1.0, -u[sel]
    sel = face == 5
    x[sel], y[sel], z[sel] = v[sel], u[sel], -1.0
    return x, y, z


def _uv_to_st(u):
    # quadratic projection (S2's default); errstate: np.where evaluates both
    # branches, so one sqrt sees out-of-domain values that are then discarded
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(1 - 3 * u))


def _st_to_uv(s):
    return np.where(s >= 0.5,
                    (1.0 / 3.0) * (4 * s * s - 1),
                    (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s)))


def _st_to_ij(s):
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


# ---------------------------------------------------------------------------
# Hilbert encode/decode
# ---------------------------------------------------------------------------

def _face_ij_to_pos(face, i, j):
    """60-bit Hilbert position from 30-bit (i, j) on a face — lookup-table
    walk over 4-bit chunks, vectorized."""
    n = np.zeros(len(face), dtype=np.uint64)
    bits = (face & _SWAP).astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        b = bits
        b = b + (((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2))
        b = b + (((j >> (k * _LOOKUP_BITS)) & mask) << 2)
        b = _lookup_pos[b]
        n |= (b >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits = b & (_SWAP | _INVERT)
    return n


def _face_pos_to_ij(face, pos):
    """Inverse walk: 60-bit position → (i, j)."""
    i = np.zeros(len(face), dtype=np.int64)
    j = np.zeros(len(face), dtype=np.int64)
    bits = (face & _SWAP).astype(np.int64)
    nbits = 2 * _LOOKUP_BITS
    for k in range(7, -1, -1):
        b = bits + (((pos >> np.uint64(k * nbits)) & np.uint64((1 << nbits) - 1)).astype(np.int64) << 2)
        b = _lookup_ij[b]
        i += (b >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((b >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits = b & (_SWAP | _INVERT)
    return i, j


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def lsb_for_level(level: int) -> np.uint64:
    return np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))


def latlng_to_cell(lat, lon, level: int):
    """(lat°, lon°) arrays → uint64 S2 cell ids at `level`."""
    x, y, z = _ll_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    pos = _face_ij_to_pos(face, i, j)
    leaf = (face.astype(np.uint64) << np.uint64(60)) | pos
    leaf = (leaf << np.uint64(1)) | np.uint64(1)
    return parent(leaf, level)


def parent(cell_id, level: int):
    """Ancestor at `level` (id & -lsb | lsb)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    new_lsb = lsb_for_level(level)
    neg = (~new_lsb + np.uint64(1))
    return (cell_id & neg) | new_lsb


def cell_level(cell_id):
    """Level from the sentinel lsb position."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    lsb = cell_id & (~cell_id + np.uint64(1))
    lvl = MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2).astype(np.int64)
    return lvl


def cell_to_latlng(cell_id):
    """Approximate cell center (error « cell size at level; exact for leaf)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face = (cell_id >> np.uint64(61)).astype(np.int64)
    pos = (cell_id >> np.uint64(1)) & np.uint64((1 << 60) - 1)
    i, j = _face_pos_to_ij(face, pos)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face, u, v)
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.rad2deg(np.arcsin(z / norm))
    lon = np.rad2deg(np.arctan2(y, x))
    return lat, lon


def range_min_max(cell_id):
    """Leaf-id range covered by each cell: [id - (lsb-1), id + (lsb-1)].
    Containment tests / prefix joins are range checks on int64-sortable ids."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    lsb = cell_id & (~cell_id + np.uint64(1))
    return cell_id - (lsb - np.uint64(1)), cell_id + (lsb - np.uint64(1))


def contains(parent_id, child_id) -> np.ndarray:
    lo, hi = range_min_max(parent_id)
    child_id = np.asarray(child_id, dtype=np.uint64)
    return (child_id >= lo) & (child_id <= hi)


# average edge length of a level-L cell, radians (S2 metric ~ kAvgEdge)
def avg_edge_radians(level: int) -> float:
    return 1.459 * (2.0 ** (-level))


def cell_ij_bounds(cell_id, level: int):
    """(face, i0, j0, size) per cell: the leaf-ij lower corner and side of the
    cell's ij square on its face. Decoding the id's Hilbert position yields a
    leaf inside the cell; masking to the level's granularity gives the corner."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face = (cell_id >> np.uint64(61)).astype(np.int64)
    pos = (cell_id >> np.uint64(1)) & np.uint64((1 << 60) - 1)
    i, j = _face_pos_to_ij(face, pos)
    size = np.int64(1) << np.int64(MAX_LEVEL - level)
    i0 = i & ~(size - 1)
    j0 = j & ~(size - 1)
    return face, i0, j0, size


def cell_bbox_deg(cell_id, level: int, samples_per_edge: int = 12):
    """Conservative lat/lon bbox per cell from its ACTUAL boundary.

    Samples each of the 4 cell edges in (s, t) space, projects to lat/lon,
    takes min/max, and pads by 5% of the extent (covers the tiny chord-vs-arc
    sampling gap by a wide margin). Cells whose boundary longitude span
    exceeds 180° (antimeridian-crossing or pole-containing cells) get the
    full longitude range and a pole-extended latitude bound — over-inclusive,
    never under-inclusive, which is the safe direction for interior tests.

    This replaces the former center ± avg-edge-degrees model, whose longitude
    half-width was wrong by 1/cos(lat) at high latitude (round-1 ADVICE item:
    false 'interior' flags above ~55°N caused silent PIP false positives).

    Returns (la0, la1, lo0, lo1) float64 arrays.
    """
    face, i0, j0, size = cell_ij_bounds(cell_id, level)
    n = len(face)
    f = np.linspace(0.0, 1.0, samples_per_edge)
    one = np.ones_like(f)
    zero = np.zeros_like(f)
    us = np.concatenate([f, one, f[::-1], zero])
    vs = np.concatenate([zero, f, one, f[::-1]])
    m = len(us)
    s = (i0[:, None].astype(np.float64) + us[None, :] * size) / (1 << MAX_LEVEL)
    t = (j0[:, None].astype(np.float64) + vs[None, :] * size) / (1 << MAX_LEVEL)
    u = _st_to_uv(s).ravel()
    v = _st_to_uv(t).ravel()
    fb = np.repeat(face, m)
    x, y, z = _face_uv_to_xyz(fb, u, v)
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.rad2deg(np.arcsin(z / norm)).reshape(n, m)
    lon = np.rad2deg(np.arctan2(y, x)).reshape(n, m)
    la0, la1 = lat.min(axis=1), lat.max(axis=1)
    lo0, lo1 = lon.min(axis=1), lon.max(axis=1)
    pad_la = 0.05 * (la1 - la0) + 1e-9
    pad_lo = 0.05 * (lo1 - lo0) + 1e-9
    la0, la1 = la0 - pad_la, la1 + pad_la
    lo0, lo1 = lo0 - pad_lo, lo1 + pad_lo
    wrap = (lo1 - lo0) > 180.0
    lo0 = np.where(wrap, -180.001, lo0)
    lo1 = np.where(wrap, 180.001, lo1)
    la1 = np.where(wrap & (la1 > 0), 90.0, la1)
    la0 = np.where(wrap & (la0 < 0), -90.0, la0)
    return la0, la1, lo0, lo1
