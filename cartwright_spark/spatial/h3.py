"""From-scratch H3-style hexagonal hierarchical index (aperture 7 on the
icosahedron), vectorized with numpy.

No H3 library exists in this environment, and bit-compatibility with Uber's
cell ids is not required (SURVEY.md §7.5(1)) — what the engine needs is the
*structure*: an icosahedral, gnomonically-projected, aperture-7 hex grid
with parent/child digits and integer k-ring arithmetic, validated by
invariants (k-ring size 1+3k(k+1), parent stability, locality) and
S2/haversine cross-checks.

Design:
  * 20 icosahedron faces computed from the golden-ratio construction; a
    point maps to the face with max center·point dot product.
  * gnomonic projection to the face tangent plane; hex lattice in axial
    (Eisenstein-integer) coordinates: t = a + b·ω, ω = e^{iπ/3}.
  * aperture 7: child grid = parent grid × (2+ω)   (|2+ω|² = 7)
        down:  (a,b) → (2a−b, a+3b)
        up:    (a,b) → round(((3a+b) + (2b−a)·ω)/7)  (hex cube-rounding)
    digit r = child coord − down(up(coord)) ∈ 7 center+unit offsets.
  * cell id packs (face:5 | a0+16:6 | b0+16:6 | res:4 | 15×3-bit digits)
    into a non-negative int64.

Known deviation from true H3 (documented): cells are unique per *face*
(no global pentagon dedup), so IJK k-rings are face-local; `k_ring_geo`
supplements with geometric re-encoding for face-edge correctness. As in
real H3, children are not strictly contained in parents (aperture-7
approximate containment); parent-by-digit-truncation is exact and stable.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
_SQRT3_2 = np.sqrt(3.0) / 2.0
_OMEGA = complex(0.5, _SQRT3_2)          # e^{i pi/3}
_SIZE0 = 0.35                             # res-0 lattice spacing on the plane

# ---------------------------------------------------------------------------
# icosahedron
# ---------------------------------------------------------------------------

def _icosahedron():
    phi = (1 + np.sqrt(5)) / 2
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts += [(0, a, b), (a, b, 0), (b, 0, a)]
    v = np.array(verts)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # faces: vertex triples at minimal pairwise distance (exactly 20)
    d = np.linalg.norm(v[:, None, :] - v[None, :, :], axis=2)
    edge = d[d > 1e-9].min()
    adj = (np.abs(d - edge) < 1e-9)
    faces = []
    n = len(v)
    for i in range(n):
        for j in range(i + 1, n):
            if not adj[i, j]:
                continue
            for k in range(j + 1, n):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    assert len(faces) == 20
    centers = np.array([(v[i] + v[j] + v[k]) / 3 for i, j, k in faces])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # deterministic per-face tangent basis
    e1 = []
    e2 = []
    for (i, j, k), c in zip(faces, centers):
        t = v[i] - c * (v[i] @ c)
        t /= np.linalg.norm(t)
        e1.append(t)
        e2.append(np.cross(c, t))
    return v, np.array(faces), centers, np.array(e1), np.array(e2)


_VERTS, _FACES, _CENTERS, _E1, _E2 = _icosahedron()


# ---------------------------------------------------------------------------
# axial/Eisenstein arithmetic (integer, vectorized)
# ---------------------------------------------------------------------------

def _down7(a, b):
    return 2 * a - b, a + 3 * b


def _hex_round(fa, fb):
    """Round fractional axial coords to the nearest hex (cube rounding)."""
    x = fa
    z = fb
    y = -x - z
    rx, ry, rz = np.round(x), np.round(y), np.round(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def _up7(a, b):
    fa = (3.0 * a + b) / 7.0
    fb = (2.0 * b - a) / 7.0
    return _hex_round(fa, fb)


# digit vectors: 0=center, 1..6 the unit hex neighbors (fixed order)
_DIGIT_A = np.array([0, 1, 0, -1, -1, 0, 1], dtype=np.int64)
_DIGIT_B = np.array([0, 0, 1, 1, 0, -1, -1], dtype=np.int64)
_DIGIT_INDEX = {(int(da), int(db)): i
                for i, (da, db) in enumerate(zip(_DIGIT_A, _DIGIT_B))}


def _digits_from_coord(a, b, res):
    """coord at `res` → (a0, b0 at res 0, digits array shape (n, res))."""
    n = len(a)
    digits = np.zeros((n, MAX_RES), dtype=np.int64)
    for r in range(res, 0, -1):
        ua, ub = _up7(a, b)
        ca, cb = _down7(ua, ub)
        da, db = a - ca, b - cb
        idx = np.full(n, -1, dtype=np.int64)
        for (va, vb), i in _DIGIT_INDEX.items():
            idx = np.where((da == va) & (db == vb), i, idx)
        # offsets outside the 7 digit vectors (hex-rounding corner case):
        # renormalize by moving the remainder into the digit's neighbor
        bad = idx < 0
        if bad.any():
            # clamp: pick nearest digit vector by axial distance
            dist = (np.abs(da[bad, None] - _DIGIT_A[None, :])
                    + np.abs(db[bad, None] - _DIGIT_B[None, :])
                    + np.abs((da[bad, None] + db[bad, None])
                             - (_DIGIT_A[None, :] + _DIGIT_B[None, :]))) // 2
            idx[bad] = np.argmin(dist, axis=1)
        digits[:, r - 1] = idx
        a, b = ua, ub
    return a, b, digits


def _coord_from_digits(a0, b0, digits, res):
    a, b = a0.copy(), b0.copy()
    for r in range(1, res + 1):
        a, b = _down7(a, b)
        a += _DIGIT_A[digits[:, r - 1]]
        b += _DIGIT_B[digits[:, r - 1]]
    return a, b


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

_B_OFF = 16  # a0/b0 bias (res-0 coords stay within ±4; ±16 is generous)


def _pack(face, a0, b0, res, digits):
    cid = (face.astype(np.int64) << np.int64(58))
    cid |= ((a0 + _B_OFF).astype(np.int64) << np.int64(52))
    cid |= ((b0 + _B_OFF).astype(np.int64) << np.int64(46))
    cid |= (np.int64(res) << np.int64(42))
    acc = np.zeros(len(face), dtype=np.int64)
    for r in range(MAX_RES):
        d = digits[:, r] if r < digits.shape[1] else np.zeros(len(face), np.int64)
        acc |= (d << np.int64(3 * r))
    return cid | acc


def _unpack(cid):
    cid = np.asarray(cid, dtype=np.int64)
    face = (cid >> np.int64(58)) & np.int64(0x1F)
    a0 = ((cid >> np.int64(52)) & np.int64(0x3F)) - _B_OFF
    b0 = ((cid >> np.int64(46)) & np.int64(0x3F)) - _B_OFF
    res = (cid >> np.int64(42)) & np.int64(0xF)
    digits = np.zeros((len(cid), MAX_RES), dtype=np.int64)
    for r in range(MAX_RES):
        digits[:, r] = (cid >> np.int64(3 * r)) & np.int64(0x7)
    return face, a0, b0, res, digits


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _to_xyz(lat, lon):
    phi = np.deg2rad(np.asarray(lat, float))
    lam = np.deg2rad(np.asarray(lon, float))
    cp = np.cos(phi)
    return np.stack([np.cos(lam) * cp, np.sin(lam) * cp, np.sin(phi)], axis=1)


def _plane_coords(xyz, face):
    c = _CENTERS[face]
    scale = np.einsum("ij,ij->i", xyz, c)
    p = xyz / scale[:, None]          # gnomonic
    rel = p - c
    x = np.einsum("ij,ij->i", rel, _E1[face])
    y = np.einsum("ij,ij->i", rel, _E2[face])
    return x, y


def latlng_to_cell(lat, lon, res: int):
    """(lat°, lon°) arrays → int64 hex cell ids at resolution `res` (≤15)."""
    assert 0 <= res <= MAX_RES
    xyz = _to_xyz(lat, lon)
    face = np.argmax(xyz @ _CENTERS.T, axis=1).astype(np.int64)
    x, y = _plane_coords(xyz, face)
    z = (x + 1j * y) / _SIZE0
    w = z * (2 + _OMEGA) ** res       # res-R lattice coordinates (complex)
    fb = w.imag / _SQRT3_2
    fa = w.real - fb * 0.5
    a, b = _hex_round(fa, fb)
    a0, b0, digits = _digits_from_coord(a, b, res)
    return _pack(face, a0, b0, res, digits)


def cell_resolution(cid) -> np.ndarray:
    return _unpack(cid)[3]


def cell_to_coord(cid):
    face, a0, b0, res_arr, digits = _unpack(cid)
    res = int(res_arr[0]) if len(res_arr) else 0
    assert (res_arr == res).all(), "mixed resolutions in one batch"
    a, b = _coord_from_digits(a0, b0, digits, res)
    return face, a, b, res


def cell_to_latlng(cid):
    """Cell center (lat°, lon°)."""
    face, a, b, res = cell_to_coord(cid)
    w = a.astype(np.float64) + b.astype(np.float64) * _OMEGA
    z = w / (2 + _OMEGA) ** res * _SIZE0
    p = (_CENTERS[face]
         + z.real[:, None] * _E1[face]
         + z.imag[:, None] * _E2[face])
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    lat = np.rad2deg(np.arcsin(np.clip(p[:, 2], -1, 1)))
    lon = np.rad2deg(np.arctan2(p[:, 1], p[:, 0]))
    return lat, lon


def parent(cid, parent_res: int):
    """Digit truncation — exact and stable."""
    face, a0, b0, res, digits = _unpack(cid)
    assert (res >= parent_res).all()
    digits[:, parent_res:] = 0
    return _pack(face, a0, b0, parent_res, digits)


def k_ring(cid, k: int):
    """Face-local IJK k-ring: list of arrays (one per input cell) of the
    1+3k(k+1) cells within hex distance k. Exact away from face edges;
    compose with `k_ring_geo` when edge coverage matters."""
    face, a, b, res = cell_to_coord(np.asarray(cid, dtype=np.int64))
    offsets = [(da, db)
               for da in range(-k, k + 1)
               for db in range(max(-k, -da - k), min(k, -da + k) + 1)]
    out = []
    for i in range(len(a)):
        na = np.array([a[i] + da for da, _ in offsets], dtype=np.int64)
        nb = np.array([b[i] + db for _, db in offsets], dtype=np.int64)
        a0, b0, digits = _digits_from_coord(na.copy(), nb.copy(), res)
        f = np.full(len(na), face[i], dtype=np.int64)
        out.append(np.unique(_pack(f, a0, b0, res, digits)))
    return out


def k_ring_geo(cid, k: int):
    """Geometric k-ring: cells of circle samples at radii ≤ k·edge around
    the cell center — crosses face boundaries correctly (superset style).

    Samples are placed with the exact spherical destination formula
    (``geodesy.geodesic_destination``); the earlier planar lat/lon
    offsets drift past ~1000 km, which matters now that the kNN fallback
    grows ring_k geometrically."""
    from cartwright_spark.functions.geodesy import geodesic_destination
    cid = np.asarray(cid, dtype=np.int64)
    res = int(cell_resolution(cid)[0])
    clat, clon = cell_to_latlng(cid)
    edge_rad = edge_length_radians(res)
    cells = [cid]
    for ring in range(1, k + 1):
        r = min(ring * edge_rad * np.sqrt(3), np.pi)  # hex center spacing
        nsamp = max(6, 6 * ring * 2)
        for t in np.linspace(0, 2 * np.pi, nsamp, endpoint=False):
            sl, so = geodesic_destination(clat, clon, r, t)
            sl = np.clip(sl, -89.999, 89.999)
            cells.append(latlng_to_cell(sl, so, res))
    stacked = np.stack(cells, axis=1)
    return [np.unique(row) for row in stacked]


def edge_length_radians(res: int) -> float:
    """Approximate hex circumradius at `res` in radians on the sphere."""
    return _SIZE0 / np.sqrt(3.0) / (7 ** (res / 2.0))
