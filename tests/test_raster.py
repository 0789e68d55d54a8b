"""rasterize_polygons: hand counts, hole parity, independent ray-cast
parity on random rectilinear polygons."""

import numpy as np

from cartwright_spark.spatial.raster import rasterize_polygons


def _inside(px, py, rings):
    """Independent float even-odd ray cast (safe here: small integer
    vertices, half-integer probes -> no representable degeneracy)."""
    k = 0
    for verts in rings:
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                if px < xint:
                    k += 1
    return k % 2 == 1


def _df(spark, polys):
    rows = [(pid, [int(x) for x, _ in ring], [int(y) for _, y in ring])
            for pid, rings in polys.items() for ring in rings]
    return spark.createDataFrame(rows, ["poly_id", "xs", "ys"])


def _got(spark, polys):
    return {(r.poly_id, r.gx, r.gy) for r in
            rasterize_polygons(_df(spark, polys)).collect()}


def test_square_with_hole(spark):
    polys = {1: [[(0, 0), (6, 0), (6, 6), (0, 6)],
                 [(2, 2), (4, 2), (4, 4), (2, 4)]]}
    got = _got(spark, polys)
    want = {(1, x, y) for x in range(6) for y in range(6)
            if not (2 <= x < 4 and 2 <= y < 4)}
    assert got == want  # 36 - 4 hole cells


def test_l_shape_notch_excluded(spark):
    s = 3
    polys = {7: [[(0, 0), (2 * s, 0), (2 * s, s), (s, s),
                  (s, 2 * s), (0, 2 * s)]]}
    got = _got(spark, polys)
    want = {(7, x, y) for x in range(2 * s) for y in range(s)} | \
           {(7, x, y) for x in range(s) for y in range(s, 2 * s)}
    assert got == want


def test_triangle_and_random_rectilinear_parity(spark):
    rng = np.random.default_rng(13)
    polys = {0: [[(0, 0), (9, 0), (0, 9)]]}  # slanted edge
    for pid in range(1, 5):
        # random x-monotone staircase polygon (simple by construction)
        xs = np.sort(rng.choice(np.arange(0, 30), 6, replace=False))
        tops = rng.integers(3, 15, 6)
        ring = [(int(xs[0]), 0)]
        for i in range(6):
            ring.append((int(xs[i]), int(tops[i])))
            nxt = xs[i + 1] if i + 1 < 6 else xs[-1] + 3
            ring.append((int(nxt), int(tops[i])))
        ring.append((int(xs[-1] + 3), 0))
        polys[pid] = [ring]
    got = _got(spark, polys)
    want = set()
    for pid, rings in polys.items():
        fx = [x for ring in rings for x, _ in ring]
        fy = [y for ring in rings for _, y in ring]
        for gx in range(min(fx), max(fx)):
            for gy in range(min(fy), max(fy)):
                if _inside(gx + 0.5, gy + 0.5, rings):
                    want.add((pid, gx, gy))
    assert got == want


def test_degenerate_bbox_dropped(spark):
    polys = {3: [[(5, 0), (5, 9), (5, 4)]]}  # zero-width polygon
    assert _got(spark, polys) == set()


# --- raster_overlay -------------------------------------------------------


def test_raster_overlay_matches_cell_set_intersections(spark):
    from cartwright_spark.spatial.raster import (raster_overlay,
                                                 rasterize_polygons)
    # three overlapping squares + one disjoint, one with a hole
    rows = [
        (1, [0, 10, 10, 0], [0, 0, 10, 10]),
        (2, [5, 15, 15, 5], [5, 5, 15, 15]),
        (3, [8, 12, 12, 8], [0, 0, 20, 20]),
        (4, [100, 105, 105, 100], [100, 100, 105, 105]),   # disjoint
        (5, [0, 20, 20, 0], [0, 0, 20, 20]),               # outer
        (5, [2, 6, 6, 2], [2, 2, 6, 6]),                   # hole ring
    ]
    df = spark.createDataFrame(
        rows, "poly_id long, xs array<bigint>, ys array<bigint>")
    cells = {}
    for r in rasterize_polygons(df).collect():
        cells.setdefault(r.poly_id, set()).add((r.gx, r.gy))
    got = {(r.id_a, r.id_b): (r.inter_area, r.area_a, r.area_b)
           for r in raster_overlay(df).collect()}
    ids = sorted(cells)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(cells[a] & cells[b])
            if inter:
                want[(a, b)] = (inter, len(cells[a]), len(cells[b]))
    assert got == want
    assert (1, 4) not in got                       # disjoint pair absent
    # hole is excluded from polygon 5's area and intersections
    assert got[(1, 5)][0] == len(cells[1] & cells[5])
    assert (2, 2) not in cells[5] and (3, 3) not in cells[5]
