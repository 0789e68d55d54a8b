"""marching_squares: diamond/saddle hand cases, python reference
parity, closed-loop degree invariant."""

import numpy as np

from cartwright_spark.spatial.contour import CASE_SEGMENTS, marching_squares

_SEGS = {}
for c, s, dx1, dy1, dx2, dy2 in CASE_SEGMENTS:
    _SEGS.setdefault(c, []).append((dx1, dy1, dx2, dy2))


def _ref(cells, level):
    """Same midpoint marching squares, dict-based."""
    vals = {(x, y): v for x, y, v in cells}
    blocks = set()
    for (x, y) in vals:
        blocks |= {(x, y), (x - 1, y), (x - 1, y - 1), (x, y - 1)}
    out = set()
    for bx, by in blocks:
        bits = 0
        for k, (ox, oy) in enumerate(((0, 0), (1, 0), (1, 1), (0, 1))):
            if vals.get((bx + ox, by + oy), level - 1) >= level:
                bits |= 1 << k
        for dx1, dy1, dx2, dy2 in _SEGS.get(bits, []):
            out.add((bx, by, bits, 2 * bx + dx1, 2 * by + dy1,
                     2 * bx + dx2, 2 * by + dy2))
    return out


def _got(spark, cells, level):
    df = spark.createDataFrame(cells, ["x", "y", "v"])
    return {(r.bx, r.by, r.case_id, r.x1, r.y1, r.x2, r.y2)
            for r in marching_squares(df, level=level).collect()}


def test_single_cell_diamond(spark):
    got = _got(spark, [(5, 5, 9)], 5)
    assert got == _ref([(5, 5, 9)], 5)
    assert len(got) == 4


def test_saddle_cases_emit_two_segments(spark):
    # ll+ur inside (case 5 at block (0,0)) and lr+ul (case 10)
    cells5 = [(0, 0, 9), (1, 1, 9)]
    got5 = _got(spark, cells5, 5)
    assert sum(1 for b in got5 if (b[0], b[1]) == (0, 0)) == 2
    assert got5 == _ref(cells5, 5)
    cells10 = [(1, 0, 9), (0, 1, 9)]
    got10 = _got(spark, cells10, 5)
    assert sum(1 for b in got10 if (b[0], b[1]) == (0, 0)) == 2
    assert got10 == _ref(cells10, 5)


def test_random_grid_parity_and_closed_loops(spark):
    rng = np.random.default_rng(19)
    cells = [(int(x), int(y), int(v)) for x, y, v in
             zip(rng.integers(0, 15, 120), rng.integers(0, 15, 120),
                 rng.integers(0, 6, 120))]
    # dedupe cells (keep max v)
    d = {}
    for x, y, v in cells:
        d[(x, y)] = max(d.get((x, y), 0), v)
    cells = [(x, y, v) for (x, y), v in d.items()]
    got = _got(spark, cells, 3)
    assert got == _ref(cells, 3)
    # isolines on a finite grid close: every endpoint has even degree
    deg = {}
    for _, _, _, x1, y1, x2, y2 in got:
        for p in ((x1, y1), (x2, y2)):
            deg[p] = deg.get(p, 0) + 1
    assert all(v % 2 == 0 for v in deg.values())
    assert got  # non-trivial


def test_dissolve_roundtrip_union_of_overlapping_squares(spark):
    # two overlapping squares: rasterize -> distinct mask -> contour
    # must trace the OUTER union boundary only (no interior edges)
    import pyspark.sql.functions as F
    from cartwright_spark.spatial.raster import rasterize_polygons
    polys = spark.createDataFrame(
        [(1, [0, 4, 4, 0], [0, 0, 4, 4]),
         (2, [2, 6, 6, 2], [2, 2, 6, 6])],
        ["poly_id", "xs", "ys"])
    cells = rasterize_polygons(polys)
    mask = (cells.select("gx", "gy").distinct()
            .select(F.col("gx").alias("x"), F.col("gy").alias("y"),
                    F.lit(1).alias("v")))
    segs = marching_squares(mask, level=1).collect()
    # the union mask is the L-union of the two 4x4 squares = 28 cells
    assert cells.select("gx", "gy").distinct().count() == 28
    # exact parity with the python reference on the dissolved mask —
    # interior edges (the squares' overlap region) must NOT appear
    union_cells = [(r.x, r.y, 1) for r in
                   mask.select(F.col("x"), F.col("y")).collect()]
    got = {(r.bx, r.by, r.case_id, r.x1, r.y1, r.x2, r.y2) for r in segs}
    assert got == _ref(union_cells, 1)
    # boundary closes: every endpoint has even degree
    deg = {}
    for r in segs:
        for p in ((r.x1, r.y1), (r.x2, r.y2)):
            deg[p] = deg.get(p, 0) + 1
    assert all(v % 2 == 0 for v in deg.values())
    # and it is the 28-cell L-union's perimeter: 2*(6+6) - overlap
    # notches = 24 unit edges -> 24 non-saddle boundary segments
    assert len(segs) == 24
