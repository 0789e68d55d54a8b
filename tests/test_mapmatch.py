"""Nearest-segment snap join (spatial/mapmatch.py)."""

import numpy as np
import pytest

from cartwright_spark.spatial.mapmatch import snap_to_segments


def _pts(spark, rows):
    return spark.createDataFrame(
        [(i, int(x), int(y)) for i, (x, y) in enumerate(rows)],
        "id long, px long, py long")


def _segs(spark, rows):
    return spark.createDataFrame(
        [(i, int(a), int(b), int(c), int(d))
         for i, (a, b, c, d) in enumerate(rows)],
        "id long, x0 long, y0 long, x1 long, y1 long")


def test_snap_projection_cases(spark):
    """Interior projection, both endpoint clamps, and a degenerate
    (point) segment — dist2 and t checked against hand geometry."""
    segs = _segs(spark, [(0, 0, 10, 0),      # horizontal segment
                         (100, 100, 100, 100)])  # degenerate point
    pts = _pts(spark, [(5, 3),     # interior: dist2=9, t=0.5
                       (14, 3),    # past end: to (10,0) dist2=25, t=1
                       (-4, 3),    # before start: to (0,0) dist2=25, t=0
                       (103, 104)])  # degenerate seg: dist2=9+16, t=0
    out = {r.point_id: r for r in
           snap_to_segments(pts, segs, radius=10).collect()}
    assert out[0].seg_id == 0 and out[0].dist2 == 9.0 and out[0].t == 0.5
    assert out[1].seg_id == 0 and out[1].dist2 == 25.0 and out[1].t == 1.0
    assert out[2].seg_id == 0 and out[2].dist2 == 25.0 and out[2].t == 0.0
    assert out[3].seg_id == 1 and out[3].dist2 == 25.0 and out[3].t == 0.0


def test_snap_radius_gate_is_exact(spark):
    """dist2 == r^2 is kept (<=), one unit beyond is dropped — the gate
    is the integer comparison A <= r^2 * B, no float epsilon."""
    segs = _segs(spark, [(0, 0, 10, 0)])
    pts = _pts(spark, [(5, 5), (5, 6)])  # dist2 = 25 and 36
    out = snap_to_segments(pts, segs, radius=5).collect()
    assert [r.point_id for r in out] == [0]
    assert out[0].dist2 == 25.0


def test_snap_argmin_and_tiebreak(spark):
    """Nearer segment wins; exact ties break to the lower seg_id."""
    segs = _segs(spark, [(0, 4, 10, 4),    # 4 above
                         (0, -2, 10, -2),  # 2 below -> nearer
                         (0, 6, 10, 6)])   # tie partner for point 1
    pts = _pts(spark, [(5, 0),   # dists 16 / 4 / 36 -> seg 1
                       (5, 5)])  # dists 1 / 49 / 1 -> tie 0 vs 2 -> 0
    out = {r.point_id: r for r in
           snap_to_segments(pts, segs, radius=20).collect()}
    assert out[0].seg_id == 1 and out[0].dist2 == 4.0
    assert out[1].seg_id == 0 and out[1].dist2 == 1.0


def test_snap_matches_bruteforce(spark):
    """Random field vs a numpy brute force, with cell != radius both
    ways — candidate generation must never miss the true argmin."""
    rng = np.random.default_rng(7)
    pts = [(int(a), int(b)) for a, b in rng.integers(0, 2000, (300, 2))]
    segs = []
    for _ in range(40):
        x0, y0 = rng.integers(0, 2000, 2)
        dx, dy = rng.integers(-150, 151, 2)
        segs.append((int(x0), int(y0), int(x0 + dx), int(y0 + dy)))

    def brute(radius):
        want = {}
        for i, (px, py) in enumerate(pts):
            best = None
            for j, (x0, y0, x1, y1) in enumerate(segs):
                dd = (x1 - x0) ** 2 + (y1 - y0) ** 2
                wd = (px - x0) * (x1 - x0) + (py - y0) * (y1 - y0)
                if dd == 0 or wd <= 0:
                    a, b = (px - x0) ** 2 + (py - y0) ** 2, 1
                elif wd >= dd:
                    a, b = (px - x1) ** 2 + (py - y1) ** 2, 1
                else:
                    a, b = ((px - x0) ** 2 + (py - y0) ** 2) * dd - wd * wd, dd
                if a > radius * radius * b:
                    continue
                key = (a / b, j)
                if best is None or key < best:
                    best = key
            if best is not None:
                want[i] = best[1]
        return want

    sp = _pts(spark, pts)
    ss = _segs(spark, segs)
    for radius, cell in [(200, None), (200, 120), (60, 500)]:
        got = {r.point_id: r.seg_id for r in
               snap_to_segments(sp, ss, radius=radius, cell=cell).collect()}
        assert got == brute(radius), (radius, cell)


def test_snap_guards(spark):
    segs = _segs(spark, [(0, 0, 1, 0)])
    pts = _pts(spark, [(0, 0)])
    with pytest.raises(ValueError):
        snap_to_segments(pts, segs, radius=0)
    with pytest.raises(ValueError):
        snap_to_segments(pts, segs, radius=40_000)
    with pytest.raises(ValueError):
        snap_to_segments(pts, segs, radius=5, cell=0)
