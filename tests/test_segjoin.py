"""Segment-intersection join: brute-force parity, exact boundary
semantics, exactly-once claiming for multi-cell segments, plan shape."""

import numpy as np

from pyspark.sql import functions as F

from cartwright_spark.spatial.segjoin import segment_intersections


def _brute(a_rows, b_rows):
    """Python-int orientation brute force (exact, no floats)."""
    def cross(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)
    hits = set()
    for aid, ax0, ay0, ax1, ay1 in a_rows:
        for bid, bx0, by0, bx1, by1 in b_rows:
            d1 = cross(ax0, ay0, ax1, ay1, bx0, by0)
            d2 = cross(ax0, ay0, ax1, ay1, bx1, by1)
            d3 = cross(bx0, by0, bx1, by1, ax0, ay0)
            d4 = cross(bx0, by0, bx1, by1, ax1, ay1)
            if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
                    and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0):
                hits.add((aid, bid))
    return hits


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, x0 bigint, y0 bigint, x1 bigint, y1 bigint")


def _run(spark, a_rows, b_rows, cell=100):
    out = segment_intersections(_df(spark, a_rows), _df(spark, b_rows),
                                cell=cell).collect()
    pairs = [(r.a_id, r.b_id) for r in out]
    assert len(pairs) == len(set(pairs)), "pair emitted more than once"
    return set(pairs)


def test_random_brute_force_parity(spark):
    rng = np.random.default_rng(11)
    def seg(i):
        x0, y0 = rng.integers(0, 1000, 2)
        dx, dy = rng.integers(-300, 301, 2)
        return (int(i), int(x0), int(y0), int(x0 + dx), int(y0 + dy))
    a = [seg(i) for i in range(120)]
    b = [seg(1000 + i) for i in range(120)]
    got = _run(spark, a, b, cell=100)
    assert got == _brute(a, b)
    assert len(got) > 20  # the fixture actually exercises the predicate


def test_touch_collinear_and_degenerate_excluded(spark):
    a = [
        (1, 0, 0, 10, 0),     # horizontal
        (2, 0, 0, 10, 10),    # diagonal
        (3, 5, 5, 5, 5),      # degenerate point
    ]
    b = [
        (10, 5, 0, 5, 10),    # endpoint of b ON segment 1 -> touch, excluded
        (11, 0, 0, 20, 0),    # collinear overlap with 1 -> excluded
        (12, 5, -5, 5, 5),    # proper crossing of 1 at (5,0)
        (13, 6, 1, 6, -1),    # proper crossing of 1 at (6,0)
    ]
    got = _run(spark, a, b, cell=8)
    assert got == {(1, 12), (1, 13), (2, 10)}
    # (2,10): diagonal crosses the vertical strictly between endpoints
    assert all(p[0] != 3 for p in got)


def test_long_segments_claimed_once(spark):
    # segments spanning ~40 cells each, overlapping in many shared cells
    a = [(1, 0, 50, 4000, 55)]
    b = [(2, 0, 60, 4000, 40)]
    got = _run(spark, a, b, cell=100)
    assert got == {(1, 2)}


def test_plan_has_no_cartesian(spark):
    a = [(1, 0, 0, 10, 10)]
    b = [(2, 0, 10, 10, 0)]
    plan = segment_intersections(
        _df(spark, a), _df(spark, b), cell=100)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
