"""douglas_peucker: reference parity, degenerate chords, cap semantics,
partition invariance."""

import numpy as np
import pytest

from cartwright_spark.spatial.simplify import douglas_peucker


def _ref(points, eps2, max_depth=12):
    """Round-synchronous DP on a sorted [(seq, x, y)] list."""
    kept = {points[0][0], points[-1][0]}
    intervals = [(0, len(points) - 1)] if len(points) > 1 else []
    for _ in range(max_depth):
        nxt = []
        for i, j in intervals:
            if j - i < 2:
                continue
            sx, sy = points[i][1], points[i][2]
            ex, ey = points[j][1], points[j][2]
            dx, dy = ex - sx, ey - sy
            len2 = dx * dx + dy * dy
            best = None
            for k in range(i + 1, j):
                x, y = points[k][1], points[k][2]
                m = ((x - sx) ** 2 + (y - sy) ** 2 if len2 == 0
                     else (dx * (y - sy) - dy * (x - sx)) ** 2)
                key = (m, -points[k][0])
                if best is None or key > best[0]:
                    best = (key, k)
            thr = eps2 if len2 == 0 else eps2 * len2
            if best and best[0][0] > thr:
                k = best[1]
                kept.add(points[k][0])
                nxt += [(i, k), (k, j)]
        intervals = nxt
        if not intervals:
            break
    for i, j in intervals:  # cap: keep unproven points
        kept |= {points[k][0] for k in range(i + 1, j)}
    return kept


def _run(spark, rows, eps2, max_depth=12, nparts=8):
    df = spark.createDataFrame(rows, ["tid", "seq", "x", "y"]) \
        .repartition(nparts)
    return {(r.tid, r.seq) for r in
            douglas_peucker(df, eps2=eps2, max_depth=max_depth).collect()}


def test_line_with_one_spike(spark):
    rows = [(0, s, 10 * s, 0) for s in range(10)]
    rows[5] = (0, 5, 50, 40)  # spike well past eps
    got = _run(spark, rows, eps2=100)
    pts = [(s, x, y) for _, s, x, y in rows]
    # DP keeps the spike AND its shoulder corners (the chords to the
    # spike are slanted, so the flat-line corners exceed eps too)
    want = {(0, s) for s in _ref(pts, 100)}
    assert (0, 5) in got and got == want


def test_flat_wiggle_drops_everything(spark):
    rows = [(0, s, 3 * s, s % 2) for s in range(20)]
    assert _run(spark, rows, eps2=9) == {(0, 0), (0, 19)}


def test_closed_loop_degenerate_chord(spark):
    # first == last coords: len2 = 0 -> point-distance fallback
    rows = [(0, 0, 0, 0), (0, 1, 10, 0), (0, 2, 10, 10), (0, 3, 0, 0)]
    got = _run(spark, rows, eps2=4)
    want = {(0, s) for s in _ref([(0, 0, 0), (1, 10, 0),
                                  (2, 10, 10), (3, 0, 0)], 4)}
    assert got == want and (0, 1) in got and (0, 2) in got


def test_random_reference_parity_and_cap(spark):
    rng = np.random.default_rng(31)
    for max_depth in (2, 12):
        rows, want = [], set()
        for t in range(6):
            n = int(rng.integers(4, 45))
            pts = [(s, int(rng.integers(0, 120)),
                    int(rng.integers(0, 120))) for s in range(n)]
            rows += [(t, s, x, y) for s, x, y in pts]
            want |= {(t, s) for s in _ref(pts, 350, max_depth)}
        for nparts in (1, 16):
            assert _run(spark, rows, 350, max_depth, nparts) == want, \
                (max_depth, nparts)


def test_guards(spark):
    df_rows = [(0, 0, 0, 0)]
    with pytest.raises(ValueError):
        _run(spark, df_rows, eps2=-1)
    with pytest.raises(ValueError):
        _run(spark, df_rows, eps2=1, max_depth=0)
