"""Li et al. stay-point detection (operators/trajectory.py stay_points)."""

from datetime import datetime, timezone

from cartwright_spark.operators.trajectory import stay_points


def _pts(spark, rows):
    # rows: (event_id, user_id, hour, lat, lon)
    data = [(e, u, datetime(2024, 1, 1, tzinfo=timezone.utc)
             .replace(hour=0) .fromtimestamp(h * 3600, tz=timezone.utc),
             la, lo) for e, u, h, la, lo in rows]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, "
              "lat double, lon double")


def _run(spark, rows, **kw):
    out = stay_points(_pts(spark, rows), **kw).collect()
    return sorted([(r.user_id, r.sp_id, r.n_pts, r.anchor_lat,
                    r.anchor_lon) for r in out])


def test_basic_dwell_then_jump(spark):
    # 3 points near the anchor over 3 h, then a far jump
    rows = [(1, 7, 0, 0.0, 0.0), (2, 7, 1, 0.1, 0.0),
            (3, 7, 3, 0.0, 0.2), (4, 7, 4, 50.0, 50.0)]
    got = _run(spark, rows, dist_deg=1.0, min_dwell_s=3 * 3600)
    # stay at anchor (0,0) with 3 points; the jump point alone can't dwell
    assert got == [(7, 1, 3, 0.0, 0.0)]


def test_slow_drift_breaks_anchor_not_sessions(spark):
    # consecutive steps of 0.8 deg: sessions (gap=1.0) would keep ONE
    # segment, but every point escapes the 1-deg ANCHOR disc by step 2
    rows = [(i, 1, i, 0.8 * i, 0.0) for i in range(6)]
    got = _run(spark, rows, dist_deg=1.0, min_dwell_s=2 * 3600)
    assert got == []  # each anchor holds only 2 pts spanning 1 h


def test_anchor_slides_after_failed_dwell(spark):
    # p0 escapes immediately at p1 (no dwell), anchor slides to p1
    # where a real 2-point 2-hour dwell exists
    rows = [(0, 3, 0, 10.0, 10.0), (1, 3, 1, 0.0, 0.0),
            (2, 3, 3, 0.0, 0.5)]
    got = _run(spark, rows, dist_deg=1.0, min_dwell_s=2 * 3600)
    assert got == [(3, 1, 2, 0.0, 0.0)]


def test_dwell_threshold_boundary_inclusive(spark):
    rows = [(0, 5, 0, 0.0, 0.0), (1, 5, 2, 0.1, 0.1)]
    assert _run(spark, rows, dist_deg=1.0, min_dwell_s=2 * 3600) == \
        [(5, 1, 2, 0.0, 0.0)]
    assert _run(spark, rows, dist_deg=1.0,
                min_dwell_s=2 * 3600 + 1) == []


def test_anchor_jump_restarts_at_escape_index(spark):
    # stay A (3 pts), escape to stay B (3 pts): the B anchor must be
    # the escape point itself, and both dwells emit in order
    rows = ([(i, 9, i, 0.0, 0.0) for i in range(3)]
            + [(i, 9, i, 30.0, 30.0) for i in range(3, 6)])
    got = _run(spark, rows, dist_deg=1.0, min_dwell_s=2 * 3600)
    assert got == [(9, 1, 3, 0.0, 0.0), (9, 2, 3, 30.0, 30.0)]


def test_chunked_scan_crosses_block_boundary(spark):
    # 200 in-disc points then an escape: exercises the geometric
    # chunk growth past the first 64-sample block
    rows = ([(i, 2, i, 0.001 * (i % 5), 0.0) for i in range(200)]
            + [(200, 2, 200, 80.0, 0.0)])
    got = _run(spark, rows, dist_deg=1.0, min_dwell_s=3600)
    assert got == [(2, 1, 200, 0.0, 0.0)]


def test_time_ties_break_on_event_id(spark):
    # same timestamp: order by event_id keeps the walk deterministic
    rows = [(2, 4, 0, 0.2, 0.0), (1, 4, 0, 0.0, 0.0),
            (3, 4, 5, 0.0, 0.2)]
    got = _run(spark, rows, dist_deg=1.0, min_dwell_s=3600)
    assert got == [(4, 1, 3, 0.0, 0.0)]
