"""Geofence transitions — spatial/geofence.py."""


def _pts(spark, rows):
    return spark.createDataFrame(rows, "entity long, ts int, x long, y long")


def _fences(spark, rows):
    return spark.createDataFrame(rows,
                                 "fence_id int, cx long, cy long, r long")


def test_geofence_enter_exit_sequence(spark):
    from cartwright_spark.spatial.geofence import geofence_transitions
    # walk along x through a circle of radius 2 centered at (5, 0)
    pts = _pts(spark, [(1, t, x, 0) for t, x in
                       enumerate([0, 3, 4, 5, 6, 7, 8, 9])])
    out = sorted(geofence_transitions(
        pts, _fences(spark, [(1, 5, 0, 2)]), order_cols=["ts"]).collect(),
        key=lambda r: r.ts)
    # x=3 at t=1 is exactly r away -> boundary-inclusive enter there
    assert [(r.ts, r.event) for r in out] == [(1, "enter"), (6, "exit")]
    assert out[0].inside == 1 and out[1].inside == 0


def test_geofence_boundary_is_inclusive(spark):
    from cartwright_spark.spatial.geofence import geofence_transitions
    pts = _pts(spark, [(1, 0, 3, 0)])    # exactly r away from (5,0)? no: d=2=r
    out = geofence_transitions(pts, _fences(spark, [(1, 5, 0, 2)]),
                               order_cols=["ts"]).collect()
    assert len(out) == 1 and out[0].event == "enter"


def test_geofence_first_point_inside_is_enter(spark):
    from cartwright_spark.spatial.geofence import geofence_transitions
    pts = _pts(spark, [(1, 0, 5, 0), (1, 1, 5, 1)])
    out = geofence_transitions(pts, _fences(spark, [(1, 5, 0, 3)]),
                               order_cols=["ts"]).collect()
    # single enter at t=0, no event while staying inside
    assert [(r.ts, r.event) for r in out] == [(0, "enter")]


def test_geofence_entity_and_fence_isolation(spark):
    from cartwright_spark.spatial.geofence import geofence_transitions
    pts = _pts(spark, [(1, 0, 0, 0), (1, 1, 5, 0),
                       (2, 0, 5, 0), (2, 1, 0, 0)])
    fences = _fences(spark, [(1, 5, 0, 1), (2, 0, 0, 1)])
    out = geofence_transitions(pts, fences, order_cols=["ts"]).collect()
    evs = {(r.entity, r.fence_id, r.ts): r.event for r in out}
    assert evs[(1, 1, 1)] == "enter"     # e1 enters fence1 at t=1
    assert evs[(1, 2, 1)] == "exit"      # e1 leaves fence2 (started in)
    assert evs[(2, 1, 0)] == "enter" and evs[(2, 1, 1)] == "exit"


def test_geofence_broadcast_plan(spark):
    from cartwright_spark.spatial.geofence import geofence_transitions
    pts = _pts(spark, [(1, 0, 0, 0)])
    plan = (geofence_transitions(pts, _fences(spark, [(1, 0, 0, 1)]),
                                 order_cols=["ts"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
