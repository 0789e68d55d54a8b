"""Great-circle waypoints — spatial/routes.py."""
import math

import pytest


def _routes(spark, rows):
    return spark.createDataFrame(
        rows, "rid long, lat1 double, lon1 double, "
              "lat2 double, lon2 double")


def test_waypoints_endpoints_and_midpoint(spark):
    from cartwright_spark.spatial.routes import great_circle_waypoints
    # equator run 0E -> 90E: midpoint is 45E, all on the equator
    df = _routes(spark, [(1, 0.0, 0.0, 0.0, 90.0)])
    out = {r.step: r for r in
           great_circle_waypoints(df, k=2).collect()}
    assert out[0].wp_lon == pytest.approx(0.0, abs=1e-9)
    assert out[1].wp_lon == pytest.approx(45.0, abs=1e-9)
    assert out[2].wp_lon == pytest.approx(90.0, abs=1e-9)
    for r in out.values():
        assert r.wp_lat == pytest.approx(0.0, abs=1e-9)


def test_waypoints_meridian_and_frac(spark):
    from cartwright_spark.spatial.routes import great_circle_waypoints
    # meridian 10N -> 50N: waypoints evenly spaced in latitude
    df = _routes(spark, [(1, 10.0, 7.0, 50.0, 7.0)])
    out = sorted(great_circle_waypoints(df, k=4).collect(),
                 key=lambda r: r.step)
    lats = [r.wp_lat for r in out]
    assert lats == pytest.approx([10, 20, 30, 40, 50], abs=1e-9)
    assert [r.frac for r in out] == pytest.approx([0, .25, .5, .75, 1])
    for r in out:
        assert r.wp_lon == pytest.approx(7.0, abs=1e-9)


def test_waypoints_great_circle_not_rhumb(spark):
    from cartwright_spark.spatial.routes import great_circle_waypoints
    # same-latitude pair far apart: the geodesic midpoint bulges
    # poleward of the parallel (this is what separates it from lerp)
    df = _routes(spark, [(1, 45.0, 0.0, 45.0, 90.0)])
    mid = [r for r in great_circle_waypoints(df, k=2).collect()
           if r.step == 1][0]
    assert mid.wp_lat > 45.0 + 5.0
    assert mid.wp_lon == pytest.approx(45.0, abs=1e-9)


def test_waypoints_degenerate_dropped_and_validation(spark):
    from cartwright_spark.spatial.routes import great_circle_waypoints
    df = _routes(spark, [(1, 10.0, 10.0, 10.0, 10.0),
                         (2, 0.0, 0.0, 1.0, 1.0)])
    out = great_circle_waypoints(df, k=3).collect()
    assert {r.rid for r in out} == {2}        # zero-length route gone
    with pytest.raises(ValueError, match="k must"):
        great_circle_waypoints(df, k=0)


def test_waypoints_no_shuffle(spark):
    from cartwright_spark.spatial.routes import great_circle_waypoints
    df = _routes(spark, [(1, 0.0, 0.0, 10.0, 10.0)])
    plan = (great_circle_waypoints(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
