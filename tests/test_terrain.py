"""Horn hillshade — spatial/terrain.py."""
import math

import pytest


def _grid(spark, fn, n=5):
    rows = [(x, y, fn(x, y)) for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, "x long, y long, z long")


def test_hillshade_flat_terrain(spark):
    from cartwright_spark.spatial.terrain import hillshade
    out = hillshade(_grid(spark, lambda x, y: 7)).collect()
    # 5x5 grid -> 3x3 interior cells survive the n9 == 9 filter
    assert len(out) == 9
    for r in out:
        assert r.dzdx == 0.0 and r.dzdy == 0.0
        # flat ground: shade = 255*cos(zenith) = 255*cos(45 deg)
        assert r.hillshade == pytest.approx(
            255.0 * math.cos(math.radians(45.0)), rel=1e-12)


def test_hillshade_horn_gradient_east_slope(spark):
    from cartwright_spark.spatial.terrain import hillshade
    # z = 10x: east-facing uphill, dz/dx = 10, dz/dy = 0 exactly
    out = {(r.x, r.y): r
           for r in hillshade(_grid(spark, lambda x, y: 10 * x))
           .collect()}
    r = out[(2, 2)]
    assert r.dzdx == pytest.approx(10.0) and r.dzdy == 0.0
    # north slope via z = 10y
    out2 = {(r.x, r.y): r
            for r in hillshade(_grid(spark, lambda x, y: 10 * y))
            .collect()}
    assert out2[(2, 2)].dzdy == pytest.approx(10.0)
    assert out2[(2, 2)].dzdx == 0.0


def test_hillshade_aspect_lighting(spark):
    from cartwright_spark.spatial.terrain import hillshade
    # default sun from the northwest (315 deg): the NW-facing slope
    # z = 3(x - y) (downhill direction (-1, +1) = NW) is lit head-on,
    # its SE-facing mirror is fully shadowed (clamped to 0)
    nw = {(r.x, r.y): r.hillshade for r in
          hillshade(_grid(spark, lambda x, y: 3 * (x - y))).collect()}
    se = {(r.x, r.y): r.hillshade for r in
          hillshade(_grid(spark, lambda x, y: 3 * (y - x))).collect()}
    flat = 255 * math.cos(math.radians(45))
    assert nw[(2, 2)] > flat > se[(2, 2)] == 0.0
    # head-on: shade = 255*cos(zenith - slope) exactly
    slope = math.atan(math.sqrt(18.0))
    assert nw[(2, 2)] == pytest.approx(
        255 * math.cos(math.radians(45) - slope), rel=1e-9)


def test_hillshade_clamps_at_zero_and_validates(spark):
    from cartwright_spark.spatial.terrain import hillshade
    # a cliff facing directly away from the sun can go negative -> 0
    steep = _grid(spark, lambda x, y: 1000 * (x + y))
    assert all(r.hillshade >= 0.0 for r in hillshade(steep).collect())
    with pytest.raises(ValueError, match="cellsize"):
        hillshade(steep, cellsize=0)


def test_hillshade_single_shuffle(spark):
    from cartwright_spark.spatial.terrain import hillshade
    plan = (hillshade(_grid(spark, lambda x, y: x + y))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan          # scatter-gather, not self-joins
