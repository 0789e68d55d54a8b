"""S2 cell-id invariants (FIXTURES.md F6 'cell invariants')."""

import numpy as np
import pytest

from cartwright_spark.functions.geodesy import haversine_m, tile_xy_np
from cartwright_spark.spatial import s2

rng = np.random.default_rng(99)
LAT = rng.uniform(-89.9, 89.9, 5000)
LON = rng.uniform(-180, 180, 5000)


@pytest.mark.parametrize("level", [2, 6, 10, 14, 18, 24])
def test_encode_levels_and_determinism(level):
    a = s2.latlng_to_cell(LAT, LON, level)
    b = s2.latlng_to_cell(LAT, LON, level)
    assert (a == b).all()
    assert (s2.cell_level(a) == level).all()


@pytest.mark.parametrize("level", [4, 10, 16])
def test_center_roundtrip_within_cell(level):
    cid = s2.latlng_to_cell(LAT, LON, level)
    clat, clon = s2.cell_to_latlng(cid)
    # center re-encodes to the same cell
    assert (s2.latlng_to_cell(clat, clon, level) == cid).all()
    # and lies within ~one avg edge of the point
    d = haversine_m(LAT, LON, clat, clon)
    edge_m = s2.avg_edge_radians(level) * 6371008.8
    assert d.max() < edge_m


@pytest.mark.parametrize("parent_level,child_level", [(5, 9), (8, 20)])
def test_parent_containment(parent_level, child_level):
    child = s2.latlng_to_cell(LAT, LON, child_level)
    par = s2.parent(child, parent_level)
    assert (s2.cell_level(par) == parent_level).all()
    assert s2.contains(par, child).all()
    # parent derived from the point directly is the same cell
    assert (s2.latlng_to_cell(LAT, LON, parent_level) == par).all()


def test_nearby_points_share_cells_far_points_dont():
    lat0, lon0 = 40.0, -70.0
    near = s2.latlng_to_cell(np.array([lat0, lat0 + 1e-7]),
                             np.array([lon0, lon0 + 1e-7]), 12)
    assert near[0] == near[1]
    far = s2.latlng_to_cell(np.array([lat0, -lat0]), np.array([lon0, 100.0]), 4)
    assert far[0] != far[1]


def test_range_disjointness_same_level():
    cid = np.unique(s2.latlng_to_cell(LAT, LON, 8))
    lo, hi = s2.range_min_max(cid)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    assert (hi[:-1] < lo[1:]).all(), "sibling cell ranges must not overlap"


def test_tile_xy_golden():
    # closed-form golden points (slippy-map convention)
    x, y = tile_xy_np(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1)
    x, y = tile_xy_np(np.array([85.0511]), np.array([-180.0]), 2)
    assert (x[0], y[0]) == (0, 0)
    x, y = tile_xy_np(np.array([40.7128]), np.array([-74.0060]), 10)
    assert (x[0], y[0]) == (301, 385)  # NYC z10 tile


def test_jvm_expression_encode_matches_numpy(spark):
    """with_s2_cell (all-JVM staged expressions, incl. the step-skipping
    optimization for coarse levels) is bit-identical to the numpy encoder
    at every level, including poles/antimeridian edges."""
    import pandas as pd

    from cartwright_spark.spatial.udfs import with_s2_cell
    rng = np.random.default_rng(11)
    lat = np.concatenate([rng.uniform(-90, 90, 3000),
                          [0.0, 90.0, -90.0, 89.9999, -89.9999, 0.0]])
    lon = np.concatenate([rng.uniform(-180, 180, 3000),
                          [0.0, 180.0, -180.0, 179.9999, -179.9999, -0.0]])
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon})) \
        .coalesce(4)
    for level in (0, 1, 7, 10, 16, 26, 27, 30):
        got = np.array([r["c"] for r in
                        with_s2_cell(df, "lat", "lon", level, "c")
                        .select("c").collect()])
        want = s2.latlng_to_cell(lat, lon, level).astype(np.int64)
        assert (got == want).all(), f"level {level}"


def test_jvm_expression_encode_plan_is_codegen(spark):
    import pandas as pd

    from cartwright_spark.spatial.udfs import with_s2_cell
    df = spark.createDataFrame(pd.DataFrame({"lat": [1.0], "lon": [2.0]}))
    d = with_s2_cell(df, "lat", "lon", 10, "c").select("c")
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
