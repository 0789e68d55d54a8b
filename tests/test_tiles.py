"""Raster↔vector tile assignment (spatial/tiles.py)."""

import numpy as np
import pandas as pd

from cartwright_spark.functions.geodesy import tile_xy_np
from cartwright_spark.spatial.tiles import (
    assign_points_to_polygons_by_tile,
    polygon_tile_cover,
)

POLY = pd.DataFrame([
    {"admin_id": "a", "ring_lat": [10.0, 10.0, 20.0, 20.0],
     "ring_lon": [30.0, 45.0, 45.0, 30.0]},
    {"admin_id": "b", "ring_lat": [-5.0, -5.0, 5.0, 5.0],
     "ring_lon": [-100.0, -90.0, -90.0, -100.0]},
])


def test_polygon_cover_contains_interior_tiles():
    cover = polygon_tile_cover(POLY, zoom=6)
    # every interior sample point's tile must be covered
    rng = np.random.default_rng(8)
    la = rng.uniform(10, 20, 200)
    lo = rng.uniform(30, 45, 200)
    x, y = tile_xy_np(la, lo, 6)
    a_tiles = set(map(tuple, cover[cover.admin_id == "a"][["tile_x", "tile_y"]].values))
    assert all((int(xi), int(yi)) in a_tiles for xi, yi in zip(x, y))


def test_tile_assignment_join(spark):
    rng = np.random.default_rng(9)
    pts = pd.DataFrame({
        "point_id": [f"p{i}" for i in range(500)],
        "lat": rng.uniform(-30, 30, 500),
        "lon": rng.uniform(-120, 60, 500),
    })
    got = assign_points_to_polygons_by_tile(
        spark, spark.createDataFrame(pts), POLY, zoom=6)
    rows = {(r["point_id"], r["admin_id"]) for r in got.collect()}
    # every point strictly inside a polygon bbox must be assigned to it
    inside_a = pts[(pts.lat.between(10, 20)) & (pts.lon.between(30, 45))]
    assert all((f"{p}", "a") in rows for p in inside_a.point_id)
    # points far outside any bbox tile are not assigned
    far = pts[(pts.lat < -20) & (pts.lon > 0)]
    assert not any((f"{p}", aid) in rows for p in far.point_id for aid in ("a", "b"))
