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


# ---------------------------------------------------------------------------
# geohash
# ---------------------------------------------------------------------------

def test_geohash_known_vectors(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from cartwright_spark.functions.geohash import geohash_col
    # public vectors: Niemeyer's example + geohash.org spot checks
    vecs = [(57.64911, 10.40744, "u4pruydq"),
            (0.0, 0.0, "s0000000"),
            (-90.0, -180.0, "00000000"),
            (89.99999, 179.99999, "zzzzzzzz")]
    df = spark.createDataFrame(
        pd.DataFrame(vecs, columns=["lat", "lon", "want"]))
    out = df.select("want", geohash_col(F.col("lat"), F.col("lon"), 8)
                    .alias("gh")).toPandas()
    assert (out["gh"] == out["want"]).all()


def test_geohash_prefix_property_and_plan(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from cartwright_spark.functions.geohash import geohash_col
    import numpy as np
    rng = np.random.RandomState(9)
    df = spark.createDataFrame(pd.DataFrame({
        "lat": rng.uniform(-90, 90, 500),
        "lon": rng.uniform(-180, 180, 500)}))
    sel = df.select(
        geohash_col(F.col("lat"), F.col("lon"), 4).alias("g4"),
        geohash_col(F.col("lat"), F.col("lon"), 9).alias("g9"))
    out = sel.toPandas()
    # a shorter geohash is a PREFIX of the longer one (bisection nesting)
    assert (out.apply(lambda r: r["g9"].startswith(r["g4"]), axis=1)).all()
    # pure codegen: no python workers, no shuffle
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Exchange" not in plan


def test_geohash_sql_mirror(spark):
    import duckdb
    import pandas as pd
    import numpy as np
    from pyspark.sql import functions as F
    from cartwright_spark.functions.geohash import geohash_col, geohash_sql
    rng = np.random.RandomState(4)
    pdf = pd.DataFrame({"lat": rng.uniform(-90, 90, 300),
                        "lon": rng.uniform(-180, 180, 300)})
    df = spark.createDataFrame(pdf)
    got = df.select(geohash_col(F.col("lat"), F.col("lon"), 7)
                    .alias("gh")).toPandas()["gh"]
    con = duckdb.connect()
    con.register("p", pdf)
    want = con.execute(
        f"SELECT {geohash_sql('lat', 'lon', 7)} AS gh FROM p"
    ).fetchdf()["gh"]
    assert (got.to_numpy() == want.to_numpy()).all()


def _sde_pts(spark, rows):
    return spark.createDataFrame(
        [(g, int(x), int(y)) for g, x, y in rows],
        "grp string, px long, py long")


def test_std_ellipse_axis_aligned(spark):
    """Cross of points (+-4,0),(0,+-2): variances a^2/2, b^2/2, zero
    covariance, axes sqrt(8)/sqrt(2), orientation 2theta = 0."""
    from cartwright_spark.spatial.measures import std_ellipse
    rows = [("g", 4, 0), ("g", -4, 0), ("g", 0, 2), ("g", 0, -2)]
    r = std_ellipse(_sde_pts(spark, rows)).collect()[0]
    assert r.n == 4 and r.cx == 0.0 and r.cy == 0.0
    assert r.var_x == 8.0 and r.var_y == 2.0 and r.cov_xy == 0.0
    assert r.sigma_major == 8.0 ** 0.5 and r.sigma_minor == 2.0 ** 0.5
    assert r.orient_num == 0 and r.orient_den == 96


def test_std_ellipse_degenerate_diagonal(spark):
    """Perfect 45-degree line: minor axis exactly 0, orientation pair
    (positive, 0) -> 2theta = 90 degrees."""
    from cartwright_spark.spatial.measures import std_ellipse
    rows = [("g", i, i) for i in range(4)]
    r = std_ellipse(_sde_pts(spark, rows)).collect()[0]
    assert r.sigma_minor == 0.0
    assert r.cov_xy == 1.25
    assert r.orient_num == 40 and r.orient_den == 0
    assert abs(r.sigma_major - 2.5 ** 0.5) < 1e-12


def test_std_ellipse_numpy_parity_multi_group(spark):
    """200 deterministic points in 3 groups vs numpy population
    covariance eigen-decomposition."""
    import numpy as np
    from cartwright_spark.spatial.measures import std_ellipse
    k = np.arange(200)
    g = (k % 3).astype(str)
    x = (k * 37 % 101).astype(np.int64) - 50
    y = ((k * 61 + k * k * 7) % 97).astype(np.int64) - 48
    df = _sde_pts(spark, list(zip(g, x, y)))
    out = {r.grp: r for r in std_ellipse(df).collect()}
    for grp in "012":
        m = g == grp
        xv, yv = x[m].astype(float), y[m].astype(float)
        cov = np.cov(np.stack([xv, yv]), bias=True)
        lam = np.linalg.eigvalsh(cov)
        r = out[grp]
        assert abs(r.cx - xv.mean()) < 1e-9
        assert abs(r.var_x - cov[0, 0]) < 1e-9
        assert abs(r.cov_xy - cov[0, 1]) < 1e-9
        assert abs(r.sigma_major - np.sqrt(lam[1])) < 1e-9
        assert abs(r.sigma_minor - np.sqrt(lam[0])) < 1e-9


def test_std_ellipse_layout_invariance(spark):
    """Bit-identical doubles regardless of partitioning (integer
    moments are exact; derived ops are IEEE-exact)."""
    from cartwright_spark.spatial.measures import std_ellipse
    rows = [("g", (i * 13) % 40 - 20, (i * 29) % 40 - 20)
            for i in range(50)]
    a = std_ellipse(_sde_pts(spark, rows)).collect()[0]
    b = std_ellipse(_sde_pts(spark, rows).repartition(11)).collect()[0]
    assert tuple(a) == tuple(b)


# ------------------------------------------------------- adaptive tiles

def test_adaptive_tiles_hand_case(spark):
    """5 co-located points force an overflow leaf at z_max; a lone far
    point becomes a coarse z=1 leaf under the above-cap root."""
    from cartwright_spark.spatial.tiles import adaptive_tiles
    rows = [(10.0, 100.0)] * 5 + [(0.0, -100.0)]
    pts = spark.createDataFrame(rows, "lat double, lon double")
    out = adaptive_tiles(pts, z_max=3, cap=2).collect()
    by_n = {r.n_points: r for r in out}
    assert len(out) == 2
    assert by_n[5].z == 3 and by_n[5].overflow
    assert by_n[1].z == 1 and not by_n[1].overflow


def test_adaptive_tiles_root_leaf_when_sparse(spark):
    from cartwright_spark.spatial.tiles import adaptive_tiles
    pts = spark.createDataFrame([(10.0, 100.0), (0.0, -100.0)],
                                "lat double, lon double")
    out = adaptive_tiles(pts, z_max=4, cap=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.z, r.tile_x, r.tile_y, r.n_points, r.overflow) == \
        (0, 0, 0, 2, False)


def test_adaptive_tiles_invariants(spark):
    """Leaves are ancestor-disjoint, cover every point exactly once,
    and respect the cap (except flagged z_max overflow)."""
    from cartwright_spark.spatial.tiles import adaptive_tiles
    rows = [(float((i * 37) % 160 - 80) * 0.9, float((i * 73) % 360 - 180))
            for i in range(500)]
    # a dense hotspot to force deep splits
    rows += [(45.0, 45.0)] * 100
    pts = spark.createDataFrame(rows, "lat double, lon double")
    z_max, cap = 5, 30
    leaves = adaptive_tiles(pts, z_max=z_max, cap=cap).collect()
    assert sum(r.n_points for r in leaves) == len(rows)
    keys = {(r.z, r.tile_x, r.tile_y) for r in leaves}
    for r in leaves:
        if not r.overflow:
            assert r.n_points <= cap
        else:
            assert r.z == z_max and r.n_points > cap
        # no ancestor of a leaf is itself a leaf
        z, tx, ty = r.z, r.tile_x, r.tile_y
        for up in range(1, z + 1):
            assert (z - up, tx >> up, ty >> up) not in keys


# --- compact_cells (hierarchical cell-set compaction) ------------------


def _expand(z, tx, ty, z_max):
    if z == z_max:
        return {(tx, ty)}
    out = set()
    for dx in (0, 1):
        for dy in (0, 1):
            out |= _expand(z + 1, 2 * tx + dx, 2 * ty + dy, z_max)
    return out


def test_compact_full_block_and_lone_cell(spark):
    from cartwright_spark.spatial.tiles import compact_cells
    cells = [(x, y) for x in range(4) for y in range(4)] + [(10, 10)]
    df = spark.createDataFrame(cells, ["tx", "ty"])
    got = sorted(map(tuple, compact_cells(df, 3).collect()))
    assert got == [(1, 0, 0), (3, 10, 10)]


def test_compact_roundtrip_and_ancestor_disjoint(spark):
    import numpy as np
    from cartwright_spark.spatial.tiles import compact_cells
    rng = np.random.default_rng(5)
    pts = {(int(x), int(y)) for x, y in rng.integers(0, 32, (600, 2))}
    df = spark.createDataFrame(sorted(pts), ["tx", "ty"])
    got = [tuple(r) for r in compact_cells(df, 5).collect()]
    back = set()
    for z, tx, ty in got:
        exp = _expand(z, tx, ty, 5)
        assert not back & exp  # output cells never overlap
        back |= exp
    assert back == pts
    # no two output cells ancestor-related (stronger than disjoint
    # expansion, implied by it — assert cell count strictly smaller)
    assert len(got) <= len(pts)


def test_compact_all_the_way_to_root(spark):
    from cartwright_spark.spatial.tiles import compact_cells
    cells = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(cells, ["tx", "ty"])
    got = sorted(map(tuple, compact_cells(df, 2).collect()))
    assert got == [(0, 0, 0)]  # the full z=2 grid is the root


def test_compact_guards(spark):
    import pytest as _pt
    from cartwright_spark.spatial.tiles import compact_cells
    df = spark.createDataFrame([(-1, 0)], ["tx", "ty"])
    with _pt.raises(Exception, match="negative tile coord"):
        compact_cells(df, 3).collect()
    with _pt.raises(ValueError):
        compact_cells(df, 0)
