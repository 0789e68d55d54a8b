"""Zonal statistics — spatial/zonal.py."""
import pytest


def _zones(spark, rows):
    return spark.createDataFrame(
        rows, "zone_id long, lat_min double, lat_max double, "
              "lon_min double, lon_max double")


def _pts(spark, rows):
    return spark.createDataFrame(rows, "lat double, lon double, m long")


def test_zonal_brute_force_parity(spark):
    from cartwright_spark.spatial.zonal import zonal_stats
    pts = [((i * 37 % 1801) / 10.0 - 90.0,
            (i * 73 % 3600) / 10.0 - 180.0, i % 11)
           for i in range(1, 500)]
    zones = [(0, -30.0, 10.0, -50.0, 20.0),
             (1, 0.0, 90.0, 0.0, 180.0),
             (2, 89.0, 90.0, 179.0, 180.0)]   # near-empty corner
    got = {r.zone_id: (r.n, r.m_sum, r.m_min, r.m_max)
           for r in zonal_stats(_pts(spark, pts),
                                _zones(spark, zones)).collect()}
    import collections
    want = collections.defaultdict(lambda: [0, 0, 10 ** 9, -1])
    for lat, lon, m in pts:
        for z, a, b, c, d in zones:
            if a <= lat <= b and c <= lon <= d:
                w = want[z]
                w[0] += 1
                w[1] += m
                w[2] = min(w[2], m)
                w[3] = max(w[3], m)
    assert got == {z: tuple(v) for z, v in want.items()}


def test_zonal_overlapping_zones_count_twice(spark):
    from cartwright_spark.spatial.zonal import zonal_stats
    pts = [(0.0, 0.0, 5)]
    zones = [(0, -1.0, 1.0, -1.0, 1.0), (1, -2.0, 2.0, -2.0, 2.0)]
    out = {r.zone_id: r.n
           for r in zonal_stats(_pts(spark, pts),
                                _zones(spark, zones)).collect()}
    assert out == {0: 1, 1: 1}


def test_zonal_inclusive_bounds_and_mean(spark):
    from cartwright_spark.spatial.zonal import zonal_stats
    pts = [(1.0, 2.0, 4), (3.0, 2.0, 8)]
    zones = [(0, 1.0, 3.0, 2.0, 2.0)]
    r = zonal_stats(_pts(spark, pts), _zones(spark, zones)).collect()[0]
    assert (r.n, r.m_sum, r.m_mean) == (2, 12, 6.0)


def test_zonal_cell_guard(spark):
    from cartwright_spark.spatial.zonal import zonal_stats
    pts = [(0.0, 0.0, 1)]
    zones = [(0, -90.0, 90.0, -180.0, 180.0)]
    with pytest.raises(Exception, match="grid cells"):
        zonal_stats(_pts(spark, pts), _zones(spark, zones),
                    cell_deg=0.01).collect()
    with pytest.raises(ValueError, match="cell_deg"):
        zonal_stats(_pts(spark, pts), _zones(spark, zones), cell_deg=0)
