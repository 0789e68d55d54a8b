"""H3-style hex index invariants (FIXTURES.md F6 'cell invariants')."""

import numpy as np
import pytest

from cartwright_spark.functions.geodesy import haversine_m
from cartwright_spark.spatial import h3

rng = np.random.default_rng(31)
LAT = rng.uniform(-85, 85, 3000)
LON = rng.uniform(-180, 180, 3000)


@pytest.mark.parametrize("res", [0, 3, 6, 9, 12, 15])
def test_encode_determinism_and_resolution(res):
    a = h3.latlng_to_cell(LAT, LON, res)
    assert (h3.latlng_to_cell(LAT, LON, res) == a).all()
    assert (h3.cell_resolution(a) == res).all()


@pytest.mark.parametrize("res", [5, 8, 11])
def test_center_roundtrip_fine_res(res):
    cid = h3.latlng_to_cell(LAT, LON, res)
    clat, clon = h3.cell_to_latlng(cid)
    # fine resolutions: centers re-encode to the same cell...
    assert (h3.latlng_to_cell(clat, clon, res) == cid).mean() > 0.995
    # ...and every point is within one hex circumradius of its cell center
    d = haversine_m(LAT, LON, clat, clon)
    assert d.max() <= h3.edge_length_radians(res) * 6371008.8 * 1.01


def test_parent_truncation_stable():
    c = h3.latlng_to_cell(LAT, LON, 10)
    assert (h3.parent(h3.parent(c, 7), 4) == h3.parent(c, 4)).all()
    assert (h3.cell_resolution(h3.parent(c, 4)) == 4).all()


def test_parent_center_near_child():
    c = h3.latlng_to_cell(LAT, LON, 9)
    p = h3.parent(c, 8)
    clat, clon = h3.cell_to_latlng(c)
    plat, plon = h3.cell_to_latlng(p)
    d = haversine_m(clat, clon, plat, plon)
    # aperture-7: child centers lie within the parent circumradius
    assert d.max() <= h3.edge_length_radians(8) * 6371008.8 * 1.01


@pytest.mark.parametrize("k", [1, 2, 4])
def test_kring_size_interior(k):
    # interior cells (away from face edges): exact 1+3k(k+1)
    pts = [(20.0, 30.0), (-35.0, -60.0), (50.0, 140.0)]
    for la, lo in pts:
        c = h3.latlng_to_cell(np.array([la]), np.array([lo]), 7)
        ring = h3.k_ring(c, k)[0]
        assert len(ring) == 1 + 3 * k * (k + 1)


def test_kring_contains_neighbors_of_nearby_points():
    # points within ~1 hex of each other land inside each other's 1-ring
    c0 = h3.latlng_to_cell(np.array([20.0]), np.array([30.0]), 8)
    edge_deg = np.rad2deg(h3.edge_length_radians(8))
    c1 = h3.latlng_to_cell(np.array([20.0 + edge_deg]), np.array([30.0]), 8)
    ring = h3.k_ring(c0, 1)[0]
    assert c1[0] in ring


def test_kring_geo_superset_near_face_edges():
    # geometric ring always includes the cells of nearby points, even when
    # the IJK ring would stop at a face boundary
    pts_lat = rng.uniform(-85, 85, 200)
    pts_lon = rng.uniform(-180, 180, 200)
    c = h3.latlng_to_cell(pts_lat, pts_lon, 4)
    rings = h3.k_ring_geo(c, 1)
    edge_deg = np.rad2deg(h3.edge_length_radians(4))
    near = h3.latlng_to_cell(pts_lat + 0.3 * edge_deg,
                             pts_lon, 4)
    ok = [near[i] in rings[i] or near[i] == c[i] for i in range(len(c))]
    assert np.mean(ok) > 0.97


def test_locality_same_cell_for_close_points():
    c = h3.latlng_to_cell(np.array([10.0, 10.0 + 1e-7]),
                          np.array([20.0, 20.0]), 12)
    assert c[0] == c[1]
