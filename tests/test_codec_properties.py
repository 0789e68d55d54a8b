"""Hypothesis property tests for the from-scratch codecs (pure Python —
no Spark session, so hundreds of random examples stay cheap).

The example-based tests pin known vectors; these pin the INVARIANTS:
encode∘decode is the identity for every input the encoder accepts.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_gif_roundtrip_property(data):
    from cartwright_spark.operators.gif import decode_gif, encode_gif
    h = data.draw(st.integers(1, 24), label="h")
    w = data.draw(st.integers(1, 24), label="w")
    p = data.draw(st.integers(2, 256), label="palette_size")
    nf = data.draw(st.integers(1, 4), label="frames")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (p, 3)).astype(np.uint8)
    frames = [rng.randint(0, p, (h, w)).astype(np.uint8)
              for _ in range(nf)]
    delays = [int(d) for d in rng.randint(0, 65536, nf)]
    out = decode_gif(encode_gif(frames, palette, delays))
    assert len(out) == nf
    for i, (d, rgb) in enumerate(out):
        assert d == delays[i]
        assert np.array_equal(rgb, palette[frames[i]])


@settings(max_examples=100, deadline=None)
@given(recs=st.lists(
    st.tuples(st.text(alphabet=st.characters(min_codepoint=33,
                                             max_codepoint=126),
                      min_size=1, max_size=40),
              st.binary(min_size=0, max_size=400)),
    min_size=1, max_size=8),
    gz=st.booleans())
def test_warc_roundtrip_property(recs, gz):
    from cartwright_spark.sources.warc import build_warc, parse_warc
    records = [{"url": "https://h/" + u, "payload": body}
               for u, body in recs]
    got = list(parse_warc(build_warc(records, gzip_members=gz)))
    assert len(got) == len(records)
    for want, r in zip(records, got):
        assert r["url"] == want["url"]
        assert r["payload"] == want["payload"]


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_png_roundtrip_property(data):
    from cartwright_spark.operators.multimodal import decode_png, encode_png
    h = data.draw(st.integers(1, 20), label="h")
    w = data.draw(st.integers(1, 20), label="w")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.RandomState(seed)
    raster = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(raster)), raster)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_disc_cover_contains_all_near_sites_property(data):
    """The radius join's exactness reduces to this: every site within r
    of a center encodes into a cell the disc cover samples."""
    from cartwright_spark.functions.geodesy import (EARTH_RADIUS_M,
                                                    geodesic_destination)
    from cartwright_spark.spatial import s2
    from cartwright_spark.spatial.distjoin import pick_level
    from cartwright_spark.spatial.knn import _disc_cells
    lat = data.draw(st.floats(-90.0, 90.0), label="lat")
    lon = data.draw(st.floats(-180.0, 179.999), label="lon")
    r_m = data.draw(st.floats(5_000.0, 3_000_000.0), label="r_m")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    level = pick_level(r_m)
    edge = s2.avg_edge_radians(level)
    cover = set(_disc_cells(
        np.array([lat]), np.array([lon]), edge,
        r_m + 2 * edge * EARTH_RADIUS_M,
        lambda la, lo: s2.latlng_to_cell(la, lo, level))[0])
    rng = np.random.RandomState(seed)
    d = rng.uniform(0, r_m / EARTH_RADIUS_M, 60)
    th = rng.uniform(0, 2 * np.pi, 60)
    sl, so = geodesic_destination(np.full(60, lat), np.full(60, lon),
                                  d, th)
    cells = s2.latlng_to_cell(np.clip(sl, -89.999, 89.999), so, level)
    missing = set(cells.astype(np.int64).tolist()) - cover
    assert not missing, (lat, lon, r_m, sorted(missing)[:3])
