"""hausdorff_join vs brute force — including fixtures where the bbox
grid prefilter genuinely prunes (localized trajectories), so the test
covers completeness of the candidate generator, not just the refine."""
import numpy as np
import pytest

from pyspark.sql import functions as F


def _brute(tracks, max_dist):
    d2 = max_dist * max_dist
    out = {}
    ids = sorted(tracks)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            pa, pb = np.asarray(tracks[a]), np.asarray(tracks[b])
            dm = ((pa[:, None, 0] - pb[None, :, 0]) ** 2
                  + (pa[:, None, 1] - pb[None, :, 1]) ** 2)
            h = max(dm.min(axis=1).max(), dm.min(axis=0).max())
            if h <= d2:
                out[(a, b)] = h
    return out


@pytest.fixture(scope="module")
def tracks(spark):
    rng = np.random.default_rng(31)
    tracks = {}
    for t in range(24):
        # clustered centers so some pairs are near, most far
        cy, cx = divmod(t % 12, 4)
        center = np.array([cy * 6.0, cx * 6.0])
        n = int(rng.integers(1, 30))          # includes 1-point tracks
        pts = center + rng.normal(0, 1.2, (n, 2)).round(3)
        tracks[t] = [(float(la), float(lo)) for la, lo in pts]
    # exact duplicate points inside one track (set semantics)
    tracks[0] = tracks[0] + tracks[0][:3]
    rows = [(t, la, lo) for t, ps in tracks.items() for la, lo in ps]
    df = spark.createDataFrame(rows, "traj_id long, lat double, lon double")
    return df, tracks


@pytest.mark.parametrize("max_dist", [1.5, 4.0, 9.0])
def test_hausdorff_matches_bruteforce(tracks, max_dist):
    from cartwright_spark.spatial.hausdorff import hausdorff_join
    df, tr = tracks
    got = {(r.id_a, r.id_b): r.hausdorff_sq
           for r in hausdorff_join(df, max_dist=max_dist).collect()}
    want = _brute(tr, max_dist)
    assert set(got) == set(want)
    for k, h in want.items():
        assert got[k] == pytest.approx(h, rel=1e-12)


def test_hausdorff_null_points_dropped(spark):
    from cartwright_spark.spatial.hausdorff import hausdorff_join
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, None, 5.0), (2, 0.5, 0.0), (2, 3.0, None)],
        "traj_id long, lat double, lon double")
    rows = hausdorff_join(df, max_dist=2.0).collect()
    assert [(r.id_a, r.id_b, r.hausdorff_sq) for r in rows] == [(1, 2, 0.25)]


def test_hausdorff_guards(spark):
    from cartwright_spark.spatial.hausdorff import hausdorff_join
    df = spark.createDataFrame([(1, 0.0, 0.0)],
                               "traj_id long, lat double, lon double")
    for bad in (0.0, -1.0):
        with pytest.raises(ValueError):
            hausdorff_join(df, max_dist=bad)
    # cell-cover explosion fails loudly, not an executor OOM
    wide = spark.createDataFrame(
        [(1, -89.0, -179.0), (1, 89.0, 179.0), (2, 0.0, 0.0)],
        "traj_id long, lat double, lon double")
    with pytest.raises(Exception, match="cover exceeds"):
        hausdorff_join(wide, max_dist=0.001).collect()


def test_hausdorff_partition_invariance(tracks):
    from cartwright_spark.spatial.hausdorff import hausdorff_join
    df, _ = tracks
    a = sorted((r.id_a, r.id_b, r.hausdorff_sq)
               for r in hausdorff_join(df.repartition(1), max_dist=4.0)
               .collect())
    b = sorted((r.id_a, r.id_b, r.hausdorff_sq)
               for r in hausdorff_join(df.repartition(13, "lat"),
                                       max_dist=4.0).collect())
    assert a == b


def test_kernel_and_dataframe_refines_bit_equal(spark):
    from cartwright_spark.spatial.hausdorff import hausdorff_join
    import random
    rnd = random.Random(7)
    rows = [(t, rnd.uniform(-5, 5) + (t % 4) * 3,
             rnd.uniform(-5, 5) + (t % 3) * 2)
            for t in range(8) for _ in range(60)]
    pts = spark.createDataFrame(rows, "traj_id long, lat double, lon double")
    kern = {(r.id_a, r.id_b): r.hausdorff_sq
            for r in hausdorff_join(pts, max_dist=20.0,
                                    refine="kernel").collect()}
    dfr = {(r.id_a, r.id_b): r.hausdorff_sq
           for r in hausdorff_join(pts, max_dist=20.0,
                                   refine="dataframe").collect()}
    assert kern == dfr and len(kern) > 0      # bit-identical doubles


def test_refine_auto_picks_kernel_for_small_and_validates(spark):
    import pytest as _pt
    from cartwright_spark.spatial.hausdorff import hausdorff_join
    pts = spark.createDataFrame([(1, 0.0, 0.0), (2, 1.0, 1.0)],
                                "traj_id long, lat double, lon double")
    plan = (hausdorff_join(pts, max_dist=5.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert "mapInPandas" in plan or "MapInPandas" in plan
    # forced dataframe path keeps the pure-JVM cascade
    plan2 = (hausdorff_join(pts, max_dist=5.0, refine="dataframe")
             ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" not in plan2
    with _pt.raises(ValueError, match="refine"):
        hausdorff_join(pts, refine="bogus")
