"""DBSCAN core/border/noise labelling (spatial/dbscan.py)."""

import numpy as np
import pytest

from cartwright_spark.spatial.dbscan import dbscan_label


def _pts(spark, rows):
    return spark.createDataFrame(
        [(i, int(x), int(y)) for i, (x, y) in enumerate(rows)],
        "id long, px long, py long")


def brute_labels(xy: np.ndarray, eps: int, min_pts: int):
    """Reference labelling by the definition: O(n^2) integer exact.
    n_nbrs is capped at min_pts (the operator's contract)."""
    d2 = ((xy[:, None, :] - xy[None, :, :]).astype(np.int64) ** 2).sum(-1)
    nbr = d2 <= eps * eps
    n_true = nbr.sum(1)
    core = n_true >= min_pts
    n_nbrs = np.minimum(n_true, min_pts)
    labels = []
    for i in range(len(xy)):
        if core[i]:
            labels.append("core")
        elif core[nbr[i]].any():
            labels.append("border")
        else:
            labels.append("noise")
    return n_nbrs, labels


def test_hand_blob_border_noise(spark):
    """5-point blob (all core at min_pts=5), one border point hanging
    off it at EXACTLY eps from a core point, one distant noise point."""
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2),   # blob, pairwise d2<=8
            (5, 2),                                    # d2 to (2,2)=9=eps2
            (100, 100)]                                # noise
    out = {r.id: r for r in
           dbscan_label(_pts(spark, rows), eps=3, min_pts=5).collect()}
    assert len(out) == 7
    for i in range(5):
        assert out[i].label == "core", i
    assert out[0].n_nbrs == 5          # blob only; (5,2) is d2=26 from (0,0)
    assert out[5].label == "border"    # inclusive eps boundary reaches core
    assert out[5].n_nbrs == 2          # itself + (2,2)
    assert out[6].label == "noise" and out[6].n_nbrs == 1


def test_boundary_is_inclusive_and_one_past_drops(spark):
    """d2 == eps2 counts as a neighbour; one unit further does not."""
    out = {r.id: r for r in dbscan_label(
        _pts(spark, [(0, 0), (3, 4), (3, -4), (8, 4)]),
        eps=5, min_pts=3).collect()}
    # d2 pairs at exactly 25: (0,0)-(3,4), (0,0)-(3,-4), (3,4)-(8,4);
    # everything else > 25
    assert out[0].n_nbrs == 3 and out[0].label == "core"
    assert out[1].n_nbrs == 3 and out[1].label == "core"
    assert out[2].n_nbrs == 2 and out[2].label == "border"
    assert out[3].n_nbrs == 2 and out[3].label == "border"


def test_min_pts_one_everything_core(spark):
    out = dbscan_label(_pts(spark, [(0, 0), (50, 50)]), eps=3,
                       min_pts=1).collect()
    assert {r.label for r in out} == {"core"}


def test_brute_force_parity_negative_coords(spark):
    """300 deterministic points spanning negative coordinates, three
    (eps, min_pts) settings — exact match with the O(n^2) oracle,
    exercising floor-correct cells across the 0 axis."""
    k = np.arange(300, dtype=np.int64)
    x = (k * 131 % 1000) - 500
    y = (k * 197 % 1000) - 500
    xy = np.stack([x, y], 1)
    df = _pts(spark, list(map(tuple, xy)))
    for eps, min_pts in [(60, 4), (35, 3), (120, 10)]:
        got = {r.id: (r.n_nbrs, r.label)
               for r in dbscan_label(df, eps, min_pts).collect()}
        n_ref, lab_ref = brute_labels(xy, eps, min_pts)
        assert len(got) == 300
        for i in range(300):
            assert got[i] == (n_ref[i], lab_ref[i]), (eps, min_pts, i)


def test_partition_layout_invariance(spark):
    """Same labels regardless of input partitioning."""
    rows = [((i * 37) % 200 - 100, (i * 73) % 200 - 100) for i in range(80)]
    a = dbscan_label(_pts(spark, rows), 25, 4)
    b = dbscan_label(_pts(spark, rows).repartition(7), 25, 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_guards(spark):
    df = _pts(spark, [(0, 0)])
    with pytest.raises(ValueError):
        dbscan_label(df, 0, 1)
    with pytest.raises(ValueError):
        dbscan_label(df, 10, 0)
    with pytest.raises(ValueError):
        dbscan_label(df, 10 ** 9, 1)


def test_dense_blob_short_circuits_capped_counts(spark):
    """A blob far denser than min_pts: every blob point is core with
    n_nbrs == min_pts (capped), without pair enumeration; a lone far
    point is noise with its true (uncapped-but-small) count."""
    rows = [(i % 10, i // 10) for i in range(100)]  # 10x10 dense grid
    rows.append((5000, 5000))
    out = {r.id: r for r in
           dbscan_label(_pts(spark, rows), eps=30, min_pts=5).collect()}
    assert len(out) == 101
    for i in range(100):
        assert out[i].label == "core" and out[i].n_nbrs == 5, i
    assert out[100].label == "noise" and out[100].n_nbrs == 1
