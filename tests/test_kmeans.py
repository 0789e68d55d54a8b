"""Integer-exact Lloyd k-means."""

import numpy as np

from cartwright_spark.spatial.kmeans import kmeans_lloyd


def _numpy_lloyd(xy, w, k, iters):
    x0, x1 = xy[:, 0].min(), xy[:, 0].max()
    y0, y1 = xy[:, 1].min(), xy[:, 1].max()
    denom = float(max(k - 1, 1))
    c = np.array([[x0 + j * (x1 - x0) / denom,
                   y0 + j * (y1 - y0) / denom] for j in range(k)])

    def assign(c):
        d2 = ((xy[:, None, 0] - c[None, :, 0]) ** 2
              + (xy[:, None, 1] - c[None, :, 1]) ** 2)
        return d2.argmin(axis=1)  # argmin takes lowest index on ties

    for _ in range(iters):
        a = assign(c)
        for j in range(k):
            m = a == j
            if m.any():
                c[j] = [(xy[m, 0] * w[m]).sum() / w[m].sum(),
                        (xy[m, 1] * w[m]).sum() / w[m].sum()]
    a = assign(c)
    n = np.array([w[a == j].sum() for j in range(k)])
    return c, n


def test_kmeans_matches_numpy_lloyd(spark):
    rng = np.random.default_rng(3)
    pts = rng.integers(0, 200, size=(500, 2))
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in pts], ["x", "y"]).repartition(8)
    out = {r["cid"]: r for r in
           kmeans_lloyd(df, "x", "y", k=5, iters=3).collect()}
    # numpy reference runs on the DISTINCT weighted set (engine
    # semantics == raw-row Lloyd; dedup is an internal optimization)
    uniq, counts = np.unique(pts, axis=0, return_counts=True)
    c, n = _numpy_lloyd(uniq.astype(float), counts.astype(float), 5, 3)
    for j in range(5):
        assert abs(out[j]["cx"] - c[j][0]) < 1e-9
        assert abs(out[j]["cy"] - c[j][1]) < 1e-9
        assert out[j]["n_points"] == int(n[j])
    assert sum(r["n_points"] for r in out.values()) == 500


def test_kmeans_duplicate_rows_weighted(spark):
    """100 copies of one point must pull a centroid exactly onto it."""
    rows = [(0, 0)] * 100 + [(1000, 1000)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = sorted(kmeans_lloyd(df, "x", "y", k=2, iters=3).collect(),
                 key=lambda r: r["cid"])
    assert (out[0]["cx"], out[0]["cy"], out[0]["n_points"]) == (0.0, 0.0, 100)
    assert (out[1]["cx"], out[1]["cy"], out[1]["n_points"]) == (
        1000.0, 1000.0, 1)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k=4 over 2 distinct points: two clusters stay empty and must
    keep their diagonal-init centroids with n_points = 0."""
    df = spark.createDataFrame([(0, 0), (9, 9)], ["x", "y"])
    out = {r["cid"]: r for r in
           kmeans_lloyd(df, "x", "y", k=4, iters=2).collect()}
    assert len(out) == 4
    assert sum(r["n_points"] for r in out.values()) == 2
    empties = [r for r in out.values() if r["n_points"] == 0]
    assert len(empties) == 2
