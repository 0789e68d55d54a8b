"""Dominant embedding direction — operators/spectral.py."""
import math

import pytest


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")


def test_dominant_direction_matches_numpy(spark):
    import numpy as np
    from cartwright_spark.operators.spectral import dominant_direction
    rng_vecs = [[((i * 7 + j * 13) % 17 - 8) / 8.0
                 + (2.0 if j == 3 else 0.0) * ((i % 5) - 2)
                 for j in range(6)] for i in range(40)]
    X = np.array(rng_vecs)
    out = dominant_direction(_emb(spark, rng_vecs), iters=30).collect()
    v = np.zeros(6)
    for r in out:
        v[r.dim] = r.loading
    w, V = np.linalg.eigh(X.T @ X)
    top = V[:, -1]
    if np.dot(top, v) < 0:
        top = -top
    assert np.allclose(v, top, atol=1e-6)
    assert out[0].eigval == pytest.approx(w[-1], rel=1e-6)
    assert out[0].var_total == pytest.approx((X * X).sum(), rel=1e-12)


def test_dominant_direction_axis_aligned(spark):
    from cartwright_spark.operators.spectral import dominant_direction
    vecs = [[0.0, float(s), 0.0] for s in (3, -2, 4, -5)]
    out = {r.dim: r for r in
           dominant_direction(_emb(spark, vecs), iters=5).collect()}
    assert abs(abs(out[1].loading) - 1.0) < 1e-12
    assert abs(out[0].loading) < 1e-12 and abs(out[2].loading) < 1e-12
    assert out[1].var_ratio == pytest.approx(1.0, abs=1e-12)


def test_dominant_direction_validation(spark):
    from cartwright_spark.operators.spectral import dominant_direction
    df = _emb(spark, [[1.0, 0.0]])
    with pytest.raises(ValueError, match="iters"):
        dominant_direction(df, iters=0)
    with pytest.raises(ValueError, match="zero matvec"):
        dominant_direction(_emb(spark, [[0.0, 0.0]]), iters=2).collect()
