"""isotonic_fit: reference-PAVA parity, max-min identity, partition
invariance, duplicate-x pooling, equal-mean canonicality."""

from fractions import Fraction

import numpy as np

from cartwright_spark.operators.isotonic import isotonic_fit


def _ref_fit(xs, ys):
    """Per-point fitted values via the max-min identity (exact
    Fractions) after pre-pooling duplicate x."""
    atoms = {}
    for x, y in zip(xs, ys):
        n, s = atoms.get(x, (0, 0))
        atoms[x] = (n + 1, s + y)
    order = sorted(atoms)
    n = [atoms[x][0] for x in order]
    s = [atoms[x][1] for x in order]
    m = len(order)
    fit = []
    for i in range(m):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, m):
                avg = Fraction(sum(s[j:k + 1]), sum(n[j:k + 1]))
                worst = avg if worst is None else min(worst, avg)
            best = worst if best is None else max(best, worst)
        fit.append(best)
    # maximal pools = runs of equal fitted value
    pools = []
    for x, nn, ss, f in zip(order, n, s, fit):
        if pools and pools[-1][-1] == f:
            lo, hi, pn, ps, _ = pools[-1]
            pools[-1] = (lo, x, pn + nn, ps + ss, f)
        else:
            pools.append((x, x, nn, ss, f))
    return [(lo, hi, pn, ps) for lo, hi, pn, ps, _ in pools]


def _got(df):
    return sorted((r.grp, r.x_lo, r.x_hi, r.n_pts, r.y_sum)
                  for r in isotonic_fit(df).collect())


def test_hand_case_and_fitted(spark):
    rows = [(0, 0, 1), (0, 1, 3), (0, 2, 2), (0, 3, 2), (0, 4, 5)]
    out = sorted(map(tuple, isotonic_fit(
        spark.createDataFrame(rows, ["grp", "x", "y"])).collect()))
    assert out == [(0, 0, 0, 1, 1, 1.0),
                   (0, 1, 3, 3, 7, 7 / 3),
                   (0, 4, 4, 1, 5, 5.0)]


def test_random_reference_parity_multi_group(spark):
    rng = np.random.default_rng(11)
    rows, want = [], []
    for g in range(3):
        xs = rng.integers(0, 25, 80).tolist()
        ys = (2 * np.array(xs) + rng.integers(-15, 16, 80)).tolist()
        rows += [(g, int(x), int(y)) for x, y in zip(xs, ys)]
        want += [(g, lo, hi, n, s) for lo, hi, n, s in _ref_fit(xs, ys)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    assert _got(df) == sorted(want)
    # partition invariance (pool boundaries crossing range partitions)
    for nparts in (1, 5, 32):
        assert _got(df.repartition(nparts)) == sorted(want)


def test_equal_mean_pools_merge(spark):
    # y constant: ONE maximal pool, not one per x
    rows = [(0, x, 4) for x in range(6)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    assert _got(df) == [(0, 0, 5, 6, 24)]


def test_decreasing_input_single_pool(spark):
    rows = [(0, x, 10 - x) for x in range(5)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    assert _got(df) == [(0, 0, 4, 5, 40)]


def test_monotone_and_mass_conserving(spark):
    rng = np.random.default_rng(3)
    rows = [(0, int(x), int(y)) for x, y in
            zip(rng.integers(0, 50, 200), rng.integers(-99, 100, 200))]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = sorted(isotonic_fit(df).collect(), key=lambda r: r.x_lo)
    fits = [r.fitted for r in out]
    assert all(a < b for a, b in zip(fits, fits[1:]))  # strictly increasing
    assert sum(r.y_sum for r in out) == sum(y for _, _, y in rows)
    assert sum(r.n_pts for r in out) == len(rows)
    # pool ranges tile without overlap
    for a, b in zip(out, out[1:]):
        assert a.x_hi < b.x_lo
