"""cusum_changepoint: hand shifts, negative values, brute parity."""

import datetime as dt

import numpy as np

from cartwright_spark.operators.changepoint import cusum_changepoint


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m)


def _brute(xs):
    n, sn = len(xs), sum(xs)
    if n < 2:
        return None
    best = None
    s = 0
    for k in range(1, n):
        s += xs[k - 1]
        a = abs(n * s - k * sn)
        key = (a, -k)
        if best is None or key > best[0]:
            best = (key, k, a)
    _, k, a = best
    return k, a, a / (k * (n - k))


def _run(spark, series):
    rows = [(g, _ts(i), int(x))
            for g, xs in series.items() for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["grp", "ts", "x"])
    return {r.grp: r for r in cusum_changepoint(df).collect()}


def test_clean_mean_shift(spark):
    got = _run(spark, {1: [10] * 6 + [50] * 5})
    r = got[1]
    assert (r.k_star, r.stat, r.shift) == (6, 1200, 40.0)
    assert r.ts_split == _ts(5)


def test_constant_and_singleton(spark):
    got = _run(spark, {1: [7] * 8, 2: [5]})
    assert got[1].stat == 0 and got[1].k_star == 1
    assert 2 not in got  # n < 2: no split exists


def test_negative_values_sn_not_max_cumsum(spark):
    # running sum dips below its final value: S_n must be sum, not max
    xs = [-10, -10, -10, 5, 5, 5]
    got = _run(spark, {1: xs})
    k, a, shift = _brute(xs)
    assert (got[1].k_star, got[1].stat) == (k, a)
    assert got[1].shift == shift


def test_random_brute_parity(spark):
    rng = np.random.default_rng(9)
    series = {g: rng.integers(-50, 200, int(rng.integers(2, 60))).tolist()
              for g in range(12)}
    got = _run(spark, series)
    for g, xs in series.items():
        k, a, shift = _brute(xs)
        assert (got[g].k_star, got[g].stat) == (k, a), g
        assert abs(got[g].shift - shift) < 1e-12
