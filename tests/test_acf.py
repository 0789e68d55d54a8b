"""ACF per series — operators/acf.py (exact integer moments)."""
import datetime as dt

import pytest


def _series(spark, xs, grp="g"):
    t0 = dt.datetime(2026, 1, 1)
    rows = [(grp, t0 + dt.timedelta(seconds=i), i, int(x))
            for i, x in enumerate(xs)]
    return spark.createDataFrame(
        rows, "grp string, ts timestamp, id long, x long")


def _py_acf(xs, k):
    n = len(xs)
    m = sum(xs) / n
    den = sum((x - m) ** 2 for x in xs)
    num = sum((xs[t] - m) * (xs[t + k] - m) for t in range(n - k))
    return num / den


def test_acf_matches_textbook(spark):
    from cartwright_spark.operators.acf import acf
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]
    out = {r.lag: r.r for r in _series(spark, xs).transform(
        lambda d: acf(d, max_lag=3)).collect()}
    for k in (1, 2, 3):
        assert out[k] == pytest.approx(_py_acf(xs, k), abs=1e-12)


def test_acf_periodic_signal_peaks_at_period(spark):
    from cartwright_spark.operators.acf import acf
    xs = [1, 9, 1, 9, 1, 9, 1, 9, 1, 9, 1, 9]
    out = {r.lag: r.r for r in
           acf(_series(spark, xs), max_lag=4).collect()}
    # perfectly periodic: biased ACF at an in-phase lag is (n-k)/n
    assert out[2] == pytest.approx(10 / 12, abs=1e-12)
    assert out[4] == pytest.approx(8 / 12, abs=1e-12)
    assert out[1] == pytest.approx(_py_acf(xs, 1), abs=1e-12)
    assert out[1] < -0.8 and out[3] < -0.6   # odd lags anti-phase


def test_acf_constant_series_dropped(spark):
    from cartwright_spark.operators.acf import acf
    assert acf(_series(spark, [5] * 10), max_lag=2).count() == 0


def test_acf_short_series_prunes_long_lags(spark):
    from cartwright_spark.operators.acf import acf
    out = {r.lag for r in
           acf(_series(spark, [1, 2, 3]), max_lag=5).collect()}
    assert out == {1, 2}


def test_acf_groups_independent(spark):
    from cartwright_spark.operators.acf import acf
    a = _series(spark, [1, 2, 3, 4, 5, 6], grp="a")
    b = _series(spark, [6, 1, 6, 1, 6, 1], grp="b")
    out = {(r.grp, r.lag): r.r
           for r in acf(a.unionByName(b), max_lag=1).collect()}
    assert out[("a", 1)] == pytest.approx(_py_acf([1, 2, 3, 4, 5, 6], 1),
                                          abs=1e-12)
    assert out[("b", 1)] == pytest.approx(_py_acf([6, 1, 6, 1, 6, 1], 1),
                                          abs=1e-12)


def test_acf_guard_and_validation(spark):
    from cartwright_spark.operators.acf import acf
    with pytest.raises(ValueError, match="max_lag"):
        acf(_series(spark, [1, 2]), max_lag=0)
    big = _series(spark, [10 ** 6, -(10 ** 6)] * 300)
    with pytest.raises(Exception, match="int64-exact bound"):
        acf(big, max_lag=1).collect()
