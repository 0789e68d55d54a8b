"""Grouped OLS trend — operators/regression.py."""
import pytest


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, x long, y long")


def test_ols_matches_numpy(spark):
    import numpy as np
    from cartwright_spark.operators.regression import ols_trend
    xs = list(range(30))
    ys = [(3 * x + 7 + ((x * x) % 5) - 2) for x in xs]   # noisy line
    out = ols_trend(_df(spark, [("g", x, y)
                                for x, y in zip(xs, ys)])).collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    assert out.slope == pytest.approx(slope, abs=1e-9)
    assert out.intercept == pytest.approx(intercept, abs=1e-9)
    r = np.corrcoef(xs, ys)[0, 1]
    assert out.r2 == pytest.approx(r * r, abs=1e-12)


def test_ols_perfect_line_r2_one(spark):
    from cartwright_spark.operators.regression import ols_trend
    rows = [("g", x, 5 * x - 3) for x in range(-5, 6)]
    out = ols_trend(_df(spark, rows)).collect()[0]
    assert out.slope == pytest.approx(5.0, abs=1e-12)
    assert out.intercept == pytest.approx(-3.0, abs=1e-12)
    assert out.r2 == pytest.approx(1.0, abs=1e-12)


def test_ols_degenerate_groups(spark):
    from cartwright_spark.operators.regression import ols_trend
    rows = ([("vert", 2, y) for y in range(5)]       # zero x-variance
            + [("flat", x, 7) for x in range(5)])    # zero y-variance
    out = {r.grp: r for r in ols_trend(_df(spark, rows)).collect()}
    assert out["vert"].slope is None and out["vert"].r2 is None
    assert out["flat"].slope == pytest.approx(0.0)
    assert out["flat"].r2 is None


def test_ols_guard_fires(spark):
    from cartwright_spark.operators.regression import ols_trend
    rows = [("g", 10 ** 8 + i, 10 ** 8 - i) for i in range(200)]
    with pytest.raises(Exception, match="int64-exact"):
        ols_trend(_df(spark, rows)).collect()
