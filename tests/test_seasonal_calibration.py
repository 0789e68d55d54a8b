"""Seasonal profile + calibration bins."""
import datetime

import pytest
from pyspark.sql import functions as F


def test_seasonal_profile_known_values(spark):
    from cartwright_spark.operators.seasonal import seasonal_profile
    rows = [("a", datetime.datetime(2024, 1, 1, h), y)
            for h, y in [(0, 10), (0, 20), (1, 40)]]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, y long")
    out = {r.bucket: r for r in
           seasonal_profile(df, "grp", F.hour("ts"), "y").collect()}
    # group mean = 70/3; hour 0 mean = 15, hour 1 mean = 40
    assert out[0].n == 2 and out[0].cell_mean == pytest.approx(15.0)
    assert out[0].seasonal == pytest.approx(15.0 - 70.0 / 3.0)
    assert out[1].seasonal == pytest.approx(40.0 - 70.0 / 3.0)


def test_seasonal_profile_group_isolation(spark):
    from cartwright_spark.operators.seasonal import seasonal_profile
    rows = [("a", datetime.datetime(2024, 1, 1, 0), 0),
            ("b", datetime.datetime(2024, 1, 1, 0), 100)]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, y long")
    out = seasonal_profile(df, "grp", F.hour("ts"), "y").collect()
    # single-bucket groups: seasonal index is exactly zero
    assert all(r.seasonal == 0.0 for r in out)


def test_seasonal_profile_plan_shape(spark):
    from cartwright_spark.operators.seasonal import seasonal_profile
    df = spark.createDataFrame(
        [("a", datetime.datetime(2024, 1, 1, 0), 1)],
        "grp string, ts timestamp, y long")
    plan = (seasonal_profile(df, "grp", F.hour("ts"), "y")
            ._jdf.queryExecution().executedPlan().toString())
    # two-level rollup: aggregates only, never a window
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_calibration_perfectly_calibrated(spark):
    from cartwright_spark.operators.calibration import calibration_bins
    # bin [0.6, 0.7): p=0.65 everywhere, 13 of 20 positive -> gap 0
    rows = [(0.65, 1 if i < 13 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = calibration_bins(df, "score", "label").collect()
    assert len(out) == 1
    r = out[0]
    assert r.bin == 6 and r.n == 20
    assert r.mean_pred == pytest.approx(0.65)
    assert r.frac_pos == pytest.approx(0.65)
    assert r.abs_gap == pytest.approx(0.0) and r.ece_term == pytest.approx(0.0)


def test_calibration_gap_and_ece_weighting(spark):
    from cartwright_spark.operators.calibration import calibration_bins
    rows = ([(0.95, 0)] * 3          # confident but always wrong
            + [(0.05, 0)] * 1)       # confident and right
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r.bin: r for r in
           calibration_bins(df, "score", "label").collect()}
    assert out[9].abs_gap == pytest.approx(0.95)
    assert out[9].ece_term == pytest.approx(0.95 * 3 / 4)
    assert out[0].abs_gap == pytest.approx(0.05)
    # p = 1.0 must land in the top bin, not bin B
    top = calibration_bins(
        spark.createDataFrame([(1.0, 1)], "score double, label int"),
        "score", "label", bins=10).collect()[0]
    assert top.bin == 9


def test_calibration_validation(spark):
    from cartwright_spark.operators.calibration import calibration_bins
    df = spark.createDataFrame([(0.5, 1)], "score double, label int")
    with pytest.raises(ValueError, match="bins"):
        calibration_bins(df, "score", "label", bins=1)
