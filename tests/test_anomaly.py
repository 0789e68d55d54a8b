"""Rolling integer z-score anomalies — operators/anomaly.py."""
import pytest


def _series(spark, ys, series=0):
    return spark.createDataFrame(
        [(series, i, y) for i, y in enumerate(ys)],
        "series int, pos int, y int")


def test_rolling_anomaly_flags_spike(spark):
    from cartwright_spark.operators.anomaly import rolling_anomaly
    ys = [10, 11, 10, 9, 10, 11, 10, 10, 50]   # spike at the end
    out = rolling_anomaly(_series(spark, ys), "series", ["pos"], "y",
                          window=8, min_points=4, tau=3)
    rows = {r.pos: r for r in out.collect()}
    # warm-up rows (fewer than 4 predecessors) are not scored
    assert set(rows) == {4, 5, 6, 7, 8}
    assert all(rows[p].is_anomaly == 0 for p in (4, 5, 6, 7))
    spike = rows[8]
    assert spike.is_anomaly == 1
    assert spike.n_prev == 8 and spike.s_prev == sum(ys[:8])
    assert spike.q_prev == sum(y * y for y in ys[:8])


def test_rolling_anomaly_exact_threshold(spark):
    from cartwright_spark.operators.anomaly import rolling_anomaly
    # prev window {0,2} repeated: mean 1, sigma 1 -> y=4 is exactly z=3,
    # the strict inequality must NOT flag it; y=5 (z>3) must.
    base = [0, 2, 0, 2, 0, 2, 0, 2]
    for probe, expect in ((4, 0), (5, 1)):
        out = rolling_anomaly(_series(spark, base + [probe]),
                              "series", ["pos"], "y", window=8)
        assert {r.pos: r.is_anomaly for r in out.collect()}[8] == expect


def test_rolling_anomaly_zero_variance(spark):
    from cartwright_spark.operators.anomaly import rolling_anomaly
    ys = [7, 7, 7, 7, 7, 7, 7, 7, 8]
    rows = {r.pos: r.is_anomaly
            for r in rolling_anomaly(_series(spark, ys), "series",
                                     ["pos"], "y").collect()}
    # flat window: any deviation is an anomaly, staying flat is not
    assert rows[7] == 0 and rows[8] == 1


def test_rolling_anomaly_series_isolation(spark):
    from cartwright_spark.operators.anomaly import rolling_anomaly
    a = _series(spark, [1, 1, 1, 1, 1, 99], series=0)
    b = _series(spark, [99, 99, 99, 99, 99, 99], series=1)
    out = rolling_anomaly(a.unionByName(b), "series", ["pos"], "y",
                          window=8, min_points=4)
    flags = {(r.series, r.pos): r.is_anomaly for r in out.collect()}
    assert flags[(0, 5)] == 1      # spike within its own series
    assert flags[(1, 5)] == 0      # 99 is normal for series 1


def test_rolling_anomaly_validation(spark):
    from cartwright_spark.operators.anomaly import rolling_anomaly
    df = _series(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="window"):
        rolling_anomaly(df, "series", ["pos"], "y", window=1)
    with pytest.raises(ValueError, match="min_points"):
        rolling_anomaly(df, "series", ["pos"], "y", min_points=0)
    with pytest.raises(ValueError, match="tau"):
        rolling_anomaly(df, "series", ["pos"], "y", tau=0)


def test_rolling_anomaly_single_exchange(spark):
    from cartwright_spark.operators.anomaly import rolling_anomaly
    df = _series(spark, [1, 2, 3, 4, 5, 6])
    plan = (rolling_anomaly(df, "series", ["pos"], "y")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
