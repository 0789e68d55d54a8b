"""HBOS histogram outlier scores — operators/hbos.py."""
import math

import pytest


def test_hbos_rare_bin_scores_higher(spark):
    from cartwright_spark.operators.hbos import hbos_scores
    # 15 points at 0.0, one point at 16.0 -> with 16 bins the outlier
    # sits alone in the top bin: score ln(16/1); the rest ln(16/15)
    rows = [(i, 0.0) for i in range(15)] + [(99, 16.0)]
    df = spark.createDataFrame(rows, "id long, x double")
    out = {r.id: r.hbos for r in
           hbos_scores(df, ["x"], bins=16).collect()}
    assert out[99] == pytest.approx(math.log(16.0 / 1.0))
    assert out[0] == pytest.approx(math.log(16.0 / 15.0))


def test_hbos_multi_feature_sums(spark):
    from cartwright_spark.operators.hbos import hbos_scores
    # feature y is constant -> contributes ln(N/N) = 0; score equals
    # the single-feature score
    rows = [(i, float(i % 2), 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    one = {r.id: r.hbos for r in hbos_scores(df, ["x"]).collect()}
    two = {r.id: r.hbos for r in hbos_scores(df, ["x", "y"]).collect()}
    for i in one:
        assert two[i] == pytest.approx(one[i])


def test_hbos_duplicates_flow_through(spark):
    from cartwright_spark.operators.hbos import hbos_scores
    # duplicate ids must come out twice with identical scores
    rows = [(1, 0.0), (1, 0.0), (2, 8.0)]
    df = spark.createDataFrame(rows, "id long, x double")
    out = hbos_scores(df, ["x"], bins=8).collect()
    assert len(out) == 3
    assert sum(1 for r in out if r.id == 1) == 2


def test_hbos_validation(spark):
    from cartwright_spark.operators.hbos import hbos_scores
    df = spark.createDataFrame([(1, 0.0)], "id long, x double")
    with pytest.raises(ValueError, match="feature_cols"):
        hbos_scores(df, [])
    with pytest.raises(ValueError, match="bins"):
        hbos_scores(df, ["x"], bins=1)


def test_hbos_joins_are_broadcast(spark):
    from cartwright_spark.operators.hbos import hbos_scores
    df = spark.createDataFrame([(i, float(i)) for i in range(32)],
                               "id long, x double")
    plan = (hbos_scores(df, ["x"])
            ._jdf.queryExecution().executedPlan().toString())
    # count-dim attach must be broadcast, never a shuffled sort-merge
    assert "SortMergeJoin" not in plan
