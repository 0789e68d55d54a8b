"""Canonical keeper selection + SCD2 intervals — operators/canonical.py."""
import datetime

import pytest


def test_canonical_pick_preference_order(spark):
    from cartwright_spark.operators.canonical import canonical_pick
    df = spark.createDataFrame(
        [("k1", 10, 500), ("k1", 11, 300), ("k1", 12, 300),
         ("k2", 20, 100)],
        "key string, id long, size long")
    out = {r.key: r for r in
           canonical_pick(df, "key", "id", ["size"]).collect()}
    # smallest size wins; id breaks the 300/300 tie
    assert out["k1"].canonical_id == 11 and out["k1"].n_members == 3
    assert out["k2"].canonical_id == 20 and out["k2"].n_members == 1


def test_canonical_pick_desc_via_negation(spark):
    from pyspark.sql import functions as F
    from cartwright_spark.operators.canonical import canonical_pick
    df = spark.createDataFrame(
        [("k", 1, 500), ("k", 2, 900)], "key string, id long, size long")
    big = canonical_pick(df.withColumn("neg", -F.col("size")),
                         "key", "id", ["neg"]).collect()[0]
    assert big.canonical_id == 2


def test_canonical_pick_no_window_in_plan(spark):
    from cartwright_spark.operators.canonical import canonical_pick
    df = spark.createDataFrame([("k", 1, 5)],
                               "key string, id long, size long")
    plan = (canonical_pick(df, "key", "id", ["size"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan           # algebraic agg, not row_number
    assert plan.count("Exchange hashpartitioning") == 1

    with pytest.raises(ValueError, match="pref_cols"):
        canonical_pick(df, "key", "id", [])


def _log(spark, rows):
    return spark.createDataFrame(
        [(e, datetime.datetime(2024, 1, d), v, i)
         for i, (e, d, v) in enumerate(rows)],
        "entity long, ts timestamp, val string, event_id long")


def test_scd2_collapses_repeats(spark):
    from cartwright_spark.operators.canonical import scd2_merge
    log = _log(spark, [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"),
                       (1, 4, "b"), (1, 5, "a")])
    out = sorted(scd2_merge(log, "entity", "ts", "val",
                            ["ts", "event_id"]).collect(),
                 key=lambda r: r.valid_from)
    assert [(r.val, r.valid_from.day,
             r.valid_to.day if r.valid_to else None, r.is_current)
            for r in out] == [
        ("a", 1, 3, 0), ("b", 3, 5, 0), ("a", 5, None, 1)]


def test_scd2_per_entity_isolation(spark):
    from cartwright_spark.operators.canonical import scd2_merge
    log = _log(spark, [(1, 1, "x"), (2, 1, "x"), (2, 2, "y")])
    out = scd2_merge(log, "entity", "ts", "val", ["ts", "event_id"])
    cur = {(r.entity, r.val): r.is_current for r in out.collect()}
    assert cur == {(1, "x"): 1, (2, "x"): 0, (2, "y"): 1}


def test_scd2_single_exchange(spark):
    from cartwright_spark.operators.canonical import scd2_merge
    log = _log(spark, [(1, 1, "a"), (1, 2, "b")])
    plan = (scd2_merge(log, "entity", "ts", "val", ["ts", "event_id"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
