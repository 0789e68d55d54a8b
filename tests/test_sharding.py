"""Rendezvous (HRW) shard routing — functions/sharding.py."""
import pytest


def _keys(spark, n):
    return spark.range(n).withColumnRenamed("id", "k")


def test_rendezvous_matches_python_argmax(spark):
    from cartwright_spark.functions.sharding import (
        rendezvous_assign, M, A, B, C)

    def py_weight(k, s):
        kk = k % M
        h1 = (kk * A + s * B + C) % M
        return (h1 * h1 + h1) % M

    out = {r.k: (r.shard, r.shard_w)
           for r in rendezvous_assign(_keys(spark, 200), "k", 5).collect()}
    for k in range(200):
        best = max(range(5), key=lambda s: (py_weight(k, s), s))
        assert out[k] == (best, py_weight(k, best))


def test_rendezvous_minimal_disruption(spark):
    # the point of HRW: growing N shards to N+1 only moves keys whose
    # argmax became the NEW shard — nobody moves between old shards.
    from cartwright_spark.functions.sharding import rendezvous_assign
    keys = _keys(spark, 2000)
    a = {r.k: r.shard for r in
         rendezvous_assign(keys, "k", 8).collect()}
    b = {r.k: r.shard for r in
         rendezvous_assign(keys, "k", 9).collect()}
    moved = {k for k in a if a[k] != b[k]}
    assert all(b[k] == 8 for k in moved)          # moves go to shard 8 only
    assert 0 < len(moved) < 2000 * 0.25            # ~1/9 expected


def test_rendezvous_balance(spark):
    from cartwright_spark.functions.sharding import rendezvous_assign
    out = rendezvous_assign(_keys(spark, 10000), "k", 8) \
        .groupBy("shard").count().collect()
    counts = {r.shard: r["count"] for r in out}
    assert set(counts) == set(range(8))
    for c in counts.values():
        assert 800 < c < 1700                      # loose balance band


def test_rendezvous_no_shuffle_plan(spark):
    from cartwright_spark.functions.sharding import rendezvous_assign
    plan = rendezvous_assign(_keys(spark, 10), "k", 4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rendezvous_validation(spark):
    from cartwright_spark.functions.sharding import rendezvous_assign
    with pytest.raises(ValueError, match="n_shards"):
        rendezvous_assign(_keys(spark, 1), "k", 0)
