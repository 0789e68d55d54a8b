"""gini_concentration: hand values, tie invariance, guards, plan gate."""

import numpy as np
import pytest

from cartwright_spark.operators.inequality import gini_concentration


def _gini(vals):
    ys = sorted(vals)
    n, tot = len(ys), sum(ys)
    iy = sum(i * y for i, y in enumerate(ys, 1))
    num, den = 2 * iy - (n + 1) * tot, n * tot
    return num, den, (num / den if den else 0.0)


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["grp", "y"])
    return {r.grp: r for r in gini_concentration(df).collect()}


def test_hand_values(spark):
    rows = ([("eq", 5)] * 4                      # equality -> 0
            + [("one", 0)] * 3 + [("one", 4)]    # all mass on one -> 3/4
            + [("mix", y) for y in (1, 2, 3, 4)])
    got = _run(spark, rows)
    assert got["eq"].gini == 0.0 and got["eq"].num == 0
    assert got["one"].gini == 0.75
    n, t, (num, den, g) = 4, 10, _gini([1, 2, 3, 4])
    assert (got["mix"].num, got["mix"].den) == (num, den)
    assert got["mix"].gini == pytest.approx(g)


def test_tie_order_invariance_random(spark):
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 20, 500).tolist()   # heavy ties
    num, den, g = _gini(vals)
    for nparts in (1, 32):
        df_rows = [("g", int(v)) for v in vals]
        got = _run(spark, [("g", int(v)) for v in vals])
        assert (got["g"].num, got["g"].den) == (num, den)


def test_zero_total_and_negative_guard(spark):
    got = _run(spark, [("z", 0), ("z", 0)])
    assert got["z"].gini == 0.0 and got["z"].den == 0
    with pytest.raises(Exception, match="negative"):
        _run(spark, [("n", -1)])


def test_corpus_not_reshuffled_after_scan(spark):
    # post-checkpoint the only exchange is the metadata-sized partials
    # groupBy — the corpus itself moves ONCE (the range shuffle, paid
    # before the checkpoint); a rank-window plan would re-exchange it
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["grp", "y"])
    plan = gini_concentration(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "MapInPandas" in plan


def test_many_partition_offsets_exact(spark):
    # 64 range partitions slice each group many times; the offset map
    # must stitch exact global ranks back together
    rng = np.random.default_rng(29)
    vals = rng.integers(0, 10**7, 3000).tolist()
    num, den, g = _gini(vals)
    df = spark.createDataFrame([("g", int(v)) for v in vals],
                               ["grp", "y"]).repartition(64)
    got = {r.grp: r for r in gini_concentration(df).collect()}
    assert (got["g"].num, got["g"].den) == (num, den)
    assert got["g"].gini == pytest.approx(g, abs=1e-12)
