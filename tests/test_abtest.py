"""A/B z-test + k-anonymity — operators/abtest.py."""
import math

import pytest


def test_ab_ztest_hand_computed(spark):
    from cartwright_spark.operators.abtest import ab_ztest
    # control: 2/4 success; treatment: 3/4 success
    rows = ([("e", "c", 1)] * 2 + [("e", "c", 0)] * 2
            + [("e", "t", 1)] * 3 + [("e", "t", 0)])
    df = spark.createDataFrame(rows,
                               "exp string, v string, s int")
    r = ab_ztest(df, "exp", "v", "s", "c", "t").collect()[0]
    assert (r.n_c, r.x_c, r.n_t, r.x_t) == (4, 2, 4, 3)
    pool = 5 / 8
    z = (0.75 - 0.5) / math.sqrt(pool * (1 - pool) * (1 / 4 + 1 / 4))
    assert r.z == pytest.approx(z, rel=1e-12)


def test_ab_ztest_degenerate_variance_is_null(spark):
    from cartwright_spark.operators.abtest import ab_ztest
    rows = [("e", "c", 1), ("e", "t", 1)]     # everyone succeeds
    df = spark.createDataFrame(rows, "exp string, v string, s int")
    r = ab_ztest(df, "exp", "v", "s", "c", "t").collect()[0]
    assert r.z is None and r.p_c == 1.0 and r.p_t == 1.0


def test_ab_ztest_drops_one_armed_experiments(spark):
    from cartwright_spark.operators.abtest import ab_ztest
    rows = [("only_c", "c", 1), ("both", "c", 0), ("both", "t", 1)]
    df = spark.createDataFrame(rows, "exp string, v string, s int")
    out = ab_ztest(df, "exp", "v", "s", "c", "t").collect()
    assert [r.exp for r in out] == ["both"]


def test_k_anonymity_flags_small_combos(spark):
    from cartwright_spark.operators.abtest import k_anonymity
    rows = ([("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)])
    df = spark.createDataFrame(rows, "qa string, qb int")
    out = {(r.qa, r.qb): r for r in
           k_anonymity(df, ["qa", "qb"], k=5).collect()}
    assert set(out) == {("a", 2), ("b", 1)}
    assert out[("a", 2)].n_rows == 2 and out[("a", 2)].deficit == 3
    assert out[("b", 1)].deficit == 4


def test_k_anonymity_validation(spark):
    from cartwright_spark.operators.abtest import k_anonymity
    df = spark.createDataFrame([("a", 1)], "qa string, qb int")
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity(df, [])
    with pytest.raises(ValueError, match="k must"):
        k_anonymity(df, ["qa"], k=1)
