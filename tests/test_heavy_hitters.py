"""Guaranteed heavy hitters: Misra-Gries prefilter + exact recount
(operators/sketch.py heavy_hitters_exact)."""

import pytest
from pyspark.sql import functions as F

from cartwright_spark.operators.sketch import (heavy_hitters_exact,
                                               misra_gries_summary)


def _zipf_df(spark, n_vals=400, reps=60):
    # value i repeated ceil(reps / (i+1)) times — a zipf-ish head
    return (spark.range(n_vals)
            .select(F.explode(F.array_repeat(
                F.concat(F.lit("v"), F.col("id").cast("string")),
                (F.lit(reps) / (F.col("id") + 1)).cast("int") + 1))
                .alias("term")))


def _exact(df, k):
    n = df.count()
    rows = (df.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
            .where(F.col("freq") * k > F.lit(n)).collect())
    return {r["term"]: r["freq"] for r in rows}


def test_matches_exact_groupby(spark):
    df = _zipf_df(spark)
    got = {r["term"]: r["freq"]
           for r in heavy_hitters_exact(df, "term", k=50).collect()}
    assert got == _exact(df, 50)


def test_partition_invariant(spark):
    df = _zipf_df(spark)
    a = sorted(map(tuple, heavy_hitters_exact(
        df.repartition(1), "term", k=40).select("term", "freq").collect()))
    b = sorted(map(tuple, heavy_hitters_exact(
        df.repartition(16), "term", k=40).select("term", "freq").collect()))
    assert a == b and len(a) > 0


def test_no_false_negatives_tiny_k_summary(spark):
    # the prefilter guarantee: every value with freq > n/k survives
    # pass 1 even when the summary holds only k counters and the
    # domain is much wider
    df = _zipf_df(spark, n_vals=2000, reps=40).repartition(8)
    k = 10
    summary = misra_gries_summary(df.select(F.col("term").alias("v")),
                                  "v", k)
    cand = {r["v"] for r in
            summary.where(F.col("n").isNull()).collect()}
    assert set(_exact(df, k)) <= cand


def test_n_total_exact(spark):
    df = _zipf_df(spark).repartition(5)
    row = heavy_hitters_exact(df, "term", k=20).first()
    assert row["n_total"] == df.count()


def test_k_validation(spark):
    with pytest.raises(ValueError):
        misra_gries_summary(
            spark.range(3).select(F.col("id").cast("string").alias("v")),
            "v", 0)
