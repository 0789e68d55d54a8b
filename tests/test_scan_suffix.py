"""global_dense_rank + suffix_array: reference parity, boundary-tie
merging, partition invariance, early-exit."""

import numpy as np
import pytest

from cartwright_spark.functions.scan import global_dense_rank
from cartwright_spark.operators.suffix import suffix_array


def test_dense_rank_matches_reference_with_heavy_ties(spark):
    rng = np.random.default_rng(3)
    vals = [(int(a), int(b)) for a, b in rng.integers(0, 12, (4000, 2))]
    want = {k: i + 1 for i, k in enumerate(sorted(set(vals)))}
    df = spark.createDataFrame(vals, ["a", "b"])
    for nparts in (1, 2, 16, 64):
        out = global_dense_rank(df.repartition(nparts), ["a", "b"]) \
            .collect()
        assert all(want[(r.a, r.b)] == r.rank for r in out), nparts
        assert len(out) == len(vals)


def test_dense_rank_all_equal_and_all_distinct(spark):
    df = spark.createDataFrame([(7,)] * 50, ["a"]).repartition(8)
    out = global_dense_rank(df, ["a"]).collect()
    assert {r.rank for r in out} == {1}
    df2 = spark.createDataFrame([(i,) for i in range(50)], ["a"])
    out2 = global_dense_rank(df2.repartition(8), ["a"]).collect()
    assert {(r.a, r.rank) for r in out2} == {(i, i + 1) for i in range(50)}


def _sa_ref(s):
    return {i + 1: rk + 1 for rk, i in
            enumerate(sorted(range(len(s)), key=lambda i: s[i:]))}


def _sa_got(spark, s, nparts=16):
    df = spark.createDataFrame(
        [(i + 1, ch) for i, ch in enumerate(s)], ["i", "c"]) \
        .repartition(nparts)
    return {r.i: r.rank for r in suffix_array(df).collect()}


def test_suffix_array_banana(spark):
    assert _sa_got(spark, "banana") == {6: 1, 4: 2, 2: 3, 1: 4, 5: 5, 3: 6}


def test_suffix_array_repetitive_text(spark):
    # long repeats force many doubling rounds; newline separator char
    s = ("the cat sat\n" * 20) + "on the mat\nthe cat sat on"
    assert _sa_got(spark, s) == _sa_ref(s)


def test_suffix_array_single_char_run(spark):
    # worst-case ties: every round until 2^k >= n stays fully tied
    s = "a" * 40
    assert _sa_got(spark, s) == _sa_ref(s)  # rank i+... = n-i ordering


def test_suffix_array_early_exit_round_count(spark):
    # all-distinct chars -> ranks unique after round 0: no joins needed
    s = "abcdefgh"
    got = _sa_got(spark, s, nparts=4)
    assert got == _sa_ref(s)
