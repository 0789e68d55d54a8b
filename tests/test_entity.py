"""Fellegi-Sunter record linkage vs a brute-force reference."""
import math

import pytest


def _lev(a, b):
    if a is None or b is None:
        return 10**9
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def test_fs_weights_math_and_guards():
    from cartwright_spark.operators.entity import fs_weights
    wa, wd = fs_weights(0.9, 0.1)
    assert wa == pytest.approx(math.log2(9))
    assert wd == pytest.approx(math.log2(0.1 / 0.9))
    for m, u in [(0.5, 0.5), (0.1, 0.9), (1.0, 0.1), (0.9, 0.0)]:
        with pytest.raises(ValueError):
            fs_weights(m, u)


def test_fs_match_pairs_matches_bruteforce(spark):
    from cartwright_spark.operators.entity import fs_match_pairs, fs_weights
    wa_n, wd_n = fs_weights(0.95, 0.01)
    wa_e, wd_e = fs_weights(0.9, 0.05)
    A = [(1, 10, "alice", "x@a"), (2, 10, "bob", "b@b"),
         (3, 20, "carol", "c@c"), (4, 20, "dave", None)]
    B = [(101, 10, "alicf", "x@a"),   # name lev 1 + email exact -> match
         (102, 10, "bobby", "b@b"),   # name lev 2, email exact
         (103, 20, "carol", "zzz"),   # name exact, email differs
         (104, 30, "alice", "x@a")]   # different block: never compared
    a = spark.createDataFrame(A, "id_a long, blk int, name string, em string")
    b = spark.createDataFrame(B, "id_b long, blk int, name string, em string")
    fields = [("name", "name", 1, wa_n, wd_n), ("em", "em", 0, wa_e, wd_e)]
    got = {(r.id_a, r.id_b): r.score
           for r in fs_match_pairs(a, b, "blk", fields,
                                   threshold=-100.0).collect()}
    want = {}
    for ia, ba, na, ea in A:
        for ib, bb, nb, eb in B:
            if ba != bb:
                continue
            s = (wa_n if _lev(na, nb) <= 1 else wd_n) \
                + (wa_e if (ea is not None and ea == eb) else wd_e)
            want[(ia, ib)] = s
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # threshold keeps only the both-fields-agree pair:
    # (1,101) = 6.57+4.17; (3,103) name-only = 6.57-3.25 < 5
    hi = {(r.id_a, r.id_b)
          for r in fs_match_pairs(a, b, "blk", fields,
                                  threshold=5.0).collect()}
    assert hi == {(1, 101)}


def test_fs_guards(spark):
    from cartwright_spark.operators.entity import fs_match_pairs
    df = spark.createDataFrame([(1, 1, "x")], "id_a long, blk int, v string")
    with pytest.raises(ValueError):
        fs_match_pairs(df, df, "blk", [], 0.0)
