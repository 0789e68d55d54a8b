"""Viterbi decoding — operators/viterbi.py."""
import pytest


def _obs(spark, seqs):
    rows = [(sid, t + 1, o) for sid, os_ in seqs.items()
            for t, o in enumerate(os_)]
    return spark.createDataFrame(rows, "seq_id long, t int, obs long")


def _decode(spark, seqs, S=2, **kw):
    from cartwright_spark.operators.viterbi import viterbi_decode
    # toy model: init prefers state 0; trans rewards staying; emission
    # rewards state == obs
    return viterbi_decode(
        _obs(spark, seqs), S,
        init_w=lambda s: 1 if s == 0 else 0,
        trans_w=lambda sp, s: 2 if sp == s else 0,
        emit_w=lambda s, o: 5 if s == o else 0, **kw)


def test_viterbi_follows_emissions(spark):
    out = {r.seq_id: r for r in
           _decode(spark, {1: [0, 0, 1, 1]}).collect()}
    r = out[1]
    # emission bonus (5) dominates the stay bonus (2): path flips at t=3
    assert r.path == "0>0>1>1"
    assert r.best_state == 1
    # score: init 1 + emits 4*5 + stays at t2,t4 (2+2)
    assert r.score == 1 + 20 + 4


def test_viterbi_stickiness_smooths_noise(spark):
    from cartwright_spark.operators.viterbi import viterbi_decode
    # huge stay bonus: a single flipped observation cannot move the path
    out = viterbi_decode(
        _obs(spark, {7: [0, 1, 0, 0]}), 2,
        init_w=lambda s: 0,
        trans_w=lambda sp, s: 10 if sp == s else 0,
        emit_w=lambda s, o: 3 if s == o else 0).collect()[0]
    assert out.path == "0>0>0>0"


def test_viterbi_tiebreak_prefers_larger_state(spark):
    from cartwright_spark.operators.viterbi import viterbi_decode
    # totally symmetric model: every path scores the same -> the
    # larger-prev/larger-state tiebreak must pick all-3s
    out = viterbi_decode(
        _obs(spark, {1: [0, 0, 0]}), 4,
        init_w=lambda s: 0, trans_w=lambda sp, s: 0,
        emit_w=lambda s, o: 0).collect()[0]
    assert out.best_state == 3 and out.path == "3>3>3"
    assert out.score == 0


def test_viterbi_multiple_sequences_and_validation(spark):
    out = {r.seq_id: r.path
           for r in _decode(spark, {1: [0, 0], 2: [1, 1]}).collect()}
    assert out == {1: "0>0", 2: "1>1"}
    with pytest.raises(ValueError, match="n_states"):
        _decode(spark, {1: [0]}, S=1)
    with pytest.raises(Exception, match="max_len"):
        _decode(spark, {1: [0, 1, 0, 1]}, max_len=2).collect()
