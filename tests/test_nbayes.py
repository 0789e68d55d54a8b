"""Multinomial Naive Bayes — operators/nbayes.py."""
import math

import pytest


def _tokens(spark, rows, with_label=True):
    schema = ("doc_id long, label string, token string" if with_label
              else "doc_id long, token string")
    return spark.createDataFrame(rows, schema)


def test_nb_matches_hand_computation(spark):
    from cartwright_spark.operators.nbayes import naive_bayes_classify
    # class A: tokens {x, x, y}; class B: tokens {z, z, y}
    train = _tokens(spark, [
        (1, "A", "x"), (1, "A", "x"), (1, "A", "y"),
        (2, "B", "z"), (2, "B", "z"), (2, "B", "y")])
    score = _tokens(spark, [(10, "x"), (10, "y")], with_label=False)
    out = naive_bayes_classify(train, score).collect()
    assert len(out) == 1 and out[0].pred == "A"
    # hand-rolled: V=3, T_A=T_B=3, prior=1/2
    def s(cx, cy):
        return (math.log(0.5) - 2 * math.log(3 + 3)
                + math.log(cx + 1) + math.log(cy + 1))
    assert out[0].score == pytest.approx(s(2, 1), rel=1e-12)
    # and the losing class would have scored s(0, 1) < s(2, 1)
    assert s(0, 1) < s(2, 1)


def test_nb_unseen_tokens_dont_crash_or_bias(spark):
    from cartwright_spark.operators.nbayes import naive_bayes_classify
    train = _tokens(spark, [(1, "A", "x"), (2, "B", "z")])
    # 'q' appears in NO class: contributes ln(0+1)=0 to both scores
    score = _tokens(spark, [(10, "q"), (10, "x")], with_label=False)
    out = naive_bayes_classify(train, score).collect()
    assert out[0].pred == "A"


def test_nb_prior_decides_empty_evidence(spark):
    from cartwright_spark.operators.nbayes import naive_bayes_classify
    # B has 3 training docs, A has 1 -> prior favours B for a doc of
    # only-unseen tokens (equal T_l keeps ln_denom symmetric)
    train = _tokens(spark, [
        (1, "A", "x"), (2, "B", "z"), (3, "B", "z"), (4, "B", "z")])
    score = _tokens(spark, [(10, "unseen")], with_label=False)
    out = naive_bayes_classify(train, score).collect()
    assert out[0].pred == "B"


def test_nb_scores_multiple_docs_independently(spark):
    from cartwright_spark.operators.nbayes import naive_bayes_classify
    train = _tokens(spark, [
        (1, "en", "the"), (1, "en", "cat"),
        (2, "fr", "le"), (2, "fr", "chat")])
    score = _tokens(spark, [(10, "the"), (11, "le"), (11, "chat")],
                    with_label=False)
    preds = {r.doc_id: r.pred
             for r in naive_bayes_classify(train, score).collect()}
    assert preds == {10: "en", 11: "fr"}


def test_nb_no_window_no_collect_in_plan(spark):
    from cartwright_spark.operators.nbayes import naive_bayes_classify
    train = _tokens(spark, [(1, "A", "x"), (2, "B", "z")])
    score = _tokens(spark, [(10, "x")], with_label=False)
    plan = (naive_bayes_classify(train, score)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan       # argmax is max(struct), not rank
