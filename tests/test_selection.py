"""greedy_max_coverage vs a brute-force greedy reference."""
import re

import numpy as np
import pytest


def _grams(text, n):
    ws = re.split(r"\s+", text.lower())
    m = max(len(ws) - n, 0) + 1
    return {" ".join(ws[i:i + n]) for i in range(m)} - {""}


def _brute(texts, k, n):
    sets = {d: _grams(t, n) for d, t in texts.items()}
    covered, picked, rows = set(), set(), []
    for step in range(1, k + 1):
        best = None
        for d in sorted(sets):
            if d in picked:
                continue
            gain = len(sets[d] - covered)
            if gain > 0 and (best is None or gain > best[1]):
                best = (d, gain)
        if best is None:
            break
        d, gain = best
        picked.add(d)
        covered |= sets[d]
        rows.append((step, d, gain, len(covered)))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(60)]
    texts = {}
    for d in range(50):
        nw = int(rng.integers(5, 40))
        texts[d] = " ".join(rng.choice(vocab, nw))
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    return df, texts


@pytest.mark.parametrize("k,n", [(1, 1), (5, 1), (8, 2)])
def test_coverage_matches_bruteforce(corpus, k, n):
    from cartwright_spark.operators.selection import greedy_max_coverage
    df, texts = corpus
    got = [(r.step, r.doc_id, r.gain, r.covered_total)
           for r in greedy_max_coverage(df, k=k, gram_n=n)
           .orderBy("step").collect()]
    assert got == _brute(texts, k, n)


def test_coverage_early_stop(spark):
    """Three near-identical docs: once the vocabulary is covered the
    remaining rounds emit nothing."""
    from cartwright_spark.operators.selection import greedy_max_coverage
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "c b a")], ["doc_id", "text"])
    rows = greedy_max_coverage(df, k=10).orderBy("step").collect()
    assert [(r.step, r.doc_id, r.gain, r.covered_total)
            for r in rows] == [(1, 1, 3, 3)]


def test_coverage_submodular_gains_nonincreasing(corpus):
    from cartwright_spark.operators.selection import greedy_max_coverage
    df, _ = corpus
    gains = [r.gain for r in greedy_max_coverage(df, k=6, gram_n=2)
             .orderBy("step").collect()]
    assert gains == sorted(gains, reverse=True)   # classic greedy property


def test_coverage_guards(spark):
    from cartwright_spark.operators.selection import greedy_max_coverage
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        greedy_max_coverage(df, k=0)
