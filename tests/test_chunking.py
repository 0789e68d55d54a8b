"""passage_chunks vs a brute-force window reference."""
import re

import numpy as np
import pytest


def _brute(texts, size, stride):
    rows = []
    for d, t in texts.items():
        ws = [w for w in re.split(r"\s+", t) if w]
        n = len(ws)
        if n == 0:
            continue
        nc = 1 if n <= size else (n - size + stride - 1) // stride + 1
        for i in range(nc):
            s = i * stride
            rows.append((d, i, s, min(size, n - s),
                         " ".join(ws[s:s + size])))
    return sorted(rows)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(3)
    texts = {}
    for d in range(40):
        nw = int(rng.integers(0, 200))        # includes empty docs
        texts[d] = " ".join(f"t{rng.integers(0, 50)}" for _ in range(nw))
    texts[100] = "one"                        # single token
    texts[101] = " ".join(str(i) for i in range(64))   # exact boundary
    texts[102] = " ".join(str(i) for i in range(65))   # boundary + 1
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    return df, texts


@pytest.mark.parametrize("size,stride", [(64, 48), (10, 10), (24, 16),
                                         (5, 1)])
def test_chunks_match_bruteforce(corpus, size, stride):
    from cartwright_spark.operators.chunking import passage_chunks
    df, texts = corpus
    got = sorted((r.id, r.chunk_idx, r.start_tok, r.n_tokens, r.chunk_text)
                 for r in passage_chunks(df, size=size,
                                         stride=stride).collect())
    assert got == _brute(texts, size, stride)


def test_chunks_coverage_no_gaps(corpus):
    """Every token index of every doc is inside >= 1 window."""
    from cartwright_spark.operators.chunking import passage_chunks
    df, texts = corpus
    spans = {}
    for r in passage_chunks(df, size=24, stride=16).collect():
        spans.setdefault(r.id, []).append((r.start_tok,
                                           r.start_tok + r.n_tokens))
    for d, t in texts.items():
        n = len([w for w in re.split(r"\s+", t) if w])
        if n == 0:
            assert d not in spans
            continue
        covered = set()
        for s, e in spans[d]:
            covered.update(range(s, e))
        assert covered == set(range(n)), d


def test_chunks_guards(spark):
    from cartwright_spark.operators.chunking import passage_chunks
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    for size, stride in [(0, 1), (5, 0), (5, 6)]:
        with pytest.raises(ValueError):
            passage_chunks(df, size=size, stride=stride)
