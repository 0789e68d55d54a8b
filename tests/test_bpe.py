"""bpe_merges / bpe_encode vs a brute-force reference implementation.

The reference is the textbook Sennrich trainer: word-frequency dict,
adjacency pair counts, argmax with (count DESC, a, b) tie-break, greedy
left-to-right non-overlapping merge per word.
"""
import collections
import re

import numpy as np
import pytest


def _apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _brute_bpe(texts, rounds):
    wf = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if re.fullmatch(r"[a-z]{2,}", w):
                wf[w] += 1
    vocab = {w: list(w) for w in wf}
    out = []
    for step in range(1, rounds + 1):
        pc = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((step, a, b, a + b, cnt))
        for w in vocab:
            vocab[w] = _apply(vocab[w], a, b)
    return out, vocab, wf


@pytest.fixture(scope="module")
def corpus(spark):  # noqa: F811
    rng = np.random.default_rng(17)
    alphabet = list("abcde")
    texts = []
    for _ in range(80):
        words = []
        for _ in range(rng.integers(3, 12)):
            n = int(rng.integers(2, 9))
            words.append("".join(rng.choice(alphabet, n)))
        # sprinkle non-word tokens the filter must drop
        words.append("X9!")
        words.append("a")          # too short
        texts.append(" ".join(words))
    texts.append("the theme thesis the other theory aaa aaaa")
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    return df, texts


@pytest.mark.parametrize("rounds", [1, 4, 10])
def test_bpe_merges_matches_bruteforce(corpus, rounds):
    from cartwright_spark.operators.bpe import bpe_merges
    df, texts = corpus
    got = [(r.step, r.sym_a, r.sym_b, r.merged, r.pair_count)
           for r in bpe_merges(df, rounds=rounds)
           .orderBy("step").collect()]
    want, _, _ = _brute_bpe(texts, rounds)
    assert got == want


def test_bpe_run_semantics(spark):  # noqa: F811
    """'aaa' + pair (a,a): adjacency count 2, but greedy merge yields
    [aa, a] — the non-overlapping cover, not a chain."""
    from cartwright_spark.operators.bpe import bpe_merges
    df = spark.createDataFrame([(1, "aaa aaa bb")], ["doc_id", "text"])
    rows = bpe_merges(df, rounds=2).orderBy("step").collect()
    assert (rows[0].sym_a, rows[0].sym_b, rows[0].pair_count) == ("a", "a", 4)
    # after merging: each 'aaa' -> [aa, a]; pairs now (aa,a) x2, (b,b) x1
    assert (rows[1].sym_a, rows[1].sym_b, rows[1].pair_count) == ("aa", "a", 2)


def test_bpe_encode_matches_reference_apply(corpus):
    from cartwright_spark.operators.bpe import bpe_merges, bpe_encode
    df, texts = corpus
    rules = [(r.sym_a, r.sym_b)
             for r in bpe_merges(df, rounds=6).orderBy("step").collect()]
    got = {r.doc_id: r.bpe_tokens
           for r in bpe_encode(df, rules).select("doc_id", "bpe_tokens")
           .collect()}
    for i, t in enumerate(texts):
        want = []
        for w in re.split(r"\s+", t.lower()):
            if not re.fullmatch(r"[a-z]{2,}", w):
                continue
            syms = list(w)
            for a, b in rules:
                syms = _apply(syms, a, b)
            want.extend(syms)
        assert got[i] == want, f"doc {i}"


def test_bpe_partition_invariance(corpus):
    """Same merge table whatever the physical layout — the pair-count
    agg and argmax are layout-free."""
    from cartwright_spark.operators.bpe import bpe_merges
    df, _ = corpus
    a = bpe_merges(df.repartition(1), rounds=5).orderBy("step").collect()
    b = bpe_merges(df.repartition(17, "doc_id"), rounds=5) \
        .orderBy("step").collect()
    assert a == b


def test_bpe_guards(spark):  # noqa: F811
    from cartwright_spark.operators.bpe import bpe_merges
    df = spark.createDataFrame([(1, "ab ab")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bpe_merges(df, rounds=0)
    # fewer possible merges than rounds: stop early, no crash
    rows = bpe_merges(df, rounds=50).collect()
    assert 1 <= len(rows) <= 2
