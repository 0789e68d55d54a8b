"""RAKE keyword extraction (operators/keywords.py) — pinned-value checks
on hand-computed examples (degree/freq arithmetic done on paper)."""

from cartwright_spark.operators.keywords import rake_keywords

M = 1_000_000


def _run(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {(r.doc_id, r.phrase): r for r in
            rake_keywords(docs, **kw).collect()}


def test_classic_two_phrase_scores(spark):
    # stopwords split "the ... over the ...": phrases
    # "quick brown fox jumps" (each word deg 4 freq 1 -> 4M; sum 16M)
    # and "lazy dog" (deg 2 freq 1 -> 2M; sum 4M)
    out = _run(spark, [(1, "The quick brown fox jumps over the lazy dog")])
    assert out[(1, "quick brown fox jumps")].score_micro == 16 * M
    assert out[(1, "quick brown fox jumps")].rank == 1
    assert out[(1, "lazy dog")].score_micro == 4 * M
    assert out[(1, "lazy dog")].n_words == 2


def test_adjacent_stopwords_both_delimit(spark):
    # "of the" adjacent: one replace pass would leave "the" inside
    out = _run(spark, [(1, "data of the maps")])
    assert set(p for _, p in out) == {"data", "maps"}


def test_punctuation_splits_phrases(spark):
    out = _run(spark, [(1, "alpha beta. gamma!")])
    assert set(p for _, p in out) == {"alpha beta", "gamma"}
    # alpha/beta: deg 2 freq 1 -> phrase 4M; gamma: 1M
    assert out[(1, "alpha beta")].score_micro == 4 * M
    assert out[(1, "gamma")].score_micro == 1 * M


def test_duplicate_phrase_counts_in_stats_once_in_output(spark):
    # "big data. big data" -> phrase "big data" twice: n_occurrences=2,
    # big: freq 2 deg 4 -> 2M; data: freq 2 deg 4 -> 2M; score 4M
    out = _run(spark, [(1, "big data. big data")])
    r = out[(1, "big data")]
    assert r.n_occurrences == 2
    assert r.score_micro == 4 * M
    assert len(out) == 1


def test_cross_doc_stats_shared(spark):
    # word stats are corpus-wide: "maps" appears alone in doc 1 and in a
    # 2-phrase in doc 2 -> freq 2, degree 1+2=3 -> wscore 1.5M
    out = _run(spark, [(1, "maps"), (2, "maps data")])
    assert out[(1, "maps")].score_micro == 1_500_000
    # doc 2 phrase: maps 1.5M + data (freq 1 deg 2 -> 2M) = 3.5M
    assert out[(2, "maps data")].score_micro == 3_500_000


def test_top_k_and_tiebreak(spark):
    text = "alpha. beta. gamma. delta. epsilon. zeta"
    out = _run(spark, [(1, text)], top_k=3)
    # six single-word phrases all score 1M; tie-break phrase asc
    assert sorted((r.rank, p) for (_, p), r in out.items()) == [
        (1, "alpha"), (2, "beta"), (3, "delta")]


# ------------------------------------------------------------- TextRank

def _py_textrank(texts, window=3, iters=10, d=0.85, min_len=3,
                 stopwords=()):
    import collections
    import re
    seqs = [[w for w in re.findall(r"[a-z]+", t.lower())
             if len(w) >= min_len and w not in stopwords] for t in texts]
    wt = collections.Counter()
    for seq in seqs:
        for i, a in enumerate(seq):
            for j in range(1, window + 1):
                if i + j < len(seq) and seq[i + j] != a:
                    wt[(a, seq[i + j])] += 1
                    wt[(seq[i + j], a)] += 1
    wdeg = collections.Counter()
    for (a, _), c in wt.items():
        wdeg[a] += c
    r = {w: 1.0 for w in wdeg}
    for _ in range(iters):
        nxt = {}
        for v in wdeg:
            s = sum(wt[(u, v)] / wdeg[u] * r[u]
                    for u in wdeg if (u, v) in wt)
            nxt[v] = (1 - d) + d * s
        r = nxt
    return wdeg, r


def test_textrank_brute_force_parity(spark):
    from cartwright_spark.operators.keywords import (
        RAKE_STOPWORDS, textrank_keywords)
    texts = ["the quick brown fox jumps over the lazy dog",
             "brown fox likes brown forest and quick brown paths",
             "lazy dog sleeps while quick fox jumps across the forest"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    wdeg, ranks = _py_textrank(texts, stopwords=RAKE_STOPWORDS)
    got = {r.word: (r.wdeg, r.rank)
           for r in textrank_keywords(docs).collect()}
    assert set(got) == set(wdeg)
    for w in wdeg:
        assert got[w][0] == wdeg[w]
        assert abs(got[w][1] - ranks[w]) < 1e-9


def test_textrank_hub_word_outranks_leaf(spark):
    from cartwright_spark.operators.keywords import textrank_keywords
    # 'core' co-occurs with everything; 'rare' once at the edge
    docs = spark.createDataFrame(
        [(1, "core alpha core beta core gamma core delta rare")],
        "doc_id long, text string")
    got = {r.word: r.rank for r in textrank_keywords(docs).collect()}
    assert got["core"] > got["rare"]


def test_textrank_validation_and_isolated_words(spark):
    import pytest
    from cartwright_spark.operators.keywords import textrank_keywords
    docs = spark.createDataFrame([(1, "solitary")],
                                 "doc_id long, text string")
    assert textrank_keywords(docs).count() == 0   # no pairs, no graph
    with pytest.raises(ValueError, match="window"):
        textrank_keywords(docs, window=0)
    with pytest.raises(ValueError, match="iters"):
        textrank_keywords(docs, iters=0)
