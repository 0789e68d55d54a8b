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
