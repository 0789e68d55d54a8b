"""C4-style curation filters — operators/curation_filters.py."""


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lines array<string>")


def test_c4_line_rules(spark):
    from cartwright_spark.operators.curation_filters import c4_filter
    df = _pages(spark, [
        (0, ["This line is a keeper.",
             "Too short.",                      # 2 words
             "no terminal punctuation here",
             "Ends with a question mark, also kept?",
             "this one mentions JavaScript widgets everywhere.",
             "Another perfectly good sentence right here!",
             'A quoted ending counts too."']),
    ])
    row = c4_filter(df).collect()[0]
    assert row.n_lines == 7
    assert row.n_kept == 4
    assert row.clean_text.split("\n") == [
        "This line is a keeper.",
        "Ends with a question mark, also kept?",
        "Another perfectly good sentence right here!",
        'A quoted ending counts too."',
    ]
    assert row.has_lorem == 0 and row.has_brace == 0
    # only 4 surviving sentences < default min of 5 -> page dropped
    assert row.keep == 0


def test_c4_page_rules(spark):
    from cartwright_spark.operators.curation_filters import c4_filter
    good = ["Sentence number %d is long enough." % i for i in range(6)]
    df = _pages(spark, [
        (1, good),
        (2, good + ["We embed Lorem Ipsum filler."]),
        (3, good + ["var f = function() {"]),
    ])
    out = {r.doc_id: r for r in c4_filter(df).collect()}
    assert out[1].keep == 1 and out[1].n_kept == 6
    assert out[2].keep == 0 and out[2].has_lorem == 1
    assert out[3].keep == 0 and out[3].has_brace == 1


def test_c4_thresholds_and_empty(spark):
    from cartwright_spark.operators.curation_filters import c4_filter
    df = _pages(spark, [(9, []),
                        (10, ["One two three four five six, fine."])])
    out = {r.doc_id: r
           for r in c4_filter(df, min_sentences=1).collect()}
    assert out[9].n_lines == 0 and out[9].keep == 0
    assert out[9].clean_text == ""
    assert out[10].keep == 1
    # raising the per-line word floor drops the 7-word line
    strict = c4_filter(_pages(spark,
                              [(10, ["One two three, fine."])]),
                       min_line_words=8, min_sentences=1).collect()[0]
    assert strict.n_kept == 0


def test_c4_plan_is_shuffle_free(spark):
    from cartwright_spark.operators.curation_filters import c4_filter
    df = _pages(spark, [(0, ["A line that should be kept, yes."])])
    plan = c4_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
