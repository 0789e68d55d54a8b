

def test_extract_meta_fields(spark):
    from cartwright_spark.operators.extract import extract_meta
    html = ('<html lang="en"><head><title>Hello World</title>'
            '<meta name="description" content="a page about things">'
            '<meta property="og:title" content="OG Hello">'
            '<link rel="canonical" href="https://ex.com/canon">'
            '</head><body>x</body></html>')
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = extract_meta(df).collect()[0]
    assert r.title == "Hello World" and r.title_len == 11
    assert r.description == "a page about things"
    assert r.og_title == "OG Hello"
    assert r.canonical == "https://ex.com/canon" and r.has_canonical == 1
    assert r.page_lang == "en"


def test_extract_meta_absent_fields_are_empty(spark):
    from cartwright_spark.operators.extract import extract_meta
    df = spark.createDataFrame([(1, "<html><body>bare</body></html>")],
                               "doc_id long, html string")
    r = extract_meta(df).collect()[0]
    assert (r.title, r.description, r.og_title, r.canonical,
            r.page_lang) == ("", "", "", "", "")
    assert r.has_canonical == 0 and r.title_len == 0


def test_extract_meta_shuffle_free(spark):
    from cartwright_spark.operators.extract import extract_meta
    df = spark.createDataFrame([(1, "<title>t</title>")],
                               "doc_id long, html string")
    plan = extract_meta(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
