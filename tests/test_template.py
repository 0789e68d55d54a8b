"""DOM-structure template fingerprinting."""

from pyspark.sql import functions as F

from cartwright_spark.operators.template import dom_fingerprint, template_stats


def test_fingerprint_ignores_text_attrs_case_and_closers(spark):
    """Same skeleton, different text/attributes/case/self-closers ->
    same signature; different structure -> different signature."""
    pages = spark.createDataFrame([
        (1, '<HTML><Body class="x"><P id=1>hello</P></Body></HTML>'),
        (2, "<html><body><p>completely other words</p></body></html>"),
        (3, "<html><body><p>x</p><p>extra</p></body></html>"),
        (4, "<!-- c --><!DOCTYPE html><html><body><p>y</p></body></html>"),
    ], ["doc_id", "html"])
    fp = {r["doc_id"]: (r["dom_sig"], r["n_tags"])
          for r in dom_fingerprint(pages).collect()}
    assert fp[1] == fp[2] == fp[4]          # comments/doctype don't count
    assert fp[3] != fp[1]
    assert fp[1][1] == 3                    # html, body, p


def test_fingerprint_truncates_at_max_tags(spark):
    pages = spark.createDataFrame(
        [(1, "<a>" * 100), (2, "<a>" * 64), (3, "<a>" * 63)],
        ["doc_id", "html"])
    fp = {r["doc_id"]: (r["dom_sig"], r["n_tags"])
          for r in dom_fingerprint(pages, max_tags=64).collect()}
    assert fp[1] == fp[2]                   # both truncated to 64
    assert fp[3] != fp[1] and fp[3][1] == 63


def test_template_stats_counts_and_share(spark):
    pages = spark.createDataFrame(
        [(i, "<html><body><p>t%d</p></body></html>" % i) for i in range(6)]
        + [(10, "<html><body><ul><li>u</li></ul></body></html>"),
           (11, "<html><body><ul><li>v</li></ul></body></html>")],
        ["doc_id", "html"])
    out = {r["n_pages"]: r for r in
           template_stats(dom_fingerprint(pages)).collect()}
    assert set(out) == {6, 2}
    assert out[6]["exemplar"] == 0 and out[2]["exemplar"] == 10
    assert abs(out[6]["share"] - 0.75) < 1e-9
    assert abs(out[2]["share"] - 0.25) < 1e-9
