"""parse_sitemaps / parse_sitemap_index edge cases."""
import pytest


def test_parse_sitemaps_blocks_and_nulls(spark):
    from cartwright_spark.operators.sitemap import parse_sitemaps
    xml = ("<urlset>"
           "<url><loc> https://a.com/1 </loc>"
           "<lastmod>2026-01-02</lastmod><priority>0.8</priority></url>"
           "<url><loc>https://a.com/2</loc>"
           "<changefreq>daily</changefreq></url>"
           "<url><lastmod>2026-01-01</lastmod></url>"   # no loc: dropped
           "<url><loc>/rel/3</loc></url>"
           "</urlset>")
    df = spark.createDataFrame([(7, xml)], "site_id long, xml string")
    rows = sorted(
        (r.loc, r.lastmod, r.changefreq, r.priority)
        for r in parse_sitemaps(df).collect())
    assert rows == [
        ("/rel/3", None, None, None),
        ("https://a.com/1", "2026-01-02", None, 0.8),
        ("https://a.com/2", None, "daily", None),
    ]


def test_parse_sitemaps_malformed_and_empty(spark):
    from cartwright_spark.operators.sitemap import parse_sitemaps
    df = spark.createDataFrame(
        [(1, "not xml at all"), (2, "<urlset></urlset>"),
         (3, "<url><loc>https://x.com</loc>")],   # unterminated block
        "site_id long, xml string")
    assert parse_sitemaps(df).count() == 0


def test_parse_sitemap_index(spark):
    from cartwright_spark.operators.sitemap import parse_sitemap_index
    xml = ("<sitemapindex>"
           "<sitemap><loc>https://a.com/s1.xml</loc>"
           "<lastmod>2026-02-01</lastmod></sitemap>"
           "<sitemap><loc>https://a.com/s2.xml</loc></sitemap>"
           "<sitemap><lastmod>2026-02-02</lastmod></sitemap>"
           "</sitemapindex>")
    df = spark.createDataFrame([(1, xml)], "site_id long, xml string")
    rows = sorted((r.child_loc, r.lastmod)
                  for r in parse_sitemap_index(df).collect())
    assert rows == [("https://a.com/s1.xml", "2026-02-01"),
                    ("https://a.com/s2.xml", None)]
