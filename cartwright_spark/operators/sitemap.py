"""Sitemap ingest (sitemaps.org XML) — the crawl-frontier's URL
discovery source, companion to operators/robots.py (RFC 9309) and
operators/urltools.py (canonicalization).

`parse_sitemaps` explodes each <url> block of a urlset document into
(loc, lastmod, changefreq, priority) rows; `parse_sitemap_index`
explodes <sitemap><loc> children of an index document. Both are pure
regexp codegen — map-only explode, no shuffle, no UDFs — so ingest
parallelism equals input partitioning at any corpus size. The regexes
are deliberately RE2-compatible (non-greedy block capture, no
backreferences) so the DuckDB oracle can run the identical patterns.

Robustness semantics: blocks missing <loc> are dropped (a sitemap
entry without a URL is meaningless); missing optional tags yield NULL;
surrounding whitespace inside tag text is trimmed (the spec allows
it). Malformed XML simply yields however many well-formed <url>
blocks the regex finds — crawl-side forgiving parsing, like the
browser-grade HTML table extractor (operators/htmltables.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_URL_BLOCK = "<url>(.*?)</url>"
_SITEMAP_BLOCK = "<sitemap>(.*?)</sitemap>"


def _tag(block, name: str):
    v = F.regexp_extract(block, f"<{name}>\\s*(.*?)\\s*</{name}>", 1)
    return F.when(v == "", F.lit(None).cast("string")).otherwise(v)


def parse_sitemaps(df: DataFrame, id_col: str = "site_id",
                   xml_col: str = "xml") -> DataFrame:
    """-> (id, loc, lastmod, changefreq, priority): one row per
    well-formed <url> block carrying a <loc>."""
    blocks = (df.select(F.col(id_col).alias("id"),
                        F.explode(F.regexp_extract_all(
                            F.col(xml_col), F.lit(_URL_BLOCK), F.lit(1)))
                        .alias("b")))
    out = blocks.select(
        "id",
        _tag(F.col("b"), "loc").alias("loc"),
        _tag(F.col("b"), "lastmod").alias("lastmod"),
        _tag(F.col("b"), "changefreq").alias("changefreq"),
        _tag(F.col("b"), "priority").cast("double").alias("priority"))
    return out.where(F.col("loc").isNotNull())


def parse_sitemap_index(df: DataFrame, id_col: str = "site_id",
                        xml_col: str = "xml") -> DataFrame:
    """-> (id, child_loc, lastmod): one row per <sitemap> child of a
    sitemap-index document."""
    blocks = (df.select(F.col(id_col).alias("id"),
                        F.explode(F.regexp_extract_all(
                            F.col(xml_col), F.lit(_SITEMAP_BLOCK),
                            F.lit(1))).alias("b")))
    return (blocks.select(
        "id",
        _tag(F.col("b"), "loc").alias("child_loc"),
        _tag(F.col("b"), "lastmod").alias("lastmod"))
        .where(F.col("child_loc").isNotNull()))
