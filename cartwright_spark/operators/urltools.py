"""URL canonicalization + registered-domain extraction — the first
normalization pass of any Common-Crawl-style pipeline (dedup keys, domain
caps, and host-graph edges all key on the canonical URL / registered
domain, so this runs once per page at full corpus width).

Everything is pure JVM column expressions (regexp_extract/replace, split,
element_at) — no Python in the hot path, whole-stage-codegen'd, and every
regex is written in the Java∩RE2 portable subset (no lookaround, no
backreferences) so a DuckDB oracle re-derives the result value-for-value
(the same portability contract operators/hygiene.py established).

Canonicalization (the conservative, widely-agreed subset — nothing that
changes which resource the URL names):
  - scheme and host lowercased (path/query case is preserved — it is
    significant on most origin servers)
  - fragment stripped (never sent to the server)
  - default ports dropped (:80 for http, :443 for https)
  - leading ``www.`` dropped from the host
  - tracking parameters removed (utm_*, gclid, fbclid) with ``&``-sentinel
    surgery so separators stay consistent
  - empty path normalized to ``/``

Registered domain: suffix-list match (longest first) over a built-in set
of multi-label public suffixes (co.uk and friends) falling back to the
last two labels. The real public-suffix list is ~9k rules; the mechanism
here is the broadcast-free expression form — swap the SUFFIX2 tuple for
the full list (or a broadcast dim join at that size) without touching
callers.

Reference parity: jataware/cartwright has no URL layer; this serves the
web-corpus scope of the brief (BASELINE.json input_hint: pages keyed by
url).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# multi-label public suffixes recognized ahead of the 2-label fallback.
# Deliberately a short built-in subset — see module docstring.
SUFFIX2 = ("co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au",
           "org.au", "co.jp", "or.jp", "ne.jp", "com.br", "com.cn",
           "com.mx", "co.in", "co.kr", "co.za", "com.ar", "com.tr")

TRACKING_RE = "&(utm_[^=&]*|gclid|fbclid)=[^&]*"

_URL_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)"


def url_parts(url: Column) -> dict[str, Column]:
    """Split a URL into scheme/authority/path/query columns (fragment is
    discarded by the parse itself)."""
    u = F.trim(url)
    return {
        "scheme": F.lower(F.regexp_extract(u, _URL_RE, 1)),
        "authority": F.lower(F.regexp_extract(u, _URL_RE, 2)),
        "path": F.regexp_extract(u, _URL_RE, 3),
        "query": F.regexp_extract(u, _URL_RE, 4),
    }


def _strip_default_port(authority: Column, scheme: Column) -> Column:
    return (F.when((scheme == "http") & authority.endswith(":80"),
                   F.substring(authority, 1, F.length(authority) - 3))
            .when((scheme == "https") & authority.endswith(":443"),
                  F.substring(authority, 1, F.length(authority) - 4))
            .otherwise(authority))


def host_of(authority: Column, scheme: Column) -> Column:
    """Lowercased host with default port and leading www. removed."""
    h = _strip_default_port(authority, scheme)
    return F.when(h.startswith("www."), F.substring(h, 5, 2 ** 30)) \
            .otherwise(h)


def clean_query(query: Column) -> Column:
    """Remove tracking params; keep remaining params in original order."""
    q = F.regexp_replace(F.concat(F.lit("&"), query), TRACKING_RE, "")
    # drop the sentinel (and a now-leading separator, if any)
    q = F.regexp_replace(q, "^&+", "")
    return q


def registered_domain(host: Column) -> Column:
    """eTLD+1 via longest-suffix match over SUFFIX2, else last 2 labels.
    Hosts with fewer labels than the matched suffix + 1 (bare TLDs,
    dotless hosts) fall through to the host itself.

    Pure regex tail-extraction (no array indexing — ANSI-safe, and the
    identical pattern runs under DuckDB's RE2 for the oracle)."""
    last2 = F.regexp_extract(host, "[^.]+[.][^.]+$", 0)
    last3 = F.regexp_extract(host, "[^.]+[.][^.]+[.][^.]+$", 0)
    is2 = last2.isin(*SUFFIX2)
    return (F.when(is2 & (last3 != ""), last3)
            .when(last2 != "", last2)
            .otherwise(host))


HREF_RE = 'href="([^"]*)"'


def extract_links(df: DataFrame, html_col: str = "html",
                  out_col: str = "link") -> DataFrame:
    """Explode every double-quoted href value out of an HTML column —
    one output row per (page row, link). Pure JVM regexp_extract_all +
    explode; rows with no links disappear (inner explode), matching the
    edge-list semantics downstream graph ops want."""
    return df.withColumn(
        out_col,
        F.explode(F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), 1)))


def host_edges(pages: DataFrame, url_col: str = "url",
               html_col: str = "html") -> DataFrame:
    """(src_host, dst_host, n_links): the host-level link graph of a page
    table — outlinks extracted from html, both endpoints canonicalized
    with the same normalization as normalize_urls, self-links dropped,
    multi-links collapsed into a weight.

    Scale shape: extract + normalize are narrow codegen'd stages; the
    only shuffle is the final (src_host, dst_host) count — algebraic, so
    map-side partial agg absorbs hub-page skew. This is the input the
    graph layer (functions/graph.py pagerank / connected_components)
    consumes at corpus scale."""
    links = extract_links(pages.select(url_col, html_col), html_col)
    src = normalize_urls(links.select(F.col(url_col).alias("u"),
                                      "link"), "u") \
        .select(F.col("host").alias("src_host"), "link")
    both = normalize_urls(src, "link") \
        .select("src_host", F.col("host").alias("dst_host"))
    return (both.where(F.col("src_host") != F.col("dst_host"))
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").alias("n_links")))


def normalize_urls(df: DataFrame, url_col: str = "url",
                   out_col: str = "url_norm") -> DataFrame:
    """Append (out_col, host, registered_domain) to df.

    Scale shape: narrow map-only stage, fully codegen'd — no shuffle, no
    UDF, no dictionary lookup; the suffix set folds into an IN literal.
    At 10^12 pages this is scan-bound, which is the correct bound."""
    p = url_parts(F.col(url_col))
    hostport = host_of(p["authority"], p["scheme"])  # keeps :8080 etc.
    host = F.regexp_replace(hostport, ":[0-9]+$", "")
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    q = clean_query(p["query"])
    norm = F.concat(
        p["scheme"], F.lit("://"), hostport, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
    return (df.withColumn(out_col, norm)
            .withColumn("host", host)
            .withColumn("registered_domain", registered_domain(host)))


# anchor pattern: two aligned capture groups (href value, inner text) —
# lazy body group, (?is) portable to both Java regex and DuckDB RE2,
# no backreferences
ANCHOR_RE = r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'

# minimal anchor stopword set (shared verbatim by the DuckDB oracle)
ANCHOR_STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "for",
                    "on", "with", "is", "at", "by", "or", "click", "here")


def anchor_text_index(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """(dst_host, term) → (n_pages, n_anchors): the anchor-text index —
    what OTHER pages' link text says about each host. A ranking /
    host-quality staple (anchor terms are the strongest off-page signal
    in classic web IR) and a curation feature at corpus scale.

    Plan shape (10^12 pages): the two capture groups are extracted as
    ALIGNED arrays from one shared regex (regexp_extract_all twice +
    posexplode/element_at — zero Python, one pass over html); anchor
    fragments normalize through the same clean_html_text chain as table
    cells; link hosts canonicalize through the same normalize_urls layer
    as every other URL consumer. The only shuffle is the final
    (dst_host, term) aggregate — n_anchors is algebraic, n_pages is a
    two-phase distinct that partial-aggregates per mapper, so hub-host /
    common-term skew is absorbed map-side.
    """
    from cartwright_spark.operators.tables import clean_html_text

    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE),
                                 F.lit(1))
    texts = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE),
                                 F.lit(2))
    pairs = (pages
             .select(F.col(url_col).alias("u"), texts.alias("ts"),
                     F.posexplode(hrefs).alias("p", "link"))
             .select("u", "link",
                     clean_html_text(
                         F.element_at("ts", F.col("p") + 1))
                     .alias("anchor")))
    hosts = normalize_urls(pairs, "link") \
        .select("u", F.col("host").alias("dst_host"), "anchor")
    terms = (hosts
             .select("u", "dst_host",
                     F.explode(F.split(F.lower("anchor"), "[^a-z]+"))
                     .alias("term"))
             .where((F.col("term") != "")
                    & ~F.col("term").isin(*ANCHOR_STOPWORDS)))
    return (terms.groupBy("dst_host", "term")
            .agg(F.countDistinct("u").alias("n_pages"),
                 F.count("*").alias("n_anchors")))


def path_templates(df: DataFrame, host_col: str = "host",
                   path_col: str = "path") -> DataFrame:
    """URL path template mining — collapse dynamic path segments so the
    crawl's URL space rolls up to its ROUTE structure: /article/8231 and
    /article/77 are one template /article/{n}. The crawl-planning use:
    a template with 10^6 distinct paths and near-identical content is a
    pagination/calendar trap (crawler-trap detection); templates also
    drive per-route sampling caps (the operators/sampling.py domain-cap
    idea one level finer than the host).

    Segment rules (deterministic, RE2-safe — no lookarounds, so ONE
    shared convention in both engines):
      all-digit segment                  -> {n}
      >= 8 chars of [0-9a-f-] (hex/uuid) -> {id}
      otherwise                          -> kept verbatim

    -> (host, template, n_urls, n_paths, example_path): row count,
    DISTINCT path count, and the lexicographic-min path as the exact
    deterministic exemplar.

    Scale shape (the 100 TB audit): templating is pure per-row codegen
    (split -> transform -> array_join); the rollup is ONE shuffle on
    (host, template) with algebraic count/min partials; the distinct
    path count rides the same exchange as a two-level agg (distinct on
    (host, template, path) map-side first), never a second corpus pass.
    """
    seg = F.split(F.col(path_col), "/")
    tpl = F.array_join(
        F.transform(
            seg,
            lambda s: F.when(s.rlike("^[0-9]+$"), F.lit("{n}"))
                       .when(s.rlike("^[0-9a-f-]{8,}$"), F.lit("{id}"))
                       .otherwise(s)),
        "/")
    base = df.select(F.col(host_col).alias("host"),
                     F.col(path_col).alias("path"),
                     tpl.alias("template"))
    per_path = (base.groupBy("host", "template", "path")
                .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    return (per_path.groupBy("host", "template")
            .agg(F.sum("c").alias("n_urls"),
                 F.count(F.lit(1)).cast("bigint").alias("n_paths"),
                 F.min("path").alias("example_path")))
