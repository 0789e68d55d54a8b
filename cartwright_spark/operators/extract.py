"""HTML → text extraction: deterministic, byte-identical per url.

Per-row invariant (BASELINE.json input_hint): the extracted text is a pure
function of the html bytes — same url/html always yields byte-identical
text, locked by sha256 golden tests.

Two implementations with identical output, cross-validated by tests:

* ``extract_text_col`` — pure JVM column expressions (decode +
  regexp_replace chain). THE default hot path. Measured on this box:
  shipping the wide html/binary column through Arrow to a pandas UDF
  anti-scales badly (3M pages: 6.7s @ local[8] → 30.4s @ local[32] for a
  trivial UDF), while the same work as JVM expressions scales 9.2s → 3.9s.
  Rule of thumb baked into this engine: never move wide payloads across
  the Arrow boundary; Python UDFs only ever see narrow columns.
* ``extract_text_series`` / ``extract_text_udf`` — the pandas form, used
  for parity testing and as the slot where a real boilerplate-removal
  library would plug in.

Extraction rules (fixed, versioned by EXTRACTOR_VERSION):
  1. decode utf-8 (malformed bytes → U+FFFD, both engines)
  2. drop <script>/<style>/<title> blocks
  3. drop boilerplate containers <nav>/<header>/<footer>/<aside>
  4. strip remaining tags, unescape the core entities
  5. collapse whitespace runs to single spaces, strip ends
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EXTRACTOR_VERSION = 3

# one alternation pass: boilerplate blocks (lazy to their close tag) OR any
# single tag — fewer intermediate strings than sequential passes, which
# matters because regex extraction is memory-bandwidth-bound at scale
_MARKUP_RE = (r"(?is)<(script|style|title|nav|header|footer|aside)\b.*?</\1>"
              r"|<[^>]*>")
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&copy;", "(c)"), ("&#39;", "'")]


def extract_text_col(html: Column) -> Column:
    """JVM-expression extractor (whole-stage codegen, no Python)."""
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, _MARKUP_RE, " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def extract_text_series(html: pd.Series) -> pd.Series:
    """pandas reference implementation (identical output; parity-tested)."""
    s = html.map(lambda b: b.decode("utf-8", errors="replace")
                 if isinstance(b, (bytes, bytearray)) else str(b))
    s = s.str.replace(_MARKUP_RE, " ", regex=True)
    for ent, rep in _ENTITIES:
        s = s.str.replace(ent, rep, regex=False)
    s = s.str.replace(r"\s+", " ", regex=True).str.strip()
    return s


def extract_text_udf():
    # created lazily: pandas_udf type parsing needs an active SparkSession
    @pandas_udf("string")
    def f(html: pd.Series) -> pd.Series:
        return extract_text_series(html)
    return f


def extract_pages(pages: DataFrame, html_col: str = "html",
                  out_col: str = "extracted_text",
                  use_jvm: bool = True) -> DataFrame:
    """pages(+html) → pages + extracted text + sha256 content hash."""
    if use_jvm:
        out = pages.withColumn(out_col, extract_text_col(F.col(html_col)))
    else:
        out = pages.withColumn(out_col, extract_text_udf()(F.col(html_col)))
    return out.withColumn("text_sha256", F.sha2(F.col(out_col), 256))


# head-metadata extraction patterns — RE2-safe (no backrefs/lookaround)
# so the DuckDB oracle can replay them verbatim
_META_PATTERNS = {
    "title": "<title>([^<]*)</title>",
    "description": '<meta name="description" content="([^"]*)"',
    "og_title": '<meta property="og:title" content="([^"]*)"',
    "canonical": '<link rel="canonical" href="([^"]*)"',
    "page_lang": '<html lang="([^"]*)"',
}


def extract_meta(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Head-metadata extraction: title / meta-description / og:title /
    canonical link / html lang, each a single regexp_extract over the
    page — one shuffle-free codegen projection, '' when absent (both
    engines), plus has_canonical and title_len diagnostics.

    The canonical URL is what the dedup tier's canonical_pick prefers
    when present; og/description feed the snippet and quality layers.
    Like extract_text_col above, this deliberately stays JVM-side: the
    wide html column never crosses the Arrow boundary.
    """
    h = F.col(html_col)
    out = pages
    for name, pat in _META_PATTERNS.items():
        out = out.withColumn(name, F.regexp_extract(h, pat, 1))
    return (out
            .withColumn("has_canonical",
                        (F.col("canonical") != "").cast("int"))
            .withColumn("title_len", F.length("title").cast("int")))
