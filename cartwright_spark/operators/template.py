"""DOM-structure template detection over crawl HTML.

Boilerplate *line* removal (operators/hygiene.py) catches repeated text;
template detection catches repeated STRUCTURE — pages stamped from the
same CMS template whose text differs but whose tag skeleton is identical.
Corpus curation uses it two ways: cap per-template page counts before
near-dup (a 10^8-page template flood would otherwise swamp MinHash
buckets), and spot machine-generated spam farms (enormous template
groups with near-zero text variance).

The fingerprint is deliberately cheap and exact: the ordered sequence of
opening-tag NAMES (lowercased, attributes and text stripped), truncated
to a fixed prefix, md5-hashed. Pure whole-stage-codegen
(regexp_extract_all + concat_ws + md5) — no parse tree, no Python. The
rollup is ONE (signature) shuffle with map-side partials; the corpus
share denominator is a 1-row aggregate broadcast back (no driver path).

Reference parity note: cartwright has no HTML layer (it reads CSVs,
cartwright/categorize.py:48); this extends the engine's crawl-side
surface the north star asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# an opening tag's NAME: '<' + ascii letter + alnum run. Closing tags
# ('</'), comments ('<!--'), doctype ('<!') and PIs ('<?') all fail the
# [a-z] first-char test. RE2 ∩ Java syntax so Spark and DuckDB agree.
_TAG_RE = "<([a-z][a-z0-9]*)"


def dom_fingerprint(pages: DataFrame, id_col: str = "doc_id",
                    html_col: str = "html",
                    max_tags: int = 512) -> DataFrame:
    """Per-page structural fingerprint: (id, dom_sig, n_tags).

    ``n_tags`` counts the tags that fed the hash (<= max_tags), so a
    truncated skeleton is distinguishable from a naturally short one.
    """
    tags = F.slice(
        F.regexp_extract_all(F.lower(F.col(html_col)), F.lit(_TAG_RE), 1),
        1, max_tags)
    return pages.select(
        F.col(id_col),
        F.md5(F.concat_ws(",", tags)).alias("dom_sig"),
        F.size(tags).cast("long").alias("n_tags"))


def template_stats(fps: DataFrame, id_col: str = "doc_id",
                   sig_col: str = "dom_sig") -> DataFrame:
    """Roll fingerprints up to template groups: one row per signature
    with page count, corpus share, an exemplar page id (min — stable)
    and the skeleton length. One shuffle; total is broadcast."""
    per_sig = (fps.groupBy(sig_col)
               .agg(F.count(F.lit(1)).alias("n_pages"),
                    F.min(id_col).alias("exemplar"),
                    F.min("n_tags").alias("n_tags")))
    total = fps.agg(F.count(F.lit(1)).cast("double").alias("__total"))
    return (per_sig.crossJoin(F.broadcast(total))
            .select(sig_col, "n_pages", "exemplar", "n_tags",
                    F.round(F.col("n_pages") / F.col("__total"), 6)
                    .alias("share")))
