"""C4-style page curation filters (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", appendix C) — the line/page heuristics the
C4 corpus applied to Common Crawl, re-expressed as pure JVM column
expressions so the whole filter is one codegen stage over the corpus.

Rules implemented (public C4 spec):
  * line level — keep a line only if it ends in terminal punctuation,
    has >= ``min_line_words`` words, and does not mention "javascript";
  * page level — drop a page containing "lorem ipsum" or a curly brace
    (code marker), or with fewer than ``min_sentences`` surviving lines.

Everything is exact integer counts over the line array — no Python in
the plan, no shuffle at all (per-row projection), so the filter runs at
scan speed and composes with the curation pipeline's other stages.

Reference scope note: jataware/cartwright has no corpus-curation layer
(its scope is per-column classification, cartwright/categorize.py) —
this is engine scope for the LLM-training-data tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a line "ends in terminal punctuation" — C4 keeps ., !, ? and the
# closing quote variants; \s* tolerates trailing whitespace
_TERMINAL_RE = '[.!?"”]\\s*$'


def _kept_lines(lines: Column, min_line_words: int) -> Column:
    def keep(l: Column) -> Column:
        n_words = F.size(F.filter(F.split(F.trim(l), "\\s+"),
                                  lambda w: w != ""))
        return (l.rlike(_TERMINAL_RE)
                & (n_words >= F.lit(int(min_line_words)))
                & ~F.contains(F.lower(l), F.lit("javascript")))
    return F.filter(lines, keep)


def c4_filter(df: DataFrame, lines_col: str = "lines",
              min_line_words: int = 3,
              min_sentences: int = 5) -> DataFrame:
    """Apply the C4 heuristics to ``df[lines_col]: array<string>``.

    Adds exact integer diagnostics and the final ``keep`` verdict:
      (n_lines, n_kept, has_lorem, has_brace, keep) — a page survives
    iff n_kept >= min_sentences and neither page-level marker fires.
    The kept text itself is rebuilt as ``clean_text`` (newline-joined
    surviving lines), which is what downstream dedup/tokenize stages
    consume.
    """
    lines = F.col(lines_col)
    kept = _kept_lines(lines, min_line_words)
    page = F.array_join(lines, "\n")
    has_lorem = F.contains(F.lower(page), F.lit("lorem ipsum"))
    has_brace = F.contains(page, F.lit("{"))
    n_kept = F.size(kept)
    return (df.withColumn("n_lines", F.size(lines).cast("bigint"))
            .withColumn("n_kept", n_kept.cast("bigint"))
            .withColumn("has_lorem", has_lorem.cast("int"))
            .withColumn("has_brace", has_brace.cast("int"))
            .withColumn("keep",
                        ((n_kept >= F.lit(int(min_sentences)))
                         & ~has_lorem & ~has_brace).cast("int"))
            .withColumn("clean_text", F.array_join(kept, "\n"))
            .drop(lines_col))
