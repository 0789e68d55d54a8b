"""Training-data curation: the composed documents pipeline a large-scale
LLM-data job runs — dedup → quality scoring → language filter — expressed
as one declarative DataFrame program (every step whole-stage codegen; the
only shuffles are the dedup hash groupBy and nothing else).

This is a composition of the individually-oracled operators in
operators/dedup.py and operators/textstats.py; the driver contract checks
the composition end-to-end (query `corpus_curation`)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cartwright_spark.operators.dedup import dedup_exact
from cartwright_spark.operators.textstats import (
    detect_language,
    quality_scores,
    repetition_scores,
)


def curate_documents(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     min_words: int = 10, max_words: int = 100_000,
                     min_quality: float = 0.5,
                     langs: tuple[str, ...] = ("en",),
                     repetition_filter: bool = False) -> DataFrame:
    """documents → curated (doc_id, n_words, quality_score, lang_detected).

    1. exact dedup: keep the min-id representative per byte-identical text
       (one hash shuffle, map-side partial).
    2. quality features + 0-1 score (length/punctuation/stopword heuristics,
       pure expressions).
    3. stopword-marker language ID (argmax over codegen CASE chain).
    4. keep docs inside the word-count band, above the quality floor, in
       an allowed language.
    5. (opt-in) Gopher repetition gate: drop docs failing the
       dup-word / top-2-gram / dup-5-gram thresholds
       (`repetition_scores`, contract query `gopher_repetition`) —
       adds one (doc, gram) shuffle + a doc_id equi-join, both keyed on
       high-cardinality columns, so the composition stays skew-safe.
    """
    kept = dedup_exact(docs, text_col, id_col)
    feats = quality_scores(kept, text_col)
    lang = detect_language(feats, text_col)
    out = (lang
           .where(F.col("n_words").between(min_words, max_words)
                  & (F.col("quality_score") >= min_quality)
                  & F.col("lang_detected").isin(list(langs)))
           .select(id_col, "n_words", "quality_score", "lang_detected"))
    if repetition_filter:
        rep = (repetition_scores(kept, text_col, id_col)
               .where(F.col("keep_repetition") == 1).select(id_col))
        out = out.join(rep, id_col, "left_semi")
    return out
