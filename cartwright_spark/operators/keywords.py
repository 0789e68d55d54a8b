"""RAKE keyword extraction — stopword-delimited phrases scored by word
degree/frequency (Rose et al. 2010, "Automatic keyword extraction from
individual documents").

Pipeline (all JVM column expressions — no UDF):
  1. lower-case; punctuation runs become phrase delimiters; stopwords
     become phrase delimiters (two regexp passes so ADJACENT stopwords
     both delimit — one pass leaves every second one because the shared
     boundary space is consumed by the first match);
  2. candidate phrases = the delimited spans, exploded;
  3. corpus word stats: freq(w) = #occurrences, degree(w) = sum of the
     lengths of the phrases each occurrence sits in (self-inclusive, the
     common RAKE convention);
  4. word score = degree/freq in exact integer MICRO-units
     ((degree * 1e6) div freq) so phrase scores are bigint SUMS — no
     float summation order to diverge between engines, the
     langmodel.py decimal-exactness lesson applied with integers;
  5. phrase score = sum of its words' scores; top-k phrases per doc by
     (score desc, phrase asc).

Scale shape (10^12 docs): phrase explode is linear in corpus tokens;
the word-stat rollup is ONE algebraic (word) groupBy (map-side partials
absorb Zipf skew — 'data' appearing everywhere partial-aggregates per
mapper exactly like any hot groupBy key); word scores come back to
phrases via a broadcast-sized dim ONLY when the vocabulary is broadcast-
able — the default is a plain equi-join on word, which AQE converts to
broadcast when the vocab dim is small. Top-k is a per-doc window (doc
partitioning, no global sort).

Reference parity: jataware/cartwright has no keyword layer; this serves
the text-analysis tier of the LLM-pipeline brief (quality scoring /
document fingerprinting siblings in operators/textstats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RAKE_STOPWORDS = (
    "the", "a", "an", "of", "and", "to", "in", "for", "on", "with",
    "is", "are", "was", "at", "by", "or", "as", "be", "this", "that",
    "over", "from", "it", "its", "not", "has", "had", "have",
)

_SCALE = 1_000_000  # micro-unit fixed point for exact degree/freq


def _phrases(docs: DataFrame, id_col: str, text_col: str,
             stopwords: tuple[str, ...]) -> DataFrame:
    """(id, phrase): stopword/punctuation-delimited candidate spans."""
    stop_re = " (" + "|".join(stopwords) + ") "
    s = F.lower(F.col(text_col))
    # punctuation/digit runs DELIMIT phrases (classic RAKE), then
    # whitespace normalizes — order matters: collapsing non-letters to
    # plain spaces first would erase the sentence boundaries
    s = F.regexp_replace(s, r"[^a-z\s]+", " | ")
    s = F.regexp_replace(s, r"\s+", " ")
    s = F.concat(F.lit(" "), s, F.lit(" "))
    s = F.regexp_replace(s, stop_re, " | ")          # pass 1
    s = F.regexp_replace(s, stop_re, " | ")          # pass 2: adjacents
    return (docs.select(F.col(id_col).alias("id"),
                        F.explode(F.split(s, r"\|")).alias("raw"))
            .select("id", F.trim(F.regexp_replace("raw", r"\s+", " "))
                    .alias("phrase"))
            .where(F.col("phrase") != ""))


def rake_keywords(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  stopwords: tuple[str, ...] = RAKE_STOPWORDS,
                  top_k: int = 5) -> DataFrame:
    """-> (doc_id, phrase, n_words, n_occurrences, score_micro, rank):
    the top_k RAKE phrases per document; score_micro is the exact
    integer micro-unit phrase score (sum over words of
    (degree * 1e6) div freq), deterministic across engines."""
    ph = _phrases(docs, id_col, text_col, stopwords)
    # word stats count EVERY occurrence (RAKE freq/degree semantics)
    occ = (ph.withColumn("words", F.split("phrase", " "))
           .withColumn("n_words", F.size("words"))
           .select("id", "n_words", F.explode("words").alias("word")))
    stats = (occ.groupBy("word")
             .agg(F.count("*").alias("freq"),
                  F.sum("n_words").alias("degree"))
             .withColumn("wscore",
                         F.expr(f"(degree * {_SCALE}L) div freq")))
    # scoring runs over DISTINCT (doc, phrase) — a phrase's score does
    # not depend on how often it occurs, so dedupe first and the final
    # score is a pure bigint SUM (no division anywhere downstream)
    dphr = (ph.groupBy("id", "phrase")
            .agg(F.count("*").alias("n_occurrences"))
            .withColumn("words", F.split("phrase", " "))
            .withColumn("n_words", F.size("words"))
            .select("id", "phrase", "n_words", "n_occurrences",
                    F.explode("words").alias("word")))
    scored = (dphr.join(stats.select("word", "wscore"), "word")
              .groupBy("id", "phrase", "n_words", "n_occurrences")
              .agg(F.sum("wscore").alias("score_micro")))
    w = Window.partitionBy("id").orderBy(F.desc("score_micro"),
                                         F.asc("phrase"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k)
            .select(F.col("id").alias(id_col), "phrase", "n_words",
                    "n_occurrences", "score_micro", "rank"))
