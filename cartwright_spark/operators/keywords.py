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


def textrank_keywords(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", window: int = 3,
                      iters: int = 10, damping: float = 0.85,
                      min_len: int = 3,
                      stopwords: tuple[str, ...] = RAKE_STOPWORDS
                      ) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau, EMNLP 2004): PageRank
    over the word co-occurrence graph. Where RAKE scores words by local
    phrase statistics, TextRank uses the GLOBAL graph — a word matters
    because the words it co-occurs with matter. -> (word, wdeg, rank)
    for every content word that co-occurs with another (no top-k cut —
    a float-rank cut could flip membership across engines; callers cut
    on their own threshold).

    Construction (all JVM column expressions, no UDF):
      1. content words = alpha runs of lower(text), len >= ``min_len``,
         not in ``stopwords``; positions over the FILTERED sequence
         (the common implementation convention).
      2. co-occurrence edges: for j = 1..window, (w_t, w_{t+j}) via
         lead(j) over one (doc x pos) window — LINEAR output, never a
         position self-join; symmetrized, weights = pair counts.
      3. rank iteration (the TextRank recurrence, matching the paper's
         (1-d) constant — not PageRank's (1-d)/N):
            r(v) = (1-d) + d * sum_u (w_uv / wdeg_u) * r(u)
         with wdeg the exact integer weighted degree.

    Scale shape (the 100 TB audit): the corpus-sized work is the token
    window (ONE doc-key exchange) and the (a, b) edge rollup (algebraic,
    map-side partials absorb stop-pattern skew); iteration then runs on
    the VOCABULARY graph — metadata-scale next to the corpus — with the
    pagerank discipline (edges checkpointed once and hash-partitioned,
    per-round lineage truncated).
    """
    if window < 1:
        raise ValueError("textrank_keywords: window must be >= 1")
    if iters < 1:
        raise ValueError("textrank_keywords: iters must be >= 1")
    from pyspark.sql import Window as W
    words = F.filter(
        F.regexp_extract_all(F.lower(F.col(text_col)),
                             F.lit("[a-z]+"), 0),
        lambda w: (F.length(w) >= min_len)
        & ~w.isin(list(stopwords)))
    toks = docs.select(F.col(id_col).alias("doc"),
                       F.posexplode(words).alias("pos", "w"))
    ow = W.partitionBy("doc").orderBy("pos")
    with_leads = toks.select(
        "w", *[F.lead("w", j).over(ow).alias(f"w{j}")
               for j in range(1, window + 1)])
    pair_parts = [
        with_leads.where(F.col(f"w{j}").isNotNull()
                         & (F.col(f"w{j}") != F.col("w")))
        .select(F.col("w").alias("a"), F.col(f"w{j}").alias("b"))
        for j in range(1, window + 1)]
    directed = pair_parts[0]
    for p in pair_parts[1:]:
        directed = directed.unionByName(p)
    sym = directed.unionByName(
        directed.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = (sym.groupBy("a", "b")
         .agg(F.count(F.lit(1)).cast("bigint").alias("wt"))
         .repartition(F.col("a"))
         .localCheckpoint(eager=True))
    nodes = (e.groupBy(F.col("a").alias("word"))
             .agg(F.sum("wt").alias("wdeg"))
             .localCheckpoint(eager=True))

    ranks = nodes.select("word", F.lit(1.0).alias("rank"))
    for _ in range(iters):
        contrib = (e.join(nodes.select(F.col("word").alias("a"),
                                       F.col("wdeg").alias("__da")), "a")
                   .join(ranks.select(F.col("word").alias("a"),
                                      F.col("rank").alias("__ra")), "a")
                   .select(F.col("b").alias("word"),
                           (F.col("wt").cast("double") / F.col("__da")
                            * F.col("__ra")).alias("c")))
        ranks = (nodes.select("word")
                 .join(contrib.groupBy("word")
                       .agg(F.sum("c").alias("s")), "word", "left")
                 .select("word",
                         (F.lit(1.0 - damping) + F.lit(damping)
                          * F.coalesce(F.col("s"), F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    return nodes.join(ranks, "word").select("word", "wdeg", "rank")
