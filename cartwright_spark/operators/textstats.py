"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side column expressions (whole-stage
codegen) — these run over every document at corpus scale, so no Python in
the plan at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (n-gram-heuristic language ID)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "und", "das", "ist"],
    "pt": ["o", "os", "da", "do", "uma"],
}

_STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
                 "that", "for", "on", "with", "as"]

# BPE-ish token regex: word pieces, numbers, punctuation runs
_TOKEN_RE = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"


def tokens_col(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(_TOKEN_RE), 0)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc → whitespace-token and BPE-ish-token counts."""
    return df.withColumn(
        "n_ws_tokens",
        F.size(F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")),
    ).withColumn("n_bpe_tokens", F.size(tokens_col(F.col(text_col))))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a 0-1 score.
    All counts are integers; ratios are exact divisions of those integers."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.filter(F.split(F.lower(t), "\\s+"), lambda w: w != "")
    n_words = F.size(words)
    n_punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?]", ""))
    n_stop = F.size(F.array_intersect(F.array_distinct(words),
                                      F.array([F.lit(s) for s in _STOPWORDS_EN])))
    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("n_punct", n_punct)
        .withColumn("n_stop_distinct", n_stop)
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)))
        .withColumn(
            "mean_word_len",
            F.when(n_words > 0,
                   F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / n_words)
            .otherwise(F.lit(0.0)))
    )
    score = (
        F.when((F.col("n_words") >= 10) & (F.col("n_words") <= 100000), 0.4).otherwise(0.0)
        + F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 12), 0.3).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.2).otherwise(0.0)
        + F.when(F.col("n_stop_distinct") >= 2, 0.1).otherwise(0.0)
    )
    return out.withColumn("quality_score", score)


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: per language, count distinct marker words
    present; argmax wins (deterministic tie-break by language code).

    Argmax is a greatest() + CASE chain in alphabetical language order —
    whole-stage codegen. (An earlier array_sort/filter-lambda formulation
    was interpreted per element and 20× slower at sf0.1.)"""
    words = F.array_distinct(F.filter(F.split(F.lower(F.col(text_col)), "\\s+"),
                                      lambda w: w != ""))
    langs = sorted(_LANG_MARKERS.items())
    out = df.withColumn("__w", words)
    for lang, markers in langs:
        out = out.withColumn(
            f"__h_{lang}",
            F.size(F.array_intersect(
                F.col("__w"), F.array([F.lit(m) for m in markers]))))
    mx = F.greatest(*[F.col(f"__h_{lang}") for lang, _ in langs])
    pick = None
    for lang, _ in langs:  # alphabetical ⇒ first hit of max = smallest code
        cond = F.col(f"__h_{lang}") == mx
        pick = F.when(cond, F.lit(lang)) if pick is None \
            else pick.when(cond, F.lit(lang))
    return (out.withColumn("lang_detected", pick)
            .withColumn("lang_score", mx)
            .drop("__w", *[f"__h_{lang}" for lang, _ in langs]))


def repetition_scores(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1) — the
    standard crawl-corpus filter for boilerplate/spam whose text is
    mostly one phrase repeated. Per doc:

      n_words / dup_words       word occurrences, and occurrences beyond
                                each word's first (dup fraction numerator)
      top2_cov_chars/tot2_chars char coverage of the heaviest word 2-gram
                                (max over grams of count*len — the
                                deterministic coverage form of Gopher's
                                "most frequent 2-gram" char fraction)
      dup5_chars / tot5_chars   chars inside 5-grams occurring >1 time
      keep_repetition           1 iff dup_word ≤ 0.30, top-2-gram ≤ 0.20
                                and dup-5-gram ≤ 0.15 (Gopher-ish
                                thresholds), evaluated as exact integer
                                cross-multiplications — no float ratios,
                                so Spark and a SQL oracle hash-identical.

    Plan shape: ONE explode pass (posexplode of the filtered word array),
    one window projection building the 2- and 5-grams via lead(), a
    stack() to (n, gram) rows, then a single groupBy(id, n, gram) shuffle
    + per-doc conditional agg. All whole-stage codegen; at 100 TB the
    only shuffle is keyed on (doc, gram) — high-cardinality, unskewed by
    construction (a hot *document* is one group per distinct gram)."""
    from pyspark.sql import Window as W

    words = F.filter(F.split(F.lower(F.col(text_col)), "\\s+"),
                     lambda w: w != "")
    rows = (df.withColumn("__ws", words)
            .select(id_col, F.size("__ws").alias("__n"),
                    F.posexplode("__ws").alias("pos", "w")))
    wspec = W.partitionBy(id_col).orderBy("pos")
    leads = [F.col("w")] + [F.lead("w", i).over(wspec) for i in range(1, 5)]
    g2 = F.when(F.col("pos") + 2 <= F.col("__n"),
                F.concat_ws(" ", *leads[:2]))
    g5 = F.when(F.col("pos") + 5 <= F.col("__n"),
                F.concat_ws(" ", *leads))
    stacked = (rows
               .withColumn("__g2", g2).withColumn("__g5", g5)
               .select(id_col, F.expr(
                   "stack(3, 1, w, 2, __g2, 5, __g5) as (gn, gram)"))
               .where(F.col("gram").isNotNull()))
    per_gram = (stacked.groupBy(id_col, "gn", "gram")
                .agg(F.count("*").alias("c"))
                .withColumn("chars", F.col("c") * F.length("gram")))
    agg = per_gram.groupBy(id_col).agg(
        F.sum(F.when(F.col("gn") == 1, F.col("c"))).alias("n_words"),
        F.sum(F.when(F.col("gn") == 1, F.col("c") - 1)).alias("dup_words"),
        F.max(F.when(F.col("gn") == 2, F.col("chars"))).alias("top2_cov_chars"),
        F.sum(F.when(F.col("gn") == 2, F.col("chars"))).alias("tot2_chars"),
        F.sum(F.when((F.col("gn") == 5) & (F.col("c") > 1),
                     F.col("chars"))).alias("dup5_chars"),
        F.sum(F.when(F.col("gn") == 5, F.col("chars"))).alias("tot5_chars"),
    )
    # left join back: a doc with zero words emits no gram rows at all
    out = (df.select(id_col).join(agg, id_col, "left")
           .select(id_col,
                   *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                     for c in ("n_words", "dup_words", "top2_cov_chars",
                               "tot2_chars", "dup5_chars", "tot5_chars")]))
    keep = ((F.col("dup_words") * 10 <= F.col("n_words") * 3)
            & (F.col("top2_cov_chars") * 5 <= F.col("tot2_chars"))
            & (F.col("dup5_chars") * 20 <= F.col("tot5_chars") * 3))
    return out.withColumn("keep_repetition", keep.cast("int"))


def fingerprint(df: DataFrame, text_col: str = "text",
                window: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Rolling-hash document fingerprint → (id, fp_min_gram, fp_doc):
    crc32 over each `window`-gram of words, keep the min (winnowing-style
    single fingerprint) plus xxhash of the whole normalized text.

    Shape: posexplode words → lead() window builds each gram → codegen
    crc32 → min() aggregate. Measured 2.8× faster at sf0.1 than the
    transform()-over-positions form (HOF lambdas evaluate interpreted).
    Benchmarking note that cost us once: .count() on either form prunes
    the fingerprint columns entirely — only a sink that consumes the
    values (noop write / collect) measures the real cost."""
    from pyspark.sql import Window as W

    words = F.filter(F.split(F.lower(F.col(text_col)), "\\s+"),
                     lambda w: w != "")
    base = df.withColumn("__ws", words)
    rows = base.select(id_col, F.size("__ws").alias("__n"),
                       F.posexplode("__ws").alias("pos", "w"))
    wspec = W.partitionBy(id_col).orderBy("pos")
    leads = [F.col("w")] + [F.lead("w", i).over(wspec)
                            for i in range(1, window)]
    gram = F.concat_ws(" ", *leads)  # concat_ws skips trailing nulls
    # valid gram starts: pos ≤ n-window, or pos = 0 for short docs —
    # preserves the reference "no short tail grams" multiplicity
    ok = (F.col("pos") + window <= F.col("__n")) | \
         ((F.col("pos") == 0) & (F.col("__n") < window))
    hashed = rows.withColumn(
        "__g", F.when(ok, F.crc32(F.encode(gram, "utf-8"))))
    mins = hashed.groupBy(id_col).agg(F.min("__g").alias("fp_min_gram"))
    docs = base.select(id_col,
                       F.xxhash64(F.concat_ws(" ", F.col("__ws")))
                       .alias("fp_doc"))
    # left join: a zero-word doc emits no gram rows; its fingerprint is
    # crc32("") = 0, matching the slice-based semantics
    return (docs.join(mins, id_col, "left")
            .withColumn("fp_min_gram",
                        F.coalesce("fp_min_gram", F.lit(0).cast("long")))
            .select(id_col, "fp_min_gram", "fp_doc"))


def term_cooccurrence(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", min_df: int = 2,
                      max_df: int = 1000, max_terms_per_doc: int = 64,
                      min_pair: int = 2) -> DataFrame:
    """Term-pair collocation mining: -> (term_a, term_b, c_ab, df_a,
    df_b, lift) for lexicographically-ordered content-word pairs that
    co-occur in >= ``min_pair`` documents. lift = the association ratio
    P(a,b) / (P(a) P(b)) = c_ab * n_docs / (df_a * df_b) — the textual
    sibling of spatial/colocation.py's cell-based lift, one division of
    exact BIGINT counts (no log, so both engines round identically).

    Vocabulary gates: only terms with min_df <= df <= max_df pair up
    (stop words and hapaxes never enter the quadratic step), and each
    document contributes at most its ``max_terms_per_doc`` RAREST kept
    terms (ties broken by term — deterministic, oracle-expressible), so
    per-doc pair fan-out is capped at m*(m-1)/2 BY CONSTRUCTION.

    Scale shape (the 100 TB audit): distinct (doc, term) pairs = ONE
    corpus shuffle with map-side dedup; df counts are algebraic over
    the deduped pairs (stop-word skew absorbed pre-exchange); the
    capped table is CHECKPOINTED before the doc self-join so the whole
    tokenize/dedup/vocab subtree runs exactly once (the join's two
    reads re-shuffle only the m-rows-per-doc capped table); the final
    (a, b) rollup's key space is bounded by the vocab gates, and its
    partial agg collapses pairs map-side.
    """
    min_df, max_df = int(min_df), int(max_df)
    m = int(max_terms_per_doc)
    if not (1 <= min_df <= max_df):
        raise ValueError("term_cooccurrence: need 1 <= min_df <= max_df")
    if m < 2:
        raise ValueError("term_cooccurrence: max_terms_per_doc < 2 "
                         "admits no pairs")
    from pyspark.sql import Window as W
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                     lambda w: w != "")
    pairs = (docs.select(F.col(id_col).alias("doc"),
                         F.explode(words).alias("term"))
             .distinct())
    vocab = (pairs.groupBy("term")
             .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
             .where((F.col("df") >= min_df) & (F.col("df") <= max_df)))
    kept = pairs.join(vocab, "term")
    # localCheckpoint: the self-join below reads `capped` twice — without
    # materialization Spark re-plans the whole subtree per side (measured:
    # 6 exchanges instead of 3) because the aliased subplans don't
    # canonicalize to a ReusedExchange. The checkpoint preserves the
    # window's hash(doc) partitioning, so the join adds NO exchange.
    capped = (kept.withColumn(
        "rn", F.row_number().over(
            W.partitionBy("doc").orderBy(F.col("df").asc(),
                                         F.col("term").asc())))
        .where(F.col("rn") <= m)
        .select("doc", "term", "df")
        .localCheckpoint(eager=True))
    a = capped.select("doc", F.col("term").alias("term_a"),
                      F.col("df").alias("df_a"))
    b = capped.select("doc", F.col("term").alias("term_b"),
                      F.col("df").alias("df_b"))
    co = (a.join(b, "doc")
          .where(F.col("term_a") < F.col("term_b"))
          .groupBy("term_a", "term_b", "df_a", "df_b")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
          .where(F.col("c_ab") >= F.lit(int(min_pair))))
    n_docs = docs.select(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (co.crossJoin(F.broadcast(n_docs))
            .select("term_a", "term_b", "c_ab", "df_a", "df_b",
                    (F.col("c_ab").cast("double")
                     * F.col("n_docs").cast("double")
                     / (F.col("df_a").cast("double")
                        * F.col("df_b").cast("double"))).alias("lift")))


def zipf_fit(docs: DataFrame, group_col: str = "lang",
             text_col: str = "text", top_v: int = 512,
             salt_buckets: int = 32) -> DataFrame:
    """Zipf rank-frequency fit per corpus slice: OLS of ln(freq) on
    ln(rank) over each slice's top ``top_v`` terms — the standard
    corpus-health check that a crawl slice's term distribution still
    follows a power law (a flat slope flags template/spam floods, a
    cliff flags truncation).

    Scale shape: the term count is ONE (group, term) shuffle with
    map-side partials. The top-V rank would naively be a per-group
    global sort (hot slice = one task), so it runs TWO-STAGE: stage 1
    ranks inside ``(group, xxhash64(term) % salt_buckets)`` and keeps
    each bucket's top ``top_v`` (the global top-V is a subset of the
    union of per-bucket top-Vs — a bucket contributes at most its own
    top-V to the global list); stage 2 re-ranks the <= buckets*top_v
    survivors per group. The final OLS is a plain algebraic aggregate.
    Ranks tie-break on (freq DESC, term ASC) so the fit is
    deterministic.

    Returns one row per group: ``n_terms`` (ranked vocabulary size,
    <= top_v), ``zipf_slope``, ``zipf_intercept`` (both rounded to 4
    decimals; slope ~ -1 for natural language).
    """
    from pyspark.sql import Window as W

    toks = docs.select(
        F.col(group_col),
        F.explode(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                           lambda t: t != "")).alias("term"))
    counts = (toks.groupBy(group_col, "term")
              .agg(F.count(F.lit(1)).alias("freq")))
    salted = counts.withColumn(
        "__salt", F.pmod(F.xxhash64("term"), F.lit(salt_buckets)))
    w1 = (W.partitionBy(group_col, "__salt")
          .orderBy(F.desc("freq"), F.asc("term")))
    survivors = (salted.withColumn("__rn", F.row_number().over(w1))
                 .where(F.col("__rn") <= top_v))
    w2 = W.partitionBy(group_col).orderBy(F.desc("freq"), F.asc("term"))
    ranked = (survivors.withColumn("rank", F.row_number().over(w2))
              .where(F.col("rank") <= top_v)
              .select(group_col,
                      F.log(F.col("rank").cast("double")).alias("x"),
                      F.log(F.col("freq").cast("double")).alias("y")))
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxy, sxx = F.sum(F.col("x") * F.col("y")), F.sum(F.col("x") * F.col("x"))
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("__slope"),
        sy.alias("__sy"), sx.alias("__sx"), n.alias("__n"))
    return agg.select(
        group_col, "n_terms",
        F.round("__slope", 4).alias("zipf_slope"),
        F.round((F.col("__sy") - F.col("__slope") * F.col("__sx"))
                / F.col("__n"), 4).alias("zipf_intercept"))


def readability(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Flesch readability (Flesch 1948 / Kincaid et al. 1975 — the
    quality-filter classic): -> (id, n_words, n_sents, n_syll,
    flesch_ease, fk_grade). Stock curation pipelines gate on reading
    ease alongside the Gopher stats; both formulas are single float
    expressions over three EXACT integer counts, so the only floats are
    two final arithmetic expressions shared verbatim with the oracle —
    no accumulation, no ordering.

      words     = alphabetic runs [a-z]+ of lower(text) — NOT the
                  BPE-ish tokens_col (punctuation/number tokens are not
                  words and would each inflate the syllable floor)
      sentences = runs of [.!?]+ (min 1 — headline-style fragments
                  count as one sentence, the textstat convention)
      syllables = vowel-group runs [aeiouy]+ per word (min 1 per word —
                  the standard heuristic floor), summed per doc

    flesch_ease = 206.835 - 1.015*(W/S) - 84.6*(Syl/W)
    fk_grade    = 0.39*(W/S) + 11.8*(Syl/W) - 15.59

    Scale shape: pure per-row codegen — split/size/regexp_count/
    aggregate over the token array; no explode, no shuffle, no Python.
    Zero-word docs are emitted with NULL ratios (not dropped — a
    curation gate wants to SEE empty docs).
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit("[a-z]+"), 0)
    n_words = F.size(words).cast("bigint")
    n_sents = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")),
        F.lit(1)).cast("bigint")
    n_syll = F.aggregate(
        words, F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.greatest(
            F.regexp_count(w, F.lit("[aeiouy]+")), F.lit(1)))
    wps = F.col("n_words").cast("double") / F.col("n_sents")
    spw = F.col("n_syll").cast("double") / F.col("n_words")
    return (df.select(F.col(id_col), n_words.alias("n_words"),
                      n_sents.alias("n_sents"), n_syll.alias("n_syll"))
            .withColumn(
                "flesch_ease",
                F.when(F.col("n_words") > 0,
                       F.lit(206.835) - F.lit(1.015) * wps
                       - F.lit(84.6) * spw))
            .withColumn(
                "fk_grade",
                F.when(F.col("n_words") > 0,
                       F.lit(0.39) * wps + F.lit(11.8) * spw
                       - F.lit(15.59))))
