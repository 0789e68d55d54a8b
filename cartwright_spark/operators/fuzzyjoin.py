"""Fuzzy gazetteer similarity join (SURVEY.md §2.3 J1/J2, formalized).

The reference probes 6 random samples against an in-memory gazetteer with
fuzzywuzzy (geos.py:11-88). At corpus scale that becomes a *similarity
join*: block candidate pairs cheaply (first character + length band), then
refine with a Levenshtein similarity threshold — all JVM-side expressions
(`F.levenshtein` is built in), broadcast gazetteer, no cross product.

Similarity definition (SQL-portable, also available in DuckDB):
    sim(a, b) = 1 - levenshtein(a, b) / greatest(length(a), length(b))
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def levenshtein_sim(a: Column, b: Column) -> Column:
    return 1.0 - F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b))


def fuzzy_join(left: DataFrame, left_col: str,
               right: DataFrame, right_col: str,
               threshold: float = 0.8,
               len_band: int = 3,
               broadcast_right: bool = True) -> DataFrame:
    """left ⋈_sim right: rows where sim(left_col, right_col) ≥ threshold.

    Blocking: lowercase-first-character equality + |len(a)−len(b)| ≤
    len_band (a true Levenshtein lower bound: distance ≥ length gap, so any
    pair beyond the band can't clear a threshold at typical name lengths —
    pairs are only skipped when the length gap alone already breaks the
    threshold for the shorter string's length). Keeps the join an equi-join
    on the block key instead of a cross product.
    """
    l_norm = F.lower(F.trim(F.col(left_col)))
    r_norm = F.lower(F.trim(F.col(right_col)))
    lf = left.withColumn("__l_norm", l_norm).withColumn(
        "__l_key", F.substring(l_norm, 1, 1))
    rf = right.withColumn("__r_norm", r_norm).withColumn(
        "__r_key", F.substring(r_norm, 1, 1))
    if broadcast_right:
        rf = F.broadcast(rf)
    sim = levenshtein_sim(F.col("__l_norm"), F.col("__r_norm"))
    out = (
        lf.join(rf, (F.col("__l_key") == F.col("__r_key"))
                & (F.abs(F.length("__l_norm") - F.length("__r_norm")) <= len_band))
        .withColumn("similarity", sim)
        .where(F.col("similarity") >= threshold)
        .drop("__l_norm", "__l_key", "__r_norm", "__r_key")
    )
    return out


def deletion_join(terms: DataFrame, term_col: str = "term",
                  k: int = 1, min_len: int = 1) -> DataFrame:
    """SymSpell-style edit-distance self-join: -> (term_a, term_b, dist)
    for every UNORDERED pair of DISTINCT terms with levenshtein ≤ ``k``
    (term_a < term_b lexicographically, dist exact BIGINT).

    ``fuzzy_join`` above is the dim-join form (broadcast gazetteer,
    first-char block) — it cannot self-join a large vocabulary, and its
    first-char block misses first-character typos. This is the scalable
    self-join form, public SymSpell result (Garbe 2012): if
    lev(a, b) ≤ k then deleting the ≤ k unmatched characters from each
    side yields a COMMON string, so every true pair shares at least one
    member of the deletion neighbourhood D≤k(t) = {t with ≤ k chars
    deleted}. Candidates = equi-join on the variant string; refine =
    exact ``F.levenshtein ≤ k`` (unit costs — identical in DuckDB, so
    the oracle is the brute-forced definition).

    Reference scope note: jataware/cartwright's fuzzy matching is six
    sampled values against an in-memory gazetteer (geos.py:11-88);
    a corpus-scale vocabulary self-join has no reference analog — this
    is engine scope (near-duplicate tokens/hostnames/titles for the
    LLM-curation layer).

    Scale shape (the 100 TB audit):
      1. The vocabulary is deduped FIRST (distinct = one shuffle with
         map-side combine), so the quadratic step sees distinct terms,
         never corpus multiplicity.
      2. Variant fan-out per term is 1 + L + L(L-1)/2 for k=2 (L =
         term length) — constant per term, map-only generation via
         posexplode(sequence), no UDF anywhere.
      3. Candidates come from an equi-join on the variant hash key;
         hot variants (short common fragments) are plain join skew →
         AQE skew-split. Pair dedup collapses map-side (distinct on
         (a, b) after an exact-match gate).
      4. The refine is a JVM levenshtein on candidate pairs only —
         output-bound: false positives are limited to pairs within
         deletion-distance 2k that fail the exact gate.
    """
    k = int(k)
    if k not in (1, 2):
        raise ValueError("deletion_join: k must be 1 or 2")
    if min_len < 1:
        raise ValueError("deletion_join: min_len must be >= 1")

    vocab = (terms.select(F.col(term_col).alias("term"))
             .where(F.col("term").isNotNull()
                    & (F.length("term") >= min_len))
             .distinct())

    def _delete_once(df: DataFrame) -> DataFrame:
        # one row per (term, variant-with-one-more-deletion); empty
        # variants kept (a 1-char term's deletion) — they only ever
        # match other ≤k-char terms' variants and the exact gate
        # decides. Position explode + substring concat stays inside
        # whole-stage codegen (a transform() lambda would run
        # interpreted — the measured Catalyst-HOF trap).
        return (df.select(
            "term", F.col("v").alias("v0"),
            F.explode(F.expr("sequence(1, length(v))")).alias("p"))
            .select("term", F.concat(
                F.expr("substring(v0, 1, p - 1)"),
                F.expr("substring(v0, p + 1, length(v0))")).alias("v")))

    lvl = vocab.select("term", F.col("term").alias("v"))
    variants = lvl
    for _ in range(k):
        lvl = _delete_once(lvl)
        variants = variants.unionByName(lvl)
    variants = variants.distinct()

    a = variants.select(F.col("term").alias("term_a"), "v")
    b = variants.select(F.col("term").alias("term_b"), "v")
    cand = (a.join(b, "v")
            .where(F.col("term_a") < F.col("term_b"))
            .select("term_a", "term_b")
            .distinct())
    return (cand
            .withColumn("dist", F.levenshtein("term_a", "term_b")
                        .cast("bigint"))
            .where(F.col("dist") <= k))
