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
