"""Probabilistic entity resolution (Fellegi & Sunter 1969).

Record linkage between two tables: candidate pairs come from a
BLOCKING key equi-join (never a cross product), each field comparison
contributes a log-likelihood-ratio weight — log2(m/u) on agreement,
log2((1-m)/(1-u)) on disagreement, where m = P(agree | match) and
u = P(agree | non-match) — and pairs whose summed score clears a
threshold are declared matches. The workhorse of dedup across sources
(customer files, crawl metadata, citation records).

Determinism note: the weights are computed ONCE in Python and injected
into the plan as double literals, so engine and oracle sum the exact
same IEEE values — no libm log() in either engine's hot path to drift
by an ulp. Agreement predicates are exact string equality or a
levenshtein cap (JVM-side `F.levenshtein`, same edit-distance
definition DuckDB implements — the deletion_join precedent).

Scale shape (the 100 TB audit): one hash join on the blocking key
(map-side pruned to the compared columns), score = a codegen sum of
CASE literals, one filter — no UDFs, no windows, no collects. Blocking
quality is the scale lever: candidate volume is sum of block_a x
block_b, so hot blocks are an input-modeling decision; AQE splits any
residual join skew.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, Column, functions as F


def fs_weights(m: float, u: float) -> tuple[float, float]:
    """(agreement_weight, disagreement_weight) = log2 likelihood
    ratios for a field with match/non-match agreement rates m, u."""
    if not (0.0 < u < m < 1.0):
        raise ValueError("fs_weights: need 0 < u < m < 1")
    return (math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))


def fs_match_pairs(a: DataFrame, b: DataFrame, block_col: str,
                   fields: list, threshold: float,
                   id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """-> (id_a, id_b, score) for blocked pairs with summed
    Fellegi-Sunter score >= threshold.

    ``fields``: list of (col_a, col_b, max_edit, w_agree, w_disagree);
    max_edit = 0 means exact equality, k > 0 means agreement iff
    levenshtein <= k. Weights come from `fs_weights` (or any floats) —
    they are embedded as literals.
    """
    if not fields:
        raise ValueError("fs_match_pairs: fields must be non-empty")
    l = a.alias("l")
    r = b.alias("r")
    score: Column = F.lit(0.0)
    for col_a, col_b, max_edit, wa, wd in fields:
        ca, cb = F.col(f"l.{col_a}"), F.col(f"r.{col_b}")
        if max_edit == 0:
            agree = ca.eqNullSafe(cb)
        else:
            agree = (ca.isNotNull() & cb.isNotNull()
                     & (F.levenshtein(ca, cb) <= int(max_edit)))
        score = score + F.when(agree, F.lit(float(wa))) \
                         .otherwise(F.lit(float(wd)))
    return (l.join(r, F.col(f"l.{block_col}") == F.col(f"r.{block_col}"))
            .select(F.col(f"l.{id_a}").alias("id_a"),
                    F.col(f"r.{id_b}").alias("id_b"),
                    score.alias("score"))
            .where(F.col("score") >= F.lit(float(threshold))))
