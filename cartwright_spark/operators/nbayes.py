"""Multinomial Naive Bayes text classification — distributed train AND
score in one declarative plan (no model object, no driver round-trip):
the classifier a curation pipeline trains on a labeled slice (language,
domain, quality tier) and applies to the whole crawl.

Math (add-one smoothing, log domain):

    score(d, l) = ln P(l) - N_d * ln(T_l + V)
                  + sum_w n_{d,w} * ln(c_{l,w} + 1)

where T_l = total tokens in class l, V = |vocab|, c_{l,w} = count of w
in class l, n_{d,w} = count of w in doc d, N_d = doc length. The
ln(c+1) form makes the UNSEEN-word contribution exactly zero, so the
per-(doc, word, label) fan-out can be a LEFT join against the count
dim — absent rows cost nothing — while the smoothing denominator rides
in the label-constant term, once per (doc, label).

Scale shape: token counts are two algebraic groupBys; scoring is
(doc-word rows) x L via a broadcast label dim, then ONE equi-join on
the token key against the (label, token) count table (dim-like: V*L
rows — shuffle join at web scale, AQE handles hot-token skew), then one
groupBy(doc, label) and one argmax agg max(struct(score, label)) — no
window, no driver state. Priors/vocab-size are one-row broadcasts.

Reference scope note: jataware/cartwright classifies COLUMNS with a
torch LSTM (cartwright/category_helpers.py); this is the corpus-level
document classifier of the LLM-data tier — engine scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def naive_bayes_classify(train_tokens: DataFrame,
                         score_tokens: DataFrame,
                         doc_col: str = "doc_id",
                         label_col: str = "label",
                         token_col: str = "token") -> DataFrame:
    """Train on ``train_tokens`` (doc, label, token — one row per token
    OCCURRENCE) and score ``score_tokens`` (doc, token).
    -> (doc_id, pred, score): the argmax class per scored doc, ties
    broken toward the greater label (identically in the oracle)."""
    tr = train_tokens.select(F.col(doc_col).alias("d"),
                             F.col(label_col).alias("l"),
                             F.col(token_col).alias("w"))
    sc = score_tokens.select(F.col(doc_col).alias("d"),
                             F.col(token_col).alias("w"))

    # --- train: all algebraic aggregates -------------------------------
    cls_docs = (tr.select("d", "l").distinct()
                .groupBy("l").agg(F.count(F.lit(1)).alias("n_docs")))
    n_total = tr.select("d").distinct() \
        .agg(F.count(F.lit(1)).alias("n_all"))
    t_l = tr.groupBy("l").agg(F.count(F.lit(1)).alias("t_l"))
    vocab = tr.select("w").distinct() \
        .agg(F.count(F.lit(1)).alias("v"))
    c_lw = tr.groupBy("l", "w").agg(F.count(F.lit(1)).alias("c"))

    # per-label constants: ln prior and the smoothing denominator
    consts = (cls_docs.join(t_l, "l")
              .crossJoin(F.broadcast(n_total))
              .crossJoin(F.broadcast(vocab))
              .select("l",
                      F.log(F.col("n_docs").cast("double")
                            / F.col("n_all")).alias("ln_prior"),
                      F.log((F.col("t_l") + F.col("v"))
                            .cast("double")).alias("ln_denom")))

    # --- score ---------------------------------------------------------
    dw = sc.groupBy("d", "w").agg(F.count(F.lit(1)).alias("n"))
    nd = sc.groupBy("d").agg(F.count(F.lit(1)).alias("n_d"))
    labels = consts.select("l")
    contrib = (dw.crossJoin(F.broadcast(labels))
               .join(c_lw, ["l", "w"], "left")
               .groupBy("d", "l")
               .agg(F.sum(F.col("n")
                          * F.log(F.coalesce(F.col("c"), F.lit(0))
                                  .cast("double") + 1.0))
                    .alias("evidence")))
    scored = (contrib.join(nd, "d")
              .join(F.broadcast(consts), "l")
              .select("d", "l",
                      (F.col("ln_prior")
                       - F.col("n_d") * F.col("ln_denom")
                       + F.col("evidence")).alias("s")))
    best = (scored.groupBy("d")
            .agg(F.max(F.struct(F.col("s"), F.col("l"))).alias("b")))
    return best.select(F.col("d").alias("doc_id"),
                       F.col("b.l").alias("pred"),
                       F.col("b.s").alias("score"))
