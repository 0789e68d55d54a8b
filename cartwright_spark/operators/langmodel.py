"""Character-bigram language-model quality scoring (CCNet-style filter).

Reference scope note: cartwright has no corpus-quality layer (its NLP
stops at per-column type classification); this is engine scope from the
brief's LLM-training-data list — the classic "perplexity under a small
LM trained on the corpus (or a clean reference corpus)" quality signal
(Wenzek et al., CCNet, LREC 2020), reduced to a character bigram model
so the whole thing stays in exact, engine-portable arithmetic.

Model: p(c2 | c1) = (count(c1c2) + 1) / (ctx(c1) + V)   (add-one)
  ctx(c1) = number of training bigrams starting with c1,
  V       = number of distinct next-characters in training.
Score:  logprob(doc) = sum over its bigrams of ln p,
        bits_per_char = -logprob / n_bigrams / ln 2.

Determinism: ln p is computed ONCE PER DISTINCT BIGRAM (in the model
dim, not per occurrence), cast to DECIMAL(38,12); per-doc scores are
decimal sums — exact and associative, so partition layout and engine
cannot reorder them (same contract as spatial/measures.py).

Scale shape (the 100 TB audit):
  train: one explode of docs into bigram occurrences feeding a
    partial-agg'd groupBy whose OUTPUT is bounded by the bigram vocab
    (<= |alphabet|^2), not the corpus; ctx counts and V derive from that
    dim with no second corpus pass.
  score: occurrences map-side broadcast-join the (vocab-bounded) term
    dim, then ONE partial-agg'd groupBy(doc). Nothing driver-side,
    no shuffle proportional to corpus size except the per-doc rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TERM_DECIMALS = 12
_LN2 = 0.6931471805599453


def _bigram_occurrences(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, bg): one row per character bigram of lower(text). The
    length guard matters: Spark's sequence(1, 0) is DESCENDING [1, 0],
    not empty, so 0/1-char docs must short-circuit to array()."""
    from ..functions.partitioning import fan_out
    lowered = fan_out(docs).select(F.col(id_col).alias("__id"),
                                   F.lower(F.col(text_col)).alias("__t"))
    grams = F.expr(
        "CASE WHEN length(__t) > 1 THEN "
        "transform(sequence(1, length(__t) - 1), i -> substring(__t, i, 2)) "
        "ELSE array() END")
    return lowered.select(F.col("__id").alias(id_col),
                          F.explode(grams).alias("bg"))


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id"):
    """-> (term_dim, ctx_dim, v_frame): `term_dim` is (bg, cnt, term)
    with term = DECIMAL(38,12) ln p(c2|c1); ctx_dim (c1, ctxn) and the
    1-row v_frame support unseen-bigram fallback at score time."""
    occ = _bigram_occurrences(docs, text_col, id_col)
    bgc = occ.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = (bgc.groupBy(F.substring("bg", 1, 1).alias("c1"))
           .agg(F.sum("cnt").alias("ctxn")))
    vf = bgc.agg(F.countDistinct(F.substring("bg", 2, 1)).alias("v"))
    dec = f"decimal(38,{TERM_DECIMALS})"
    term = F.log(((F.col("cnt") + 1).cast("double"))
                 / ((F.col("ctxn") + F.col("v")).cast("double")))
    dim = (bgc
           .join(ctx, F.substring(bgc.bg, 1, 1) == ctx.c1)
           .crossJoin(F.broadcast(vf))
           .select("bg", "cnt", term.cast(dec).alias("term")))
    return dim, ctx, vf


def bigram_lm_score(docs: DataFrame, model=None, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, logprob, bpc) per doc. `model`: the triple
    from train_bigram_lm; None trains on `docs` itself (self-scoring,
    every bigram seen). Unseen bigrams at score time fall back to
    ln((0+1)/(ctx+V)) for a seen context, else ln(1/V)."""
    dim, ctx, vf = model if model is not None else \
        train_bigram_lm(docs, text_col, id_col)
    dec = f"decimal(38,{TERM_DECIMALS})"
    occ = _bigram_occurrences(docs, text_col, id_col)
    joined = (occ
              .join(F.broadcast(dim.select("bg", "term")), "bg", "left")
              .join(F.broadcast(
                  ctx.select(F.col("c1").alias("__c1"), "ctxn")),
                  F.substring("bg", 1, 1) == F.col("__c1"), "left")
              .crossJoin(F.broadcast(vf)))
    fallback = F.log(F.lit(1.0)
                     / ((F.coalesce(F.col("ctxn"), F.lit(0))
                         + F.col("v")).cast("double"))).cast(dec)
    scored = joined.select(
        id_col, F.coalesce(F.col("term"), fallback).alias("t"))
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("t").alias("__s"))
    dsum = F.col("__s").cast("double")
    return agg.select(
        id_col, "n_bigrams", dsum.alias("logprob"),
        ((-dsum / F.col("n_bigrams").cast("double")) / F.lit(_LN2))
        .alias("bpc"))
