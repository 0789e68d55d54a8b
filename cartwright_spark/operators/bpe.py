"""Distributed BPE merge learning (tokenizer training).

Byte-pair encoding learns a merge table: repeatedly find the most
frequent adjacent symbol pair in the corpus and fuse it into a new
symbol (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — the tokenizer-training step every LLM
data pipeline runs before anything else). The reference engine has no
tokenizer-training analog; this is part of the training-data tier the
brief asks for beyond reference parity.

Scale shape (the 100 TB audit): the ONLY corpus-scale pass is the
word-frequency dictionary build — one shuffle with map-side partial
aggregation, exactly like the real trainers (HuggingFace tokenizers
counts words first, then learns merges on the dictionary). Every
learning round after that touches only the (word, freq, symbols)
vocabulary table: a web-scale corpus has ~10^8 distinct words versus
~10^13 tokens, a 10^5x reduction before the iterative part starts.
Per round: one vocab-scale pair-count aggregation (partial aggs), a
1-row argmax collect (metadata scale), and a map-only merge of the
winning pair inside each word's symbol array expressed as a Catalyst
`aggregate` fold — no UDFs, no joins, no corpus rescans. Rounds are
localCheckpoint'ed so lineage stays flat across many merges.

Determinism: the argmax tie-break is (count DESC, left ASC, right
ASC) — total order, so engine and oracle pick identical merge tables.
Counts are integer sums; nothing floats.

Greedy-merge semantics: the fold applies the winning pair left-to-
right, non-overlapping, within each word ("a a a" + (a,a) -> [aa, a]),
matching both the standard BPE trainers and the oracle's recursive
leftmost-replace formulation (replacing the leftmost occurrence and
rescanning yields the same non-overlapping left-greedy cover).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORD_RE = "^[a-z]{2,}$"


def word_frequency_dict(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the corpus word dictionary — lowercase whitespace
    tokens, alphabetic and length >= 2 (a pair needs two symbols).
    This is the single corpus-scale shuffle of BPE training."""
    return (df.select(F.explode(F.split(F.lower(text_col), r"\s+")).alias("word"))
            .where(F.col("word").rlike(WORD_RE))
            .groupBy("word").agg(F.count("*").alias("freq")))


def _merge_fold(syms, left: str, right: str):
    """Catalyst fold applying one merge rule greedily left-to-right:
    accumulator (out: array<string>, prev: string-or-null); emitting
    `prev` lazily lets the pair test see both symbols before either is
    committed."""
    merged = left + right

    def step(acc, x):
        hit = acc["prev"].eqNullSafe(F.lit(left)) & (x == F.lit(right))
        return (F.when(hit, F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("prev")))
                .otherwise(F.struct(
                    F.when(acc["prev"].isNull(), acc["out"])
                    .otherwise(F.concat(acc["out"], F.array(acc["prev"])))
                    .alias("out"),
                    x.alias("prev"))))

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"))
    return F.aggregate(
        syms, init, step,
        lambda acc: F.when(acc["prev"].isNull(), acc["out"])
        .otherwise(F.concat(acc["out"], F.array(acc["prev"]))))


def _adjacent_pairs(syms):
    """array<struct<a,b>> of adjacent symbol pairs (empty for 1-symbol
    words — guard the sequence, Spark's sequence(0, -1) is DESCENDING)."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(F.element_at(syms, i + 1).alias("a"),
                               F.element_at(syms, i + 2).alias("b")))
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def bpe_merges(df: DataFrame, text_col: str = "text",
               rounds: int = 6) -> DataFrame:
    """Learn ``rounds`` BPE merges over ``df[text_col]`` -> DataFrame
    (step, sym_a, sym_b, merged, pair_count), the merge table in
    learning order. step is 1-based; pair_count is the exact corpus
    ADJACENCY count (sum of word freqs over every adjacent position,
    overlapping runs included) — the canonical get_stats formulation
    from Sennrich et al.'s reference implementation, and what the
    oracle counts.
    """
    if rounds < 1:
        raise ValueError("bpe_merges: rounds must be >= 1")
    spark = df.sparkSession
    vocab = (word_frequency_dict(df, text_col)
             .withColumn("syms",
                         F.filter(F.split("word", ""), lambda x: x != ""))
             .localCheckpoint(eager=True))

    out_rows = []
    for step_no in range(1, rounds + 1):
        best = (vocab
                .select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(1)
                .collect())                     # 1 row — metadata scale
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        out_rows.append((step_no, a, b, a + b, cnt))
        vocab = (vocab
                 .withColumn("syms", _merge_fold(F.col("syms"), a, b))
                 .localCheckpoint(eager=True))

    return spark.createDataFrame(
        out_rows, "step int, sym_a string, sym_b string, "
                  "merged string, pair_count bigint")


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Apply a learned merge table to ``df[text_col]`` -> adds
    ``out_col`` array<string>: per word, chars fused through the merge
    rules in learning order. Map-only (one chained Catalyst fold per
    rule, no shuffle) — the corpus-scale *encode* pass stays embarrassingly
    parallel however large the corpus is."""
    words = F.filter(F.split(F.lower(text_col), r"\s+"),
                     lambda w: w.rlike(WORD_RE))

    def encode_word(w):
        e = F.filter(F.split(w, ""), lambda x: x != "")
        for a, b in merges:
            e = _merge_fold(e, a, b)
        return e

    return df.withColumn(out_col, F.flatten(F.transform(words, encode_word)))
