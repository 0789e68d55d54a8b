"""Passage chunking — sliding-window document splitting for retrieval
/ embedding pipelines (the RAG pre-pass: fixed-size token windows with
overlap so no span falls across a boundary unseen).

Window rule (the HuggingFace `return_overflowing_tokens` convention):
windows start at multiples of ``stride``; a document with n tokens
gets 1 window if n <= size, else ((n - size + stride - 1) div stride)
+ 1 — the last window starts at the final stride multiple that still
adds new tokens, and is allowed to be short. stride <= size keeps
coverage gap-free.

Scale shape: split -> per-row window explode, entirely inside
whole-stage codegen — map-only, no shuffle, no UDFs; the operator is
embarrassingly parallel at any corpus size. Arithmetic is integer
`div` (no float ceil), so engine and oracle window counts can never
disagree on boundaries.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def passage_chunks(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", size: int = 64,
                   stride: int = 48) -> DataFrame:
    """-> (id, chunk_idx, start_tok, n_tokens, chunk_text): whitespace
    tokens windowed [i*stride, i*stride + size); empty documents emit
    no chunks."""
    if size < 1:
        raise ValueError("passage_chunks: size must be >= 1")
    if not (1 <= stride <= size):
        raise ValueError("passage_chunks: need 1 <= stride <= size "
                         "(gap-free coverage)")
    d = (df.select(F.col(id_col).alias("id"),
                   F.filter(F.split(text_col, r"\s+"),
                            lambda w: w != "").alias("ws"))
         .withColumn("n", F.size("ws"))
         .where(F.col("n") > 0)
         .withColumn("nc", F.when(
             F.col("n") <= size, F.lit(1).cast("bigint")
         ).otherwise(F.expr(f"(n - {size} + {stride} - 1) div {stride}")
                     + F.lit(1))))
    win = F.explode(F.transform(
        F.sequence(F.lit(0).cast("bigint"), F.col("nc") - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            (i * stride).cast("bigint").alias("start_tok"),
            F.least(F.lit(size).cast("bigint"),
                    F.col("n") - i * stride).alias("n_tokens"),
            F.concat_ws(" ", F.slice(F.col("ws"),
                                     (i * stride + 1).cast("int"), size))
            .alias("chunk_text"))))
    return (d.select("id", win.alias("c"))
            .select("id", "c.chunk_idx", "c.start_tok", "c.n_tokens",
                    "c.chunk_text"))
