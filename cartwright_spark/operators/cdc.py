"""Content-defined chunking (CDC) + cross-document chunk dedup — the
sub-document dedup granularity (boilerplate paragraphs, quoted blocks)
that whole-doc hashing misses and gram Jaccard only scores.

Rolling-hash boundaries, Rabin-style but with ABSOLUTE-position powers
so the whole thing is window arithmetic, not a sequential scan:

    t_i = (c_i * p^i mod M) ;  P_k = sum_{i<=k} t_i
    h_k = (P_k - P_{k-w}) mod M        (the w-char window fingerprint)
    boundary after k  iff  k >= w  and  h_k % d == 0

Honesty note: absolute-position powers are NOT shift-invariant (a
prefix insertion re-chunks the suffix), unlike classic Rabin CDC. What
this variant keeps is the property that matters for dedup at rest:
boundaries are a pure function of (document, position), so identical
documents — and identical prefixes — chunk identically, and the chunk
table is deterministic and SQL-mirrorable. Shift-invariant re-sync
needs per-window power normalization (a modular-inverse table); the
plumbing here is unchanged by that swap.

Scale shape (the 100 TB audit):
  1. fan_out before the per-char explode (the measured single-file
     trap), then ONE doc-key shuffle: prefix sums, the lag-w window,
     boundary flags, chunk ids (cumsum minus own flag) and the chunk
     reassembly groupBy all share the per-doc partitioning.
  2. The modpow table (position -> p^i mod M) is max_len rows,
     broadcast; partial prefix sums stay < max_len * M ~ 1.5e12 —
     exact int64, no mod-in-aggregate needed since terms are
     non-negative.
  3. The dedup rollup is a groupBy on the chunk hash — map-side
     combinable; hot boilerplate chunks are plain agg skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

P = 31
M = 1_000_000_007
DIV = 64          #: boundary when h % DIV == 0 (expected chunk ~ DIV)
WIN = 16          #: rolling window chars


def _powers(spark, max_len: int):
    rows, pw = [], 1
    for i in range(1, max_len + 1):
        pw = (pw * P) % M
        rows.append((i, pw))
    return F.broadcast(spark.createDataFrame(rows, ["pos", "pw"]))


def cdc_chunks(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", max_len: int = 2000) -> DataFrame:
    """-> (doc_id, chunk_id, n_chars, chunk_hash): deterministic
    content-defined chunks of the first ``max_len`` chars, chunk_hash
    = md5 of the chunk text."""
    from cartwright_spark.functions.partitioning import fan_out
    spark = docs.sparkSession
    chars = (fan_out(docs)
             .select(F.col(id_col).alias("id"),
                     F.posexplode(F.split(
                         F.substring(F.col(text_col), 1, max_len), ""))
                     .alias("p0", "c"))
             .where(F.col("c") != "")
             .select("id", (F.col("p0") + 1).alias("pos"),
                     F.ascii("c").cast("bigint").alias("code"),
                     F.col("c")))
    w = Window.partitionBy("id").orderBy("pos")
    scored = (chars.join(_powers(spark, max_len), "pos")
              .withColumn("t", (F.col("code") * F.col("pw")) % M)
              .withColumn("pk", F.sum("t").over(w))
              .withColumn("pkw", F.coalesce(
                  F.lag("pk", WIN).over(w), F.lit(0)))
              .withColumn("flag",
                          ((F.col("pos") >= WIN)
                           & (((F.col("pk") - F.col("pkw")) % M)
                              % DIV == 0)).cast("bigint"))
              .withColumn("cum", F.sum("flag").over(w))
              .withColumn("chunk_id", F.col("cum") - F.col("flag")))
    return (scored.groupBy("id", "chunk_id")
            .agg(F.count("*").cast("bigint").alias("n_chars"),
                 F.md5(F.concat_ws("", F.transform(
                     F.sort_array(F.collect_list(
                         F.struct("pos", "c"))),
                     lambda s: s.c))).alias("chunk_hash"))
            .select(F.col("id").alias("doc_id"),
                    F.col("chunk_id").cast("bigint").alias("chunk_id"),
                    "n_chars", "chunk_hash"))


def cdc_dedup_stats(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_len: int = 2000) -> DataFrame:
    """-> (chunk_hash, n_chars, n_occurrences, n_docs) for chunks seen
    more than once — the cross-document duplicated-span inventory."""
    ch = cdc_chunks(docs, id_col, text_col, max_len)
    return (ch.groupBy("chunk_hash")
            .agg(F.max("n_chars").cast("bigint").alias("n_chars"),
                 F.count("*").cast("bigint").alias("n_occurrences"),
                 F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
            .where(F.col("n_occurrences") > 1))
