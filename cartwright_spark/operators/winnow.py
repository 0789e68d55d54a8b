"""Winnowing document fingerprints — the MOSS local fingerprinting
algorithm (Schleimer, Wilkerson, Aiken, SIGMOD 2003).

Where `textstats.fingerprint` keeps ONE minimal gram hash per document
and CDC (operators/cdc.py) cuts content-defined chunk boundaries,
winnowing selects a GUARANTEED-dense set of k-gram fingerprints: in
every window of `w` consecutive k-gram hashes, keep the minimum
(rightmost on ties). The guarantee (the point of the algorithm): any
shared substring of length >= w + k - 1 between two documents yields
at least one shared selected fingerprint — the detection floor plagiar-
ism/near-dup mining needs, which min-of-all-grams cannot promise.

Hashing is the CDC trick taken one step further: per-char terms with
ABSOLUTE-position powers make k-gram sums pure window arithmetic
(t_i = c_i * p^i mod M; the k-gram sum is a prefix-sum difference),
then a broadcast MODULAR-INVERSE power table normalizes each window
back to position-invariant form

    H_i = (S_{i+k-1} - S_{i-1}) * p^{-i}  mod M
        = sum_{j=0}^{k-1} c_{i+j} * p^j   mod M

so equal k-gram TEXT hashes equal anywhere in any document — the
property winnowing needs and raw absolute-position sums lack. All
arithmetic stays exact in int64: prefix sums < max_len * M ~ 2e12,
and the normalization product < M^2 ~ 1e18.

Selection is one sliding-frame struct-min per window start — no
self-join, no explode of windows: min(struct(h, -i)) over ROWS
[CURRENT, w-1 FOLLOWING] gives each window's rightmost-tie argmin,
and a distinct on the winner collapses overlapping windows that agree.

Scale shape (the 100 TB audit): fan_out before the per-char explode
(the measured single-file trap), then ONE doc-key shuffle shared by
the prefix sum, the k-gram window, and the selection frame; the
distinct is map-side combinable on (doc, pos). Fingerprint density is
~2/(w+1) of positions — the output is a bounded fraction of the
corpus, never a blowup.

Reference scope note: jataware/cartwright has no fingerprinting layer
(its dedup story is per-column profiling); this serves the
training-data near-dup tier beside minhash/simhash/CDC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

P = 31
M = 1_000_000_007


def _power_tables(spark, max_len: int):
    """Broadcast (pos, pw, ipw): p^pos and p^-pos mod M, pos 1..max_len."""
    inv_p = pow(P, M - 2, M)
    rows, pw, ipw = [], 1, 1
    for i in range(1, max_len + 1):
        pw = (pw * P) % M
        ipw = (ipw * inv_p) % M
        rows.append((i, pw, ipw))
    return F.broadcast(spark.createDataFrame(rows, ["pos", "pw", "ipw"]))


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        w: int = 4, max_len: int = 2000) -> DataFrame:
    """-> (doc_id, pos, fp): selected winnowing fingerprints; `pos` is
    the 1-based start of the k-gram, `fp` its position-invariant hash.
    Documents shorter than k emit nothing; documents with fewer than w
    k-grams are covered by a single clamped window (>= 1 fingerprint
    whenever >= 1 k-gram exists).
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    from cartwright_spark.functions.partitioning import fan_out
    spark = docs.sparkSession
    chars = (fan_out(docs)
             .select(F.col(id_col).alias("id"),
                     F.posexplode(F.split(
                         F.substring(F.col(text_col), 1, max_len), ""))
                     .alias("p0", "c"))
             .where(F.col("c") != "")
             .select("id", (F.col("p0") + 1).alias("pos"),
                     F.ascii("c").cast("bigint").alias("code")))
    ww = Window.partitionBy("id").orderBy("pos")
    grams = (chars.join(_power_tables(spark, max_len), "pos")
             .withColumn("t", (F.col("code") * F.col("pw")) % M)
             .withColumn("pk", F.sum("t").over(ww))
             # k-gram starting at pos uses S[pos+k-1] - S[pos-1]
             .withColumn("lead_pk", F.lead("pk", k - 1).over(ww))
             .withColumn("prev_pk", F.coalesce(
                 F.lag("pk", 1).over(ww), F.lit(0)))
             .where(F.col("lead_pk").isNotNull())
             .select("id", "pos",
                     ((((F.col("lead_pk") - F.col("prev_pk")) % M)
                       * F.col("ipw")) % M).alias("h")))
    nk = F.count(F.lit(1)).over(Window.partitionBy("id"))
    frame = ww.rowsBetween(Window.currentRow, w - 1)
    sel = (grams
           .withColumn("nk", nk)
           .withColumn("m", F.min(F.struct(
               F.col("h"), (-F.col("pos")).alias("ni"))).over(frame))
           .where(F.col("pos") <= F.greatest(
               F.lit(1), F.col("nk") - F.lit(w) + F.lit(1))))
    return (sel.select(F.col("id").alias("doc_id"),
                       (-F.col("m.ni")).cast("bigint").alias("pos"),
                       F.col("m.h").cast("bigint").alias("fp"))
            .distinct())


def winnow_matches(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 8, w: int = 4,
                   max_len: int = 2000,
                   max_fp_docs: int = 1000) -> DataFrame:
    """Cross-document fingerprint matches -> (doc_a, doc_b,
    n_shared_fps) for doc_a < doc_b: the MOSS report join. Fingerprints
    shared by more than `max_fp_docs` documents are dropped first
    (boilerplate grams — the bucket-cap lesson from minhash LSH: a
    corpus-wide fingerprint contributes Theta(docs^2) pairs and zero
    plagiarism signal)."""
    fps = winnow_fingerprints(docs, id_col, text_col, k, w, max_len) \
        .select("doc_id", "fp").distinct()
    df = (fps.groupBy("fp")
          .agg(F.count(F.lit(1)).alias("nd"))
          .where(F.col("nd") <= max_fp_docs))
    kept = fps.join(df.select("fp"), "fp")
    a = kept.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = kept.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    return (a.join(b, "fp")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fps")))
