"""Span-corruption training-pair construction (T5-style masked LM prep).

The last mile of a pretraining-data pipeline: turn curated documents
into (input, target) pairs where random token SPANS are replaced by
numbered sentinels in the input and emitted after their sentinel in the
target (Raffel et al. 2020, "Exploring the Limits of Transfer Learning",
the public T5 objective). This implementation is the DETERMINISTIC
variant a distributed pipeline wants: span starts come from a portable
integer hash of (doc_id, position) — the functions/sharding.py field mix
— so the same document always yields the same pair, on any executor
count, in any engine (the property "random() per row" destroys: Spark
retries/reorders tasks, so nondeterministic masks are not reproducible
and break resume-equals-cold guarantees).

Semantics (per document, over the whitespace token sequence):
  1. start(pos)  = hash(doc, pos) % start_mod == 0
  2. masked(pos) = any start in the last ``span_len`` positions
     (ROWS frame max — overlapping/adjacent spans merge into runs,
     exactly the T5 convention of one sentinel per contiguous gap)
  3. runs are numbered left to right; run k's tokens become
     ``<extra_id_{k-1}>`` in the input; the target is the concatenation
     of ``<extra_id_{k-1}>`` + run tokens, in order (no trailing
     sentinel — documented deviation, kept symmetric across engines).

Scale shape (the 100 TB audit): ONE doc-key exchange shared by all four
window passes (mask frame, run-head lag, run-id prefix sum, ordered
reassembly), then one groupBy(doc) whose per-doc state is the token
list itself — the same volume any tokenize step already moves. String
assembly is array_sort + concat_ws over collected (pos, piece) structs:
deterministic without relying on collect_list order. All expressions
are JVM built-ins; no UDF, no Python in the hot path.

Reference scope note: jataware/cartwright has no training-prep layer;
engine scope from the brief's LLM-pipeline axis (beside
operators/chunking.py passage windows and operators/bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cartwright_spark.functions.sharding import A, B, C, M


def _start_hash(doc_col, pos_col):
    """Portable start-decision hash: the sharding.py two-round mix over
    (doc, pos) — exact int64 (operands reduced mod M < 2^30 first)."""
    k = F.pmod(doc_col.cast("bigint"), F.lit(M))
    h1 = F.pmod(k * F.lit(A) + pos_col.cast("bigint") * F.lit(B)
                + F.lit(C), F.lit(M))
    return F.pmod(h1 * h1 + h1, F.lit(M))


def span_corruption(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", span_len: int = 3,
                    start_mod: int = 20) -> DataFrame:
    """-> (doc_id, n_tokens, n_masked, n_spans, input_text,
    target_text). Expected mask density ~ span_len/start_mod (15% at
    the defaults, the T5 setting). Zero-token docs emit empty strings;
    docs where nothing masked emit input = original, target = ''."""
    if span_len < 1:
        raise ValueError("span_corruption: span_len must be >= 1")
    if start_mod < 1:
        raise ValueError("span_corruption: start_mod must be >= 1")
    words = F.filter(F.split(F.col(text_col), r"\s+"),
                     lambda w: w != "")
    toks = docs.select(F.col(id_col).alias("doc"),
                       F.posexplode(words).alias("p0", "tok")) \
               .select("doc", (F.col("p0") + 1).alias("pos"), "tok")

    ow = Window.partitionBy("doc").orderBy("pos")
    mask_frame = ow.rowsBetween(-(span_len - 1), 0)
    run_frame = ow.rowsBetween(Window.unboundedPreceding, 0)

    t = (toks.withColumn(
            "start",
            (F.pmod(_start_hash(F.col("doc"), F.col("pos")),
                    F.lit(start_mod)) == 0).cast("int"))
         .withColumn("masked", F.max("start").over(mask_frame))
         .withColumn("head",
                     ((F.col("masked") == 1)
                      & (F.coalesce(F.lag("masked").over(ow), F.lit(0))
                         == 0)).cast("int"))
         .withColumn("run_id", F.sum("head").over(run_frame)))

    sentinel = F.concat(F.lit("<extra_id_"),
                        (F.col("run_id") - 1).cast("string"), F.lit(">"))
    inp_piece = F.when(F.col("masked") == 0, F.col("tok")) \
                 .when(F.col("head") == 1, sentinel)           # else NULL
    tgt_piece = F.when(
        F.col("masked") == 1,
        F.when(F.col("head") == 1,
               F.concat(sentinel, F.lit(" "), F.col("tok")))
        .otherwise(F.col("tok")))

    def _joined(piece_col, name):
        return F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(piece_col.isNotNull(),
                           F.struct(F.col("pos"), piece_col.alias("s"))))),
                lambda x: x["s"])).alias(name)

    out = (t.groupBy("doc")
           .agg(F.count(F.lit(1)).alias("n_tokens"),
                F.sum("masked").cast("bigint").alias("n_masked"),
                F.sum("head").cast("bigint").alias("n_spans"),
                _joined(inp_piece, "input_text"),
                _joined(tgt_piece, "target_text")))
    # zero-token docs never reach the explode — re-attach them
    return (docs.select(F.col(id_col).alias("doc"))
            .join(out, "doc", "left")
            .select(F.col("doc").alias(id_col),
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_masked", F.lit(0)).alias("n_masked"),
                    F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                    F.coalesce("input_text", F.lit("")).alias("input_text"),
                    F.coalesce("target_text", F.lit(""))
                    .alias("target_text")))
