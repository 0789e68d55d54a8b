"""Distributed suffix array — prefix doubling (Manber–Myers) as a
DataFrame program. The substring-dedup / longest-repeat workhorse a
training-data pipeline uses where gram hashing is too coarse.

Algorithm: rank_0(i) = code of char i. Round k: re-rank suffixes by
the pair (rank_k(i), rank_k(i + 2^k)) — after round k, ranks order
suffixes by their first 2^(k+1) characters. Stop when all ranks are
distinct (or 2^k >= n): ranks are then the suffix array positions.

Spark shape (the 100 TB audit):
  1. Each round is ONE equi-join (i -> i + gap, a hash shuffle on the
     integer index) plus ONE distributed dense rank
     (functions/scan.py global_dense_rank — range shuffle + metadata
     offsets pass; never a single-partition window).
  2. Rounds = O(log(longest repeated substring)), NOT log n: the
     early-exit triggers as soon as every rank is unique (natural
     text: ~10 rounds). Each round's result is localCheckpoint'ed —
     the iterative-lineage pattern used by pagerank/BFS here.
  3. The missing right neighbour (i + gap > n) is the -1 sentinel,
     strictly below all real ranks — standard prefix-doubling device,
     and keeps the rank columns non-null for the scan primitive.
  4. Character codes come from F.ascii (the corpus contract is ASCII;
     for full UTF-8 swap in a codepoint column — the pipeline is
     byte-agnostic past round 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cartwright_spark.functions.scan import global_dense_rank


def suffix_array(chars: DataFrame, i_col: str = "i",
                 char_col: str = "c", max_rounds: int = 40,
                 rounds_out: list | None = None) -> DataFrame:
    """``chars``: one row per position (i 1-based contiguous, c a
    1-char string). -> (i, rank): rank = 1-based lexicographic
    position of the suffix starting at i among all suffixes (all
    distinct — suffixes of one string can never tie).

    rounds_out: optional list; the number of doubling rounds actually
    executed is appended (scale-bench instrumentation — rounds =
    O(log longest-repeat), the quantity the sf10 stress reports)."""
    base = chars.select(F.col(i_col).cast("bigint").alias("i"),
                        F.ascii(F.col(char_col)).cast("bigint")
                        .alias("r"))
    r = global_dense_rank(base, ["r"], "rank") \
        .select("i", "rank").localCheckpoint(eager=True)

    gap = 1
    n_rounds = 0
    for _ in range(max_rounds):
        n_rows, n_ranks = r.agg(
            F.count("*"), F.countDistinct("rank")).collect()[0]
        if n_ranks == n_rows:
            break
        right = r.select((F.col("i") - gap).alias("i"),
                         F.col("rank").alias("r2"))
        paired = (r.join(right, "i", "left")
                  .select("i", F.col("rank").alias("r1"),
                          F.coalesce("r2", F.lit(-1)).alias("r2")))
        r = global_dense_rank(paired, ["r1", "r2"], "rank") \
            .select("i", "rank").localCheckpoint(eager=True)
        gap *= 2
        n_rounds += 1
    if rounds_out is not None:
        rounds_out.append(n_rounds)
    return r
