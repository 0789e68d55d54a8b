"""Offline change-point detection per series — the integer-exact CUSUM
split statistic. For a series x_1..x_n (ordered by time) the classic
mean-shift statistic at split k is |mean(1..k) - mean(k+1..n)| up to a
variance normalization; scaled by n it becomes

    T_k = n * S_k - k * S_n      (S_k = prefix sum),   k = 1..n-1

which is EXACT integer arithmetic — argmax |T_k| is the maximum-
likelihood single change point for a mean shift, no floats until the
reported normalized statistic. Tie-break: smallest k.

Scale shape (the 100 TB audit):
  1. One shuffle: the prefix-sum window partitions by series; the
     argmax groupBy reuses that partitioning (map-side combinable
     max(struct)).
  2. Series here are per-user event streams (10^2..10^4 points) — the
     right granularity for a window. A single series too big for one
     task would use the functions/scan.py distributed prefix scan
     instead (same trick as gini_concentration).
  3. n * S_k bounds int64 at n * n * max_x ~ 9e18: with cent-scale
     values that is ~10^7-point series — far above any per-user
     stream; DECIMAL(38,0) is the escape hatch if ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoint(df: DataFrame, group_col: str = "grp",
                      ts_col: str = "ts",
                      value_col: str = "x") -> DataFrame:
    """-> (grp, n, k_star, ts_split, stat, shift): per series the
    1-based index k* maximizing |n*S_k - k*S_n| over k = 1..n-1 (ties:
    smallest k), the timestamp of the k*-th point (the last point of
    the left segment), the integer statistic, and the implied mean
    shift |T|/(k*(n-k)) as a double. Series with n < 2 are omitted
    (no split exists)."""
    w = Window.partitionBy("grp").orderBy("ts", "x")
    base = (df.select(F.col(group_col).alias("grp"),
                      F.col(ts_col).alias("ts"),
                      F.col(value_col).cast("bigint").alias("x"))
            .where(F.col("x").isNotNull())
            .withColumn("k", F.row_number().over(w))
            .withColumn("s", F.sum("x").over(w)))
    # S_n = sum(x), NOT max of the cumsum (negative values can make
    # the running sum dip below its final value)
    tot = base.groupBy("grp").agg(F.count("*").alias("n"),
                                  F.sum("x").alias("sn"))
    scored = (base.join(tot, "grp")
              .where(F.col("k") < F.col("n"))
              .withColumn("t", F.col("n") * F.col("s")
                          - F.col("k") * F.col("sn")))
    best = (scored.groupBy("grp")
            .agg(F.first("n").alias("n"),
                 F.max(F.struct(F.abs("t").alias("a"),
                                (-F.col("k")).alias("negk"),
                                F.col("k"), F.col("ts"),
                                F.col("t"))).alias("b")))
    kk = F.col("b.k").cast("bigint")
    return best.select(
        "grp", F.col("n").cast("bigint").alias("n"),
        kk.alias("k_star"),
        F.col("b.ts").alias("ts_split"),
        F.col("b.a").cast("bigint").alias("stat"),
        (F.col("b.a").cast("double")
         / (kk * (F.col("n") - kk)).cast("double")).alias("shift"))
