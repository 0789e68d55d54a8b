"""Classifier calibration audit — reliability bins and the per-bin
calibration gap (the ingredients of ECE, expected calibration error):
for predicted probabilities p in [0, 1] and binary labels, bucket into
``bins`` equal-width bins and compare mean confidence to empirical
accuracy per bin. The quality-scoring tier (bigram_lm_score,
linear_score, naive_bayes) produces exactly such scores; this operator
is how a pipeline decides whether their thresholds mean anything.

Scale shape: ONE algebraic groupBy on the bin index (sum/count/sum of
p partials map-side); the ECE weight n/N needs the total, which is
re-aggregated from the B bin rows and broadcast back — never a second
corpus pass. Bin index = least(floor(p*B), B-1) so p = 1.0 lands in
the top bin, replayed identically in the oracle.

Reference scope note: cartwright's category fixtures check label
EQUALITY, never score calibration — engine scope for the training-data
tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibration_bins(df: DataFrame, score_col: str, label_col: str,
                     bins: int = 10) -> DataFrame:
    """-> (bin, n, mean_pred, frac_pos, abs_gap, ece_term) per
    non-empty bin; sum(ece_term) over the output is the ECE."""
    if bins < 2 or bins > 100_000:
        raise ValueError("bins must be in [2, 1e5]")
    p = F.col(score_col).cast("double")
    b = F.least(F.floor(p * F.lit(int(bins))),
                F.lit(int(bins) - 1)).cast("int")
    agg = (df.select(b.alias("bin"), p.alias("p"),
                     F.col(label_col).cast("bigint").alias("y"))
           .groupBy("bin")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("p").alias("sp"),
                F.sum("y").alias("npos")))
    # the total re-aggregates the B bin rows (never a second corpus
    # pass) — a self-join by lineage, so alias both sides explicitly
    tot = agg.agg(F.sum("n").alias("total"))
    mean_pred = F.col("a.sp") / F.col("a.n")
    frac_pos = F.col("a.npos").cast("double") / F.col("a.n")
    gap = F.abs(mean_pred - frac_pos)
    return (agg.alias("a").crossJoin(F.broadcast(tot.alias("t")))
            .select(F.col("a.bin").alias("bin"),
                    F.col("a.n").cast("bigint").alias("n"),
                    mean_pred.alias("mean_pred"),
                    frac_pos.alias("frac_pos"),
                    gap.alias("abs_gap"),
                    (gap * F.col("a.n") / F.col("t.total"))
                    .alias("ece_term")))
