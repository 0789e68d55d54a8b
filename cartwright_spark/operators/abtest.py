"""Experiment-analysis operators: two-proportion z-test per experiment
arm pair, and k-anonymity audit of quasi-identifier combinations —
the two checks a data pipeline runs before shipping a curated corpus
change ("did the new filter move the metric", "does the released slice
leak identities").

Both are single algebraic rollups; the statistics are closed-form
float expressions over exact BIGINT counts, written in the expression
shape the oracle replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ab_ztest(df: DataFrame, exp_col: str, variant_col: str,
             success_col: str, control: str, treatment: str
             ) -> DataFrame:
    """Per experiment: the two-proportion pooled z statistic

        z = (p_t - p_c) / sqrt( p·(1-p) · (1/n_c + 1/n_t) )

    -> (exp, n_c, x_c, n_t, x_t, p_c, p_t, z). Degenerate pooled
    variance (p in {0, 1}) yields NULL z rather than a division blowup.

    Scale shape: ONE groupBy on the experiment key with conditional
    partial aggregates (sum of when-indicators — map-side combine
    absorbs arm skew); no window, no second pass.
    """
    v = F.col(variant_col)
    s = F.col(success_col).cast("bigint")
    agg = (df.groupBy(F.col(exp_col).alias("exp"))
           .agg(F.sum(F.when(v == control, 1).otherwise(0))
                .cast("bigint").alias("n_c"),
                F.sum(F.when(v == control, s).otherwise(0))
                .cast("bigint").alias("x_c"),
                F.sum(F.when(v == treatment, 1).otherwise(0))
                .cast("bigint").alias("n_t"),
                F.sum(F.when(v == treatment, s).otherwise(0))
                .cast("bigint").alias("x_t")))
    p_c = F.col("x_c").cast("double") / F.col("n_c")
    p_t = F.col("x_t").cast("double") / F.col("n_t")
    pool = ((F.col("x_c") + F.col("x_t")).cast("double")
            / (F.col("n_c") + F.col("n_t")))
    var = (pool * (1.0 - pool)
           * (1.0 / F.col("n_c") + 1.0 / F.col("n_t")))
    return (agg.where((F.col("n_c") > 0) & (F.col("n_t") > 0))
            .select("exp", "n_c", "x_c", "n_t", "x_t",
                    p_c.alias("p_c"), p_t.alias("p_t"),
                    F.when(var > 0,
                           (p_t - p_c) / F.sqrt(var)).alias("z")))


def k_anonymity(df: DataFrame, quasi_cols: list, k: int = 5
                ) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): every quasi-identifier
    combination carried by FEWER than ``k`` rows is a re-identification
    risk -> (quasi_cols..., n_rows, deficit) for violating combos only.

    ONE algebraic groupBy on the quasi tuple; the violating output is
    by construction small (each row represents < k corpus rows), so
    the HAVING-style filter also caps output volume at web scale.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if k < 2:
        raise ValueError("k must be >= 2")
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .where(F.col("n_rows") < F.lit(int(k)))
            .withColumn("deficit",
                        (F.lit(int(k)) - F.col("n_rows"))
                        .cast("bigint")))
