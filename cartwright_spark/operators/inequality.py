"""Concentration / inequality measures over grouped corpora — e.g. how
concentrated a crawl is on a few hosts, or spend across orders. The
Gini coefficient is the standard single-number answer.

Exact-arithmetic form: with y sorted ascending within the group and
rank i = 1..n,

    G = (2 * sum(i * y_i) - (n + 1) * sum(y)) / (n * sum(y))

Both numerator and denominator are exact BIGINTs (ties contribute the
same sum under any tie order, so row_number needs no tie-break column);
the only float is the final division, performed identically by the SQL
oracle.

Scale shape (the 100 TB audit):
  1. ONE shuffle: the rank window partitions by grp and sorts by y;
     the following groupBy(grp) reuses that partitioning (no second
     exchange — plan-gated in tests).
  2. sum(i * y_i) <= n^2 * max_y/2 per group: with int64 this bounds
     n * sqrt(max_y) ~ 3e9 — guard documented, overflow raises in ANSI
     mode rather than wrapping.
  3. Hot groups are a single sorted partition each; for extreme skew
     pre-aggregate equal y values (i becomes a range -> arithmetic
     series), not implemented here because rank windows already spill
     gracefully.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gini_concentration(df: DataFrame, group_col: str = "grp",
                       value_col: str = "y") -> DataFrame:
    """-> (grp, n, total, num, den, gini): Gini coefficient per group
    over non-negative integer values. Rows with NULL or negative
    values are rejected (Gini is undefined for negative mass)."""
    vals = df.select(F.col(group_col).alias("grp"),
                     F.col(value_col).cast("bigint").alias("y")) \
        .where(F.col("y").isNotNull())
    vals = vals.withColumn(
        "y", F.when(F.col("y") >= 0, F.col("y"))
              .otherwise(F.raise_error(F.lit(
                  "gini_concentration: negative value"))))
    w = Window.partitionBy("grp").orderBy("y")
    ranked = vals.withColumn("i", F.row_number().over(w))
    return (ranked.groupBy("grp")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.sum("y").cast("bigint").alias("total"),
                 F.sum(F.col("i") * F.col("y")).cast("bigint").alias("iy"))
            .select("grp", "n", "total",
                    (2 * F.col("iy")
                     - (F.col("n") + 1) * F.col("total"))
                    .cast("bigint").alias("num"),
                    (F.col("n") * F.col("total"))
                    .cast("bigint").alias("den"))
            .withColumn("gini",
                        F.when(F.col("den") > 0,
                               F.col("num").cast("double")
                               / F.col("den").cast("double"))
                        .otherwise(F.lit(0.0))))
