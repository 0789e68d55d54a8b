"""Seasonal profile decomposition for event streams: per (group,
season-bucket) mean vs the group mean — the classical seasonal-index
step of time-series decomposition, restricted to what is exactly
distributable (bucket means), leaving the moving-average trend to
acf/sen_slope/ols_trend which already cover it.

Exactness: y is integer-quantized by the caller; cell sums/counts are
BIGINT; the two means and the seasonal index are single float
divisions over exact integers.

Scale shape: the corpus is scanned ONCE into (group, bucket) cells —
one algebraic groupBy, G x P rows out. Group totals are re-aggregated
FROM THE CELLS (dim-scale input), not from a second corpus pass, and
come back via an equi-join on the group key. No window, no driver
state.

Reference scope note: no time-series layer in jataware/cartwright —
engine scope (corpus-health tier: "is Tuesday traffic shaped like
Friday traffic").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def seasonal_profile(df: DataFrame, group_col: str, bucket: Column,
                     y_col: str) -> DataFrame:
    """-> (grp, bucket, n, cell_mean, seasonal) where seasonal =
    cell_mean - group_mean. ``bucket`` is any integer Column derived
    from the row (e.g. F.hour("ts"))."""
    y = F.col(y_col).cast("bigint")
    cells = (df.select(F.col(group_col).alias("grp"),
                       bucket.cast("int").alias("bucket"), y.alias("y"))
             .groupBy("grp", "bucket")
             .agg(F.sum("y").alias("s"),
                  F.count(F.lit(1)).alias("n")))
    # totals re-aggregate the CELLS (dim-scale), so the join below is a
    # self-join by lineage — explicit aliases keep resolution unambiguous
    totals = (cells.groupBy("grp")
              .agg(F.sum("s").alias("ts"), F.sum("n").alias("tn")))
    cm = F.col("c.s").cast("double") / F.col("c.n")
    gm = F.col("t.ts").cast("double") / F.col("t.tn")
    return (cells.alias("c")
            .join(totals.alias("t"), F.col("c.grp") == F.col("t.grp"))
            .select(F.col("c.grp").alias("grp"), F.col("c.bucket").alias("bucket"),
                    F.col("c.n").cast("bigint").alias("n"),
                    cm.alias("cell_mean"),
                    (cm - gm).alias("seasonal")))
