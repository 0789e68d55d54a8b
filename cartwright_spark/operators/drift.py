"""Distribution-drift monitoring between corpus slices — the
Population Stability Index (PSI), the standard "did my crawl/scorer
distribution move" number a training-data pipeline tracks per refresh.

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i)

over fixed-width value buckets, with add-one (Laplace) smoothing so
empty buckets are defined: p_i = (c_i + 1) / (n + B). Smoothing, bin
edges, and clamping are identical in the SQL oracle; the only
transcendental is ln, evaluated by both engines on bit-identical
double ratios (the established haversine/mercator mirror precedent —
the driver's 6-decimal rounding absorbs libm ulps).

Scale shape (the 100 TB audit):
  1. ONE shuffle: groupBy (group, bucket) with conditional counts for
     the reference and current slices (map-side combinable); bucket
     cardinality is fixed (B), so everything after the first agg is
     metadata-scale.
  2. Totals come from a window over the (group, bucket) rollup — B
     rows per group, not the corpus.
  3. Buckets = clamp(floor(value / width), 0, B-1): exact IEEE
     division + floor, same in both engines; NULL values are dropped
     before bucketing (they are a separate monitoring signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def psi_drift(df: DataFrame, group_col: str = "grp",
              value_col: str = "v", flag_col: str = "is_ref",
              bin_width: float = 5.0, n_bins: int = 20) -> DataFrame:
    """``flag_col``: boolean, True = reference slice, False = current.
    -> (grp, n_ref, n_cur, psi): smoothed PSI per group over
    ``n_bins`` fixed-width buckets of ``value_col``."""
    if bin_width <= 0 or n_bins < 2:
        raise ValueError("psi_drift: bin_width > 0, n_bins >= 2")
    b = F.least(F.greatest(F.floor(F.col(value_col)
                                   / F.lit(float(bin_width))),
                           F.lit(0)), F.lit(n_bins - 1))
    base = (df.where(F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("grp"),
                    b.cast("bigint").alias("bucket"),
                    F.col(flag_col).cast("boolean").alias("is_ref")))
    cnt = (base.groupBy("grp", "bucket")
           .agg(F.sum(F.col("is_ref").cast("long")).alias("c_ref"),
                F.sum((~F.col("is_ref")).cast("long")).alias("c_cur")))
    # densify to ALL n_bins buckets per group (metadata-scale explode):
    # under smoothing an empty bucket still contributes a term unless
    # n_ref == n_cur, so PSI must not depend on which buckets happened
    # to be observed
    full = (cnt.select("grp").distinct()
            .select("grp", F.explode(F.sequence(
                F.lit(0), F.lit(n_bins - 1))).alias("b0"))
            .select("grp", F.col("b0").cast("bigint").alias("bucket")))
    cnt = (full.join(cnt, ["grp", "bucket"], "left")
           .fillna(0, ["c_ref", "c_cur"]))
    w = Window.partitionBy("grp")
    tot = (cnt.withColumn("n_ref", F.sum("c_ref").over(w))
           .withColumn("n_cur", F.sum("c_cur").over(w)))
    p = ((F.col("c_ref") + 1).cast("double")
         / (F.col("n_ref") + n_bins).cast("double"))
    q = ((F.col("c_cur") + 1).cast("double")
         / (F.col("n_cur") + n_bins).cast("double"))
    term = (p - q) * F.log(p / q)
    return (tot.withColumn("term", term)
            .groupBy("grp")
            .agg(F.max("n_ref").cast("bigint").alias("n_ref"),
                 F.max("n_cur").cast("bigint").alias("n_cur"),
                 F.sum("term").alias("psi")))
