"""Fixed-iteration Lloyd's k-means over 2-D integer coordinates —
cross-engine DETERMINISTIC by construction, so an unrolled SQL
re-derivation checks it value-for-value (no seeds, no float drift):

* inputs are integers; each update step's centroid is a weighted
  sum/count where the integer sums are exact in a double below 2^53,
  so both engines produce bit-identical centroids regardless of
  summation order;
* every later arithmetic step (diff, square, add, divide) is the same
  IEEE-754 expression tree in both engines — bit-identical again;
* assignment ties break on the smallest cluster id via a lexicographic
  min over (dist², cid).

Initialization is data-derived and O(1): k centroids evenly spaced on
the diagonal of the integer bounding box (exact min/max aggregates) —
no sampled seeds, no global sort.

Scale shape: the corpus is pre-collapsed to DISTINCT coordinates with
an integer multiplicity weight (one shuffle, done once — crawl
geodata repeats coordinates heavily, so this also shrinks the working
set); per iteration the k-row centroid table is BROADCAST to the
points (no corpus shuffle), the argmin is a map-side lexicographic
min, and the update is ONE algebraic groupBy(cid) with map-side
partials — per-round shuffle volume is O(k · partitions). Weighted
Lloyd over (coordinate, multiplicity) is exactly standard Lloyd over
the raw rows. A hot cluster costs nothing extra: partial sums absorb
the skew map-side; there is no per-cid sort anywhere. Lineage is
truncated per round with an eager localCheckpoint on the k-row table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _d2():
    return ((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
            + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy")))


def kmeans_lloyd(points: DataFrame, x_col: str, y_col: str,
                 k: int = 8, iters: int = 4) -> DataFrame:
    """Returns one row per cluster: (cid, cx, cy, n_points) where
    n_points counts RAW input rows (multiplicity preserved).

    Clusters that end an iteration empty keep their previous centroid
    (standard Lloyd handling) and report n_points = 0.
    """
    pts = (points.select(F.col(x_col).cast("long").alias("x"),
                         F.col(y_col).cast("long").alias("y"))
           .groupBy("x", "y").agg(F.count(F.lit(1)).alias("w"))
           .localCheckpoint(eager=True))
    bounds = pts.agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                     F.min("y").alias("y0"), F.max("y").alias("y1"))
    # k centroids on the bbox diagonal: c_j = lo + j·(hi-lo)/(k-1)
    cids = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("cid")
    denom = float(max(k - 1, 1))
    cents = (bounds.select(cids, "x0", "x1", "y0", "y1")
             .select("cid",
                     (F.col("x0") + F.col("cid") * (F.col("x1") - F.col("x0"))
                      / F.lit(denom)).alias("cx"),
                     (F.col("y0") + F.col("cid") * (F.col("y1") - F.col("y0"))
                      / F.lit(denom)).alias("cy"))
             .localCheckpoint(eager=True))

    def assign(c):
        return (pts.crossJoin(F.broadcast(c))
                .select("x", "y", "w",
                        F.struct(_d2().alias("d2"), F.col("cid")).alias("dc"))
                .groupBy("x", "y", "w")
                .agg(F.min("dc").alias("dc"))
                .select("x", "y", "w", F.col("dc.cid").alias("cid")))

    for _ in range(iters):
        upd = (assign(cents).groupBy("cid")
               .agg(F.sum(F.col("x") * F.col("w")).alias("sx"),
                    F.sum(F.col("y") * F.col("w")).alias("sy"),
                    F.sum("w").alias("n")))
        cents = (cents.join(upd, "cid", "left")
                 .select("cid",
                         F.when(F.col("n").isNotNull(),
                                F.col("sx").cast("double") / F.col("n"))
                         .otherwise(F.col("cx")).alias("cx"),
                         F.when(F.col("n").isNotNull(),
                                F.col("sy").cast("double") / F.col("n"))
                         .otherwise(F.col("cy")).alias("cy"))
                 .localCheckpoint(eager=True))

    final = (assign(cents).groupBy("cid")
             .agg(F.sum("w").alias("n_points")))
    return (cents.join(final, "cid", "left")
            .select("cid", "cx", "cy",
                    F.coalesce("n_points", F.lit(0)).alias("n_points")))
