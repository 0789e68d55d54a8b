"""Distributed convex hull per group — the hull-of-hulls reduction.

Output = the STRICT hull vertices (corner points of the hull polygon;
collinear mid-edge points excluded), as rows (grp, x, y). Strictness
makes the result a pure function of the point SET, so it is
partition-invariant and admits an exact integer SQL oracle: p is an
upper-hull vertex iff NO chord between points left and right of it
passes on-or-above p (one integer cross product per triple).

Reference scope note: jataware/cartwright has no polygon construction;
this is engine scope (footprint polygons for detected point clusters —
the step after dbscan/grid_cluster labelling).

Scale shape (the 100 TB audit):
  1. Stage 0 is a plain JVM groupBy (grp, partition_id, x) keeping only
     the min/max y — map-side combinable, so the shuffle carries at
     most 2 rows per distinct x per group-partition, NOT the corpus.
     This is exact: a hull vertex is always a per-x y-extreme.
  2. Stage 1 runs Andrew's monotone chain per (grp, partition_id) on
     those extremes (Arrow-batched applyInPandas; the Python loop is
     over the REDUCED candidate set). hull(S) ⊆ ∪ hull(S_i) for any
     partition of S, so local hulls are a lossless reduction.
  3. Stage 2 re-runs the same chain per grp over the surviving
     candidates (|partitions| x |local hull| rows — metadata scale).
     Hot groups cost |their partitions| small hulls, never a global
     sort.
  4. Cross products are exact int64; coordinates must fit |coord| <
     ~1.5e9 (guarded) so (dx * dy) cannot overflow.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COORD_LIMIT = 1_500_000_000


def _chain(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain on int64 coords -> indices of the strict
    hull vertices (upper ∪ lower), deduplicated."""
    order = np.lexsort((ys, xs))
    pts = np.stack([xs[order], ys[order]], axis=1)
    # dedupe identical points (stage-0 extremes can repeat at min==max)
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (np.diff(pts[:, 0]) != 0) | (np.diff(pts[:, 1]) != 0)
    pts = pts[keep]
    idx = order[keep]
    if len(pts) <= 2:
        return idx

    def half(rng: Iterable[int]) -> list[int]:
        stack: list[int] = []
        for i in rng:
            while len(stack) >= 2:
                ax, ay = pts[stack[-2]]
                bx, by = pts[stack[-1]]
                # pop non-LEFT turns: collinear mid-edge points go too
                if ((bx - ax) * (pts[i, 1] - ay)
                        - (by - ay) * (pts[i, 0] - ax)) <= 0:
                    stack.pop()
                else:
                    break
            stack.append(i)
        return stack

    lower = half(range(len(pts)))
    upper = half(range(len(pts) - 1, -1, -1))
    return idx[np.unique(np.array(lower + upper, dtype=np.int64))]


def _hull_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    xs = pdf["x"].to_numpy(np.int64)
    ys = pdf["y"].to_numpy(np.int64)
    k = _chain(xs, ys)
    return pd.DataFrame({"grp": pdf["grp"].iloc[0],
                         "x": xs[k], "y": ys[k]})


def convex_hull(pts: DataFrame, group_col: str = "grp",
                x_col: str = "x", y_col: str = "y") -> DataFrame:
    """-> (grp, x, y): the strict convex-hull vertex set per group.
    Integer coordinates only (exact cross products)."""
    base = (pts.select(F.col(group_col).alias("grp"),
                       F.col(x_col).cast("bigint").alias("x"),
                       F.col(y_col).cast("bigint").alias("y"))
            .where(F.col("x").isNotNull() & F.col("y").isNotNull()))
    guarded = base.withColumn(
        "x", F.when(F.abs("x") < _COORD_LIMIT, F.col("x"))
              .otherwise(F.raise_error(F.lit(
                  "convex_hull: |coord| too large for exact int64 cross"))))

    # stage 0: per-(grp, partition, x) y-extremes — map-side combine
    ext = (guarded.withColumn("pid", F.spark_partition_id())
           .groupBy("grp", "pid", "x")
           .agg(F.min("y").alias("y_min"), F.max("y").alias("y_max")))
    cand = (ext.select("grp", "pid", "x", F.col("y_min").alias("y"))
            .unionByName(
                ext.select("grp", "pid", "x", F.col("y_max").alias("y")))
            .distinct())

    schema = "grp " + dict(base.dtypes)["grp"] + ", x bigint, y bigint"
    # stage 1: local hulls per (grp, pid); stage 2: final hull per grp
    local = cand.groupBy("grp", "pid").applyInPandas(
        lambda pdf: _hull_pdf(pdf), schema=schema)
    return local.groupBy("grp").applyInPandas(
        lambda pdf: _hull_pdf(pdf), schema=schema)
