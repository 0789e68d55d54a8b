"""Marching-squares contour extraction (raster -> vector): the isoline
segments of a scalar grid at a level c — the inverse direction of
spatial/raster.py rasterize_polygons, closing the vector->raster->
vector roundtrip.

Midpoint (non-interpolating) marching squares: every segment endpoint
is an edge MIDPOINT of a unit grid block, so in x2-scaled coordinates
all geometry is exact integers — engine and SQL oracle share one
16-row case->segment literal table and can never drift.

Saddle convention: case 5 (ll+ur inside) -> {L-T, B-R}; case 10 is its
complement -> {L-B, T-R}. Fixed, documented, no center sampling.

Scale shape (the 100 TB audit):
  1. ONE shuffle total: each grid point explodes into the <= 4 blocks
     it corners (map-only, a 4-row literal lateral), and a single
     groupBy (block) with conditional-max agg reassembles the 2x2
     corner values — map-side combinable, no self-joins, no windows.
  2. Missing corners coalesce to level-1 (outside) — border blocks
     come free from the same explode, no boundary pass.
  3. The case->segments dim is 16 cases / 18 segment rows — broadcast
     by construction; the final join is map-side.
  4. Per-block work is O(1); output is O(isoline length) — the
     operator is output-proportional like any contour tracer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: corner k: 0=ll(0,0) 1=lr(1,0) 2=ur(1,1) 3=ul(0,1); case = sum bit<<k
#: edge midpoints (x2-scaled, relative to block origin):
#:   B=(1,0) R=(2,1) T=(1,2) L=(0,1)
_B, _R, _T, _L = (1, 0), (2, 1), (1, 2), (0, 1)
CASE_SEGMENTS: list[tuple[int, int, int, int, int, int]] = [
    # (case_id, seg_idx, dx1, dy1, dx2, dy2)
    (1, 0, *_L, *_B), (2, 0, *_B, *_R), (3, 0, *_L, *_R),
    (4, 0, *_T, *_R), (5, 0, *_L, *_T), (5, 1, *_B, *_R),
    (6, 0, *_B, *_T), (7, 0, *_L, *_T), (8, 0, *_L, *_T),
    (9, 0, *_B, *_T), (10, 0, *_L, *_B), (10, 1, *_T, *_R),
    (11, 0, *_T, *_R), (12, 0, *_L, *_R), (13, 0, *_B, *_R),
    (14, 0, *_L, *_B),
]

#: the same table as a VALUES clause for the DuckDB oracle
def case_segments_sql() -> str:
    rows = ", ".join(f"({c}, {s}, {a}, {b}, {x}, {y})"
                     for c, s, a, b, x, y in CASE_SEGMENTS)
    return (f"(VALUES {rows}) AS segs(case_id, seg_idx, "
            "dx1, dy1, dx2, dy2)")


def marching_squares(grid: DataFrame, level: int,
                     x_col: str = "x", y_col: str = "y",
                     v_col: str = "v") -> DataFrame:
    """``grid``: integer cell coords + integer values, one row per
    occupied cell (absent cells are below ``level``). -> one row per
    isoline segment: (bx, by, case_id, x1, y1, x2, y2) with endpoints
    in x2-scaled coordinates (edge midpoints are odd/even pairs)."""
    spark = SparkSession.getActiveSession()
    level = int(level)

    pts = grid.select(F.col(x_col).cast("bigint").alias("x"),
                      F.col(y_col).cast("bigint").alias("y"),
                      F.col(v_col).cast("bigint").alias("v"))
    corner = pts.select(
        F.explode(F.array(
            F.struct(F.col("x").alias("bx"), F.col("y").alias("by"),
                     F.lit(0).alias("k")),
            F.struct((F.col("x") - 1).alias("bx"),
                     F.col("y").alias("by"), F.lit(1).alias("k")),
            F.struct((F.col("x") - 1).alias("bx"),
                     (F.col("y") - 1).alias("by"), F.lit(2).alias("k")),
            F.struct(F.col("x").alias("bx"),
                     (F.col("y") - 1).alias("by"), F.lit(3).alias("k")),
        )).alias("c"), "v")

    below = F.lit(level - 1)
    blocks = (corner
              .select(F.col("c.bx").alias("bx"), F.col("c.by").alias("by"),
                      F.col("c.k").alias("k"), "v")
              .groupBy("bx", "by")
              .agg(*[F.coalesce(
                  F.max(F.when(F.col("k") == k, F.col("v"))), below)
                  .alias(f"v{k}") for k in range(4)]))
    case_id = sum(
        ((F.col(f"v{k}") >= level).cast("int") * (1 << k)
         for k in range(4)), F.lit(0))
    blocks = blocks.withColumn("case_id", case_id) \
        .where((F.col("case_id") > 0) & (F.col("case_id") < 15))

    segs = spark.createDataFrame(
        CASE_SEGMENTS,
        ["case_id", "seg_idx", "dx1", "dy1", "dx2", "dy2"])
    return (blocks.join(F.broadcast(segs), "case_id")
            .select("bx", "by", F.col("case_id").cast("bigint")
                    .alias("case_id"),
                    (2 * F.col("bx") + F.col("dx1")).alias("x1"),
                    (2 * F.col("by") + F.col("dy1")).alias("y1"),
                    (2 * F.col("bx") + F.col("dx2")).alias("x2"),
                    (2 * F.col("by") + F.col("dy2")).alias("y2")))
