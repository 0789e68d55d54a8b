"""Raster ↔ vector tile assignment (SURVEY.md §2.3 J8).

Point → tile is pure column math (functions/geodesy.tile_*_col). This
module adds the vector side: polygons → the set of z/x/y tiles their bbox
overlaps (driver-side numpy over the broadcast-scale polygon dim), and the
tile-level join that assigns points to polygon fragments without any
geometry test in the hot path — the per-tile equi-join IS the spatial
pre-filter; exact refinement (if needed) is pip.point_in_polygon_join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartwright_spark.functions.geodesy import (tile_id_col, tile_x_col,
                                                tile_xy_np, tile_y_col)


def tile_id_np(x: np.ndarray, y: np.ndarray, zoom: int) -> np.ndarray:
    return (np.int64(zoom) << np.int64(58)) | (x.astype(np.int64) << np.int64(29)) | y.astype(np.int64)


def polygon_tile_cover(polygons: pd.DataFrame, zoom: int) -> pd.DataFrame:
    """(admin_id, tile_id, tile_x, tile_y) for every tile whose extent
    overlaps the polygon bbox. Polygon dims are metadata-scale → driver."""
    rows = []
    for r in polygons.itertuples(index=False):
        la = np.asarray(r.ring_lat, float)
        lo = np.asarray(r.ring_lon, float)
        x0, y1 = tile_xy_np(np.array([la.min()]), np.array([lo.min()]), zoom)
        x1, y0 = tile_xy_np(np.array([la.max()]), np.array([lo.max()]), zoom)
        for tx in range(int(x0[0]), int(x1[0]) + 1):
            for ty in range(int(y0[0]), int(y1[0]) + 1):
                rows.append((r.admin_id, int(tile_id_np(np.array(tx), np.array(ty), zoom)),
                             tx, ty))
    return pd.DataFrame(rows, columns=["admin_id", "tile_id", "tile_x", "tile_y"])


def assign_points_to_polygons_by_tile(
        spark: SparkSession, points: DataFrame, polygons: pd.DataFrame,
        zoom: int = 8, lat_col: str = "lat", lon_col: str = "lon",
        point_id_col: str = "point_id") -> DataFrame:
    """(point_id, admin_id, tile_id): tile-granular raster↔vector
    assignment — broadcast equi-join on tile id (candidate semantics:
    bbox-tile overlap, no exact geometry here)."""
    cover = F.broadcast(spark.createDataFrame(polygon_tile_cover(polygons, zoom)))
    pts = points.select(
        F.col(point_id_col).alias("point_id"),
        tile_id_col(F.col(lat_col), F.col(lon_col), zoom).alias("tile_id"))
    return pts.join(cover, "tile_id", "inner") \
        .select("point_id", "admin_id", "tile_id")


def tile_pyramid(points: DataFrame, lat_col: str = "lat",
                 lon_col: str = "lon", z_max: int = 6) -> DataFrame:
    """Multi-resolution tile rollup: (z, tile_x, tile_y, n_points) for
    every zoom 0..z_max in one pass — the hypertable-rollup shape.

    Scale shape (the 100 TB audit): the CORPUS is shuffled exactly once
    (the z_max rollup, output bounded by 4^z_max tiles); coarser zooms
    come from an ancestor explode of the TILE table (fan-out z_max+1,
    ancestor = tx >> k) into a second grid-bounded agg. Never roll up
    the points per zoom — that would be z_max corpus shuffles."""
    base = (points
            .select(tile_x_col(F.col(lon_col), z_max).alias("tx"),
                    tile_y_col(F.col(lat_col), z_max).alias("ty"))
            .groupBy("tx", "ty")
            .agg(F.count(F.lit(1)).alias("n")))
    ks = "array(" + ",".join(f"{k}L" for k in range(z_max + 1)) + ")"
    # shiftleft via F.expr: the Python F.shiftleft requires a literal
    # shift amount, and tx >= 0 makes DIV equal to DuckDB's // here.
    return (base
            .select("tx", "ty", "n", F.explode(F.expr(ks)).alias("k"))
            .select((F.lit(z_max) - F.col("k")).alias("z"),
                    F.expr("tx DIV shiftleft(CAST(1 AS BIGINT), k)")
                    .alias("tile_x"),
                    F.expr("ty DIV shiftleft(CAST(1 AS BIGINT), k)")
                    .alias("tile_y"),
                    "n")
            .groupBy("z", "tile_x", "tile_y")
            .agg(F.sum("n").alias("n_points")))


def adaptive_tiles(points: DataFrame, lat_col: str = "lat",
                   lon_col: str = "lon", z_max: int = 6,
                   cap: int = 1000) -> DataFrame:
    """Adaptive quadtree binning: the coarsest tiles with
    n_points <= ``cap`` — dense regions split to finer zooms, sparse
    regions stay coarse. -> (z, tile_x, tile_y, n_points, overflow)
    where overflow marks z_max tiles still above the cap (they cannot
    split further).

    Leaf rule (no iteration needed): counts shrink down the tile tree,
    so the leaf covering a region is the FIRST below-cap tile on its
    root-to-leaf path — exactly { root if n <= cap } ∪ { tile at z > 0
    with n <= cap and parent n > cap } ∪ { z_max tiles with n > cap }.
    Leaves tile the occupied space: disjoint by construction (a leaf's
    ancestors are all above cap, so never leaves), complete because
    every occupied z_max tile has some ancestor chain crossing the cap.

    Scale shape: ONE corpus shuffle (tile_pyramid's z_max rollup); the
    pyramid is grid-bounded (<= 4^z_max + ... rows) and checkpointed,
    so the child↔parent equi-join is metadata-scale and re-reads the
    materialized table instead of re-running the corpus pass twice.
    """
    cap = int(cap)
    if cap < 1:
        raise ValueError("adaptive_tiles: cap must be >= 1")
    pyr = (tile_pyramid(points, lat_col, lon_col, z_max)
           .localCheckpoint(eager=True))
    parent = pyr.select((F.col("z") + 1).alias("z"),
                        F.col("tile_x").alias("px"),
                        F.col("tile_y").alias("py"),
                        F.col("n_points").alias("parent_n"))
    child = pyr.withColumn("px", F.expr("tile_x DIV 2")) \
               .withColumn("py", F.expr("tile_y DIV 2"))
    joined = child.join(parent, ["z", "px", "py"], "left")
    return (joined
            .where(((F.col("n_points") <= cap)
                    & (F.col("parent_n").isNull()
                       | (F.col("parent_n") > cap)))
                   | ((F.col("z") == z_max) & (F.col("n_points") > cap)))
            .select("z", "tile_x", "tile_y", "n_points",
                    ((F.col("z") == z_max) & (F.col("n_points") > cap))
                    .alias("overflow")))


def compact_cells(cells: DataFrame, z_max: int,
                  x_col: str = "tx", y_col: str = "ty") -> DataFrame:
    """Hierarchical cell-set compaction: -> the MINIMAL (z, tx, ty)
    tile set covering exactly the input z_max cell set — every
    complete 4-sibling group is replaced by its parent, recursively
    (the H3 compactCells / S2 CellUnion normalization, on the
    quadtree). Input duplicates are absorbed by a distinct.

    Scale shape (the 100 TB audit):
      1. One round per level, z_max rounds total: a round is ONE
         map-side-combinable groupBy (parent) counting siblings, plus
         a broadcast-able anti-join (complete parents are at most a
         quarter of the level's cells). Cells shrink geometrically as
         levels coarsen; per-round localCheckpoint truncates lineage.
      2. Exactness: a parent promotes iff count(distinct children
         present at this level) == 4 — children are distinct rows by
         construction, so a plain count works.
      3. Output invariant (tested): expanding the output back to
         z_max reproduces the input set exactly, and no two output
         cells are ancestor-related.
    """
    if z_max < 1:
        raise ValueError("compact_cells: z_max must be >= 1")
    # tile coords are non-negative by definition; /2-cast truncation
    # and SQL floor-division disagree below zero, so reject early
    neg_guard = F.when((F.col("tx") >= 0) & (F.col("ty") >= 0),
                       F.col("tx")).otherwise(F.raise_error(F.lit(
                           "compact_cells: negative tile coord")))
    lvl = cells.select(F.col(x_col).cast("bigint").alias("tx"),
                       F.col(y_col).cast("bigint").alias("ty")) \
        .withColumn("tx", neg_guard) \
        .distinct().localCheckpoint(eager=True)
    kept = []
    for z in range(z_max, 0, -1):
        parents = (lvl.groupBy((F.col("tx") / 2).cast("bigint")
                               .alias("px"),
                               (F.col("ty") / 2).cast("bigint")
                               .alias("py"))
                   .agg(F.count("*").alias("n"))
                   .where(F.col("n") == 4)
                   .select("px", "py"))
        stay = (lvl.join(parents,
                         ((F.col("tx") / 2).cast("bigint")
                          == F.col("px"))
                         & ((F.col("ty") / 2).cast("bigint")
                            == F.col("py")), "left_anti")
                .select(F.lit(z).cast("bigint").alias("z"), "tx", "ty"))
        kept.append(stay)
        lvl = parents.select(F.col("px").alias("tx"),
                             F.col("py").alias("ty")) \
            .localCheckpoint(eager=True)
        if lvl.isEmpty():
            break
    out = kept[0]
    for k in kept[1:]:
        out = out.unionByName(k)
    root_z = z_max - len(kept)
    return out.unionByName(
        lvl.select(F.lit(root_z).cast("bigint").alias("z"), "tx", "ty"))
