"""Zonal statistics — per-zone rollups of a point measure.

The raster-GIS classic (every ArcGIS/QGIS toolbox ships ZonalStatistics;
public semantics): given point observations and a set of named zones,
report count / sum / min / max / mean of a measure per zone. Web-scale
use: per-region engagement rollups over event streams, quality-score
aggregation over crawl-geography fences.

Zones here are axis-aligned lat/lon boxes (the fence form every
dashboard uses; polygon zones belong to spatial/pip.py — this operator
is the fast path for the rectangular 99%). A point inside k overlapping
zones counts in each (documented: zones are independent fences, not a
partition).

Spark-first shape (the tiles/radius-join discipline — NEVER a
broadcast nested-loop range join, which is O(points x zones) evaluated
per row):
  1. zones explode to the coarse grid cells their box covers
     (sequence() x sequence() — bounded by box area / cell area, and
     guarded with raise_error so a continent-sized box at a too-fine
     cell size fails loudly instead of exploding);
  2. points bin to their single cell — ONE equi-join on cell_id brings
     each point only the zones whose boxes touch its cell;
  3. an exact BETWEEN refine keeps true containment; the final rollup
     is algebraic (count/sum/min/max partials absorb hot-zone skew).
The measure is INTEGER (exactness contract — mean is emitted as the
single float division sum/n, the house posture).

Reference parity: jataware/cartwright classifies lat/lon columns
(taxonomy validators) but has no spatial aggregation; engine scope for
the geospatial tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_CELLS_PER_ZONE = 100_000


def zonal_stats(points: DataFrame, zones: DataFrame,
                lat_col: str = "lat", lon_col: str = "lon",
                measure_col: str = "m",
                cell_deg: float = 5.0) -> DataFrame:
    """-> (zone_id, n, m_sum, m_min, m_max, m_mean) per zone with >= 1
    contained point. ``zones``: (zone_id, lat_min, lat_max, lon_min,
    lon_max), inclusive bounds. Zone tables are dimension-sized and
    broadcast; the cell explode keeps the join an equi-join."""
    if cell_deg <= 0:
        raise ValueError("zonal_stats: cell_deg must be positive")
    cy = (F.floor(F.col(lat_col) / F.lit(cell_deg))).cast("bigint")
    cx = (F.floor(F.col(lon_col) / F.lit(cell_deg))).cast("bigint")
    pts = points.select(
        F.col(lat_col).alias("lat"), F.col(lon_col).alias("lon"),
        F.col(measure_col).cast("bigint").alias("m"),
        (cy * F.lit(1 << 20) + cx).alias("cell"))

    y0 = F.floor(F.col("lat_min") / F.lit(cell_deg)).cast("bigint")
    y1 = F.floor(F.col("lat_max") / F.lit(cell_deg)).cast("bigint")
    x0 = F.floor(F.col("lon_min") / F.lit(cell_deg)).cast("bigint")
    x1 = F.floor(F.col("lon_max") / F.lit(cell_deg)).cast("bigint")
    n_cells = (y1 - y0 + 1) * (x1 - x0 + 1)
    guarded = zones.withColumn(
        "__nc",
        F.when(n_cells <= F.lit(_MAX_CELLS_PER_ZONE), n_cells)
        .otherwise(F.raise_error(F.lit(
            "zonal_stats: a zone covers more grid cells than "
            f"{_MAX_CELLS_PER_ZONE} — raise cell_deg"))))
    zcells = (guarded
              .where(F.col("__nc") > 0)
              .select("zone_id", "lat_min", "lat_max", "lon_min",
                      "lon_max",
                      F.explode(F.sequence(y0, y1)).alias("cy"))
              .select("*", F.explode(F.sequence(x0, x1)).alias("cx"))
              .select("zone_id", "lat_min", "lat_max", "lon_min",
                      "lon_max",
                      (F.col("cy") * F.lit(1 << 20) + F.col("cx"))
                      .alias("cell")))

    hit = (pts.join(F.broadcast(zcells), "cell")
           .where(F.col("lat").between(F.col("lat_min"),
                                       F.col("lat_max"))
                  & F.col("lon").between(F.col("lon_min"),
                                         F.col("lon_max"))))
    return (hit.groupBy("zone_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("m").alias("m_sum"),
                 F.min("m").alias("m_min"),
                 F.max("m").alias("m_max"),
                 (F.sum("m").cast("double")
                  / F.count(F.lit(1))).alias("m_mean")))
