"""Terrain analysis on raster grids: Horn's method slope/aspect and
the standard GIS hillshade (Horn 1981, the ESRI/GDAL convention) —
the raster-derivative tier next to zonal_stats/raster_overlay/
cost_distance.

Neighborhood access is the scatter-gather shape, not a self-join per
direction: every cell SCATTERS its elevation to the 9 cells of its
3x3 footprint (a 9-way in-row explode — map-side, no join), then ONE
algebraic groupBy on the target cell gathers the eight directional
sums as conditional aggregates. Border cells (fewer than 9
contributions) are dropped, exactly like the oracle. At web scale
that is one shuffle keyed by cell id with map-side combine — the same
plan as j8 tile rollups — versus the 8 shuffled self-joins a naive
port would write.

Elevations are integer-quantized by the caller so the gathered sums
are exact BIGINT; the slope/aspect/hillshade trig is a fixed float
expression shape over those sums (identical literals both engines).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def hillshade(grid: DataFrame, x_col: str = "x", y_col: str = "y",
              z_col: str = "z", cellsize: float = 1.0,
              azimuth_deg: float = 315.0,
              altitude_deg: float = 45.0) -> DataFrame:
    """-> (x, y, dzdx, dzdy, hillshade) for every INTERIOR cell.

    Horn weights (rx east-positive, ry north-positive):
        dz/dx = ((c + 2f + i) - (a + 2d + g)) / (8 * cellsize)
        dz/dy = ((a + 2b + c) - (g + 2h + i)) / (8 * cellsize)
    aspect = atan2(dz/dy, -dz/dx); hillshade clamped at 0 and scaled
    to the classic 0..255 range."""
    if cellsize <= 0:
        raise ValueError("cellsize must be positive")
    zen = math.radians(90.0 - altitude_deg)
    # GDAL/ESRI convention: with aspect = atan2(dzdy, -dzdx), the
    # lighting term is cos(azimuth - pi/2 - aspect)
    az = math.radians(azimuth_deg) - math.pi / 2.0

    off = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx, dy in _OFFSETS])
    scat = (grid.select(F.col(x_col).alias("sx"),
                        F.col(y_col).alias("sy"),
                        F.col(z_col).cast("bigint").alias("z"),
                        F.explode(off).alias("o"))
            .select((F.col("sx") + F.col("o.dx")).alias("tx"),
                    (F.col("sy") + F.col("o.dy")).alias("ty"),
                    # position of the SOURCE relative to the target
                    (-F.col("o.dx")).alias("rx"),
                    (-F.col("o.dy")).alias("ry"),
                    "z"))

    def s(rx: int, ry: int):
        return F.sum(F.when((F.col("rx") == rx) & (F.col("ry") == ry),
                            F.col("z")).otherwise(0)).cast("bigint")

    g = (scat.groupBy(F.col("tx").alias("x"), F.col("ty").alias("y"))
         .agg(F.count(F.lit(1)).alias("n9"),
              s(-1, 1).alias("a"), s(0, 1).alias("b"),
              s(1, 1).alias("c"), s(-1, 0).alias("d"),
              s(1, 0).alias("f"), s(-1, -1).alias("g"),
              s(0, -1).alias("h"), s(1, -1).alias("i"))
         .where(F.col("n9") == 9))

    denom = 8.0 * cellsize
    dzdx = ((F.col("c") + 2 * F.col("f") + F.col("i"))
            - (F.col("a") + 2 * F.col("d") + F.col("g"))) \
        .cast("double") / F.lit(denom)
    dzdy = ((F.col("a") + 2 * F.col("b") + F.col("c"))
            - (F.col("g") + 2 * F.col("h") + F.col("i"))) \
        .cast("double") / F.lit(denom)
    slope = F.atan(F.sqrt(dzdx * dzdx + dzdy * dzdy))
    aspect = F.atan2(dzdy, -dzdx)
    shade = 255.0 * (F.lit(math.cos(zen)) * F.cos(slope)
                     + F.lit(math.sin(zen)) * F.sin(slope)
                     * F.cos(F.lit(az) - aspect))
    return g.select("x", "y", dzdx.alias("dzdx"), dzdy.alias("dzdy"),
                    F.greatest(F.lit(0.0), shade).alias("hillshade"))
