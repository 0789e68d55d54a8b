"""Kernel-density heatmap over grid cells (webtext point clouds).

Reference scope note: cartwright has no density-surface layer (its geo
work stops at per-column classification, reference
cartwright/categorize.py); this is engine scope from the brief's
geospatial tier — the standard "where is the activity?" heatmap over
the same cell rollups the tiling layer produces.

Kernel: rational Cauchy-style weight over integer cell offsets,

    density(t) = sum over source cells c within k rings of t of
                 x_c / (1 + dr^2 + dc^2)

(dr/dc the row/col offset, longitude wrapped, latitude clipped). A
rational kernel instead of a Gaussian on purpose: every per-pair term
is one IEEE double division of exact integers — bit-identical in any
engine — so rounding each term to DECIMAL(38,12) and summing decimals
gives an EXACT, associative, order-independent total (same contract as
spatial/measures.py). exp() would hand the 1e-12 rounding edge to two
different libm implementations.

Scale shape (the 100 TB audit):
  1. points -> cell counts: one partial-agg'd shuffle, output bounded
     by the grid, never the corpus.
  2. each occupied cell explodes to its (2k+1)^2 offset targets —
     bounded fan-out of the CELL table — then ONE partial-agg'd
     groupBy(target). No joins, no cartesian, no driver path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .autocorr import cell_counts

KDE_DECIMALS = 12


def kde_term_sql() -> str:
    """Per-(source,offset) decimal term over columns x/dr/dc — one
    generator, two engines."""
    return (f"CAST(CAST(x AS DOUBLE)"
            f" / CAST(1 + dr * dr + dc * dc AS DOUBLE)"
            f" AS DECIMAL(38,{KDE_DECIMALS}))")


def kde_heatmap(points: DataFrame, lat_col: str = "lat",
                lon_col: str = "lon", cell_deg: float = 5.0,
                k: int = 2) -> DataFrame:
    """-> (cell_row, cell_col, n_src, density): smoothed density at
    every grid cell reached by an occupied cell's k-ring neighbourhood.
    `n_src` = contributing source cells; `density` the exact decimal
    kernel sum surfaced as double."""
    ncols = int(round(360.0 / float(cell_deg)))
    nrows = int(round(180.0 / float(cell_deg)))
    if 2 * k + 1 > ncols:
        # with fewer columns than the stencil width, longitude wrap
        # would route one source to the same target via two offsets
        # (double-counting its mass) — reject rather than silently skew
        raise ValueError(
            f"kde_heatmap: stencil 2*k+1={2 * k + 1} exceeds the "
            f"{ncols}-column grid at cell_deg={cell_deg}")
    cells = cell_counts(points, lat_col, lon_col, cell_deg)
    offs = [(dr, dc) for dr in range(-k, k + 1) for dc in range(-k, k + 1)]
    off_arr = "array(" + ",".join(
        f"named_struct('dr', {dr}L, 'dc', {dc}L)" for dr, dc in offs) + ")"
    probes = (cells
              .select("cell_row", "cell_col", "x",
                      F.explode(F.expr(off_arr)).alias("o"))
              .select("x", F.col("o.dr").alias("dr"),
                      F.col("o.dc").alias("dc"),
                      (F.col("cell_row") + F.col("o.dr")).alias("tr"),
                      F.expr(f"((cell_col + o.dc) % {ncols} + {ncols})"
                             f" % {ncols}").alias("tc"))
              .where((F.col("tr") >= 0) & (F.col("tr") <= nrows)))
    agg = (probes
           .groupBy(F.col("tr").alias("cell_row"),
                    F.col("tc").alias("cell_col"))
           .agg(F.count(F.lit(1)).alias("n_src"),
                F.sum(F.expr(kde_term_sql())).alias("__d")))
    return agg.select("cell_row", "cell_col", "n_src",
                      F.col("__d").cast("double").alias("density"))


def idw_interpolate(samples: DataFrame, value_col: str,
                    lat_col: str = "lat", lon_col: str = "lon",
                    cell_deg: float = 5.0, k: int = 2) -> DataFrame:
    """Inverse-distance-weighted interpolation of a sampled field onto
    the grid: samples roll up to per-cell means (exact decimal
    sum/count), then every cell within k rings of a sampled cell gets

        est(t) = sum_c mean_v(c) * w(c,t) / sum_c w(c,t),
        w = 1 / (1 + dr^2 + dc^2)

    — the value-surface sibling of `kde_heatmap` (same bounded offset
    explode, same rational kernel, same DECIMAL(38,12) term rounding so
    both sums are exact and layout-independent).
    -> (cell_row, cell_col, n_src, est)."""
    ncols = int(round(360.0 / float(cell_deg)))
    nrows = int(round(180.0 / float(cell_deg)))
    if 2 * k + 1 > ncols:
        raise ValueError(
            f"idw_interpolate: stencil 2*k+1={2 * k + 1} exceeds the "
            f"{ncols}-column grid at cell_deg={cell_deg}")
    dec = f"decimal(38,{KDE_DECIMALS})"
    r = F.floor((F.col(lat_col) + F.lit(90.0)) / F.lit(float(cell_deg)))
    c = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(float(cell_deg)))
    cells = (samples
             .select(r.cast("bigint").alias("cell_row"),
                     c.cast("bigint").alias("cell_col"),
                     F.col(value_col).cast(dec).alias("__v"))
             .groupBy("cell_row", "cell_col")
             .agg((F.sum("__v").cast("double")
                   / F.count(F.lit(1)).cast("double")).alias("mv")))
    offs = [(dr, dc) for dr in range(-k, k + 1) for dc in range(-k, k + 1)]
    off_arr = "array(" + ",".join(
        f"named_struct('dr', {dr}L, 'dc', {dc}L)" for dr, dc in offs) + ")"
    probes = (cells
              .select("cell_row", "cell_col", "mv",
                      F.explode(F.expr(off_arr)).alias("o"))
              .select("mv", F.col("o.dr").alias("dr"),
                      F.col("o.dc").alias("dc"),
                      (F.col("cell_row") + F.col("o.dr")).alias("tr"),
                      F.expr(f"((cell_col + o.dc) % {ncols} + {ncols})"
                             f" % {ncols}").alias("tc"))
              .where((F.col("tr") >= 0) & (F.col("tr") <= nrows)))
    wterm = ("CAST(CAST(1 AS DOUBLE)"
             " / CAST(1 + dr * dr + dc * dc AS DOUBLE)"
             f" AS DECIMAL(38,{KDE_DECIMALS}))")
    vterm = ("CAST(mv"
             " / CAST(1 + dr * dr + dc * dc AS DOUBLE)"
             f" AS DECIMAL(38,{KDE_DECIMALS}))")
    agg = (probes
           .groupBy(F.col("tr").alias("cell_row"),
                    F.col("tc").alias("cell_col"))
           .agg(F.count(F.lit(1)).alias("n_src"),
                F.sum(F.expr(vterm)).alias("__num"),
                F.sum(F.expr(wterm)).alias("__den")))
    return agg.select(
        "cell_row", "cell_col", "n_src",
        (F.col("__num").cast("double") / F.col("__den").cast("double"))
        .alias("est"))
