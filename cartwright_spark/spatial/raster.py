"""Polygon rasterization (vector -> raster): emit every unit grid cell
whose CENTER lies inside the polygon (even-odd rule over all of the
polygon's rings, so holes just work). The inverse direction of the
raster->vector tile assignment in spatial/tiles.py.

Exact-integer geometry: vertices are integers; working coordinates are
scaled by 2 so cell centers (2*gx + 1) are ODD while vertices/edges are
EVEN — a center can never coincide with a vertex or a horizontal edge,
eliminating every ray-casting degeneracy except a center exactly on a
slanted edge's line, where the strict `<` crossing rule decides
deterministically (same integers, same branch, in engine and oracle).

Reference parity: the reference's geo layer stops at point->polygon
membership (cartwright geos.py); rasterization is engine scope — the
step that turns detected admin polygons into coverage masks for tiling.

Scale shape (the 100 TB audit):
  1. Candidate cells are generated JVM-side by exploding each
     polygon's bbox row into sequence(gx) x sequence(gy) — fan-out =
     bbox area, the standard covering step; no Python until the test.
  2. The exact test runs per polygon via a cogroup(cells, rings)
     applyInPandas — the same shuffle pattern as the bulk PIP join; a
     polygon's candidates and its rings meet on the poly_id key, rings
     are never replicated per cell row.
  3. The kernel is a chunked int64 numpy broadcast (cells x edges),
     capped at ~2^18 pair entries per block — the measured
     memory-bandwidth lesson from the disc-cover kernel: chunking
     keeps 32 concurrent Python workers out of cache blow-out.
  4. Continent-sized polygons (bbox >> interior) want a coarse-to-fine
     pyramid (classify coarse tiles fully-inside/outside first, refine
     the boundary ring only — classify_interior_cells in pip.py is the
     S2 form); this planar operator takes the direct covering, which
     is optimal for the building/city/admin-2 scale it targets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHUNK = 1 << 18

# Working coords are scaled x2 and the crossing test multiplies two
# coordinate differences, so products are bounded by (4*|coord|)^2;
# |coord| < 5e8 keeps them inside int64 (4e9^2 ≈ 1.6e19 would wrap, so
# the bound is enforced, not advisory — mirrors hull.py's guard).
_COORD_LIMIT = 500_000_000


def _guard_coords(col, name: str):
    bound = F.greatest(F.abs(F.array_max(col)), F.abs(F.array_min(col)))
    return (F.when(bound < F.lit(_COORD_LIMIT), col)
            .otherwise(F.raise_error(F.lit(
                f"rasterize_polygons: |{name}| too large for exact "
                f"int64 crossing products (limit {_COORD_LIMIT})"))))


def _crossings(cx, cy, xs, ys):
    """Vectorized even-odd crossing counts: cells (odd scaled coords) x
    one ring (even scaled coords). Exact int64."""
    x1, y1 = xs, ys
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    dy = y2 - y1
    straddle = (y1 > cy[:, None]) != (y2 > cy[:, None])
    lhs = (cx[:, None] - x1) * dy
    rhs = (cy[:, None] - y1) * (x2 - x1)
    cross = np.where(dy > 0, lhs < rhs, lhs > rhs) & straddle
    return cross.sum(axis=1)


def _raster_group(cells_pdf: pd.DataFrame,
                  rings_pdf: pd.DataFrame) -> pd.DataFrame:
    if cells_pdf.empty or rings_pdf.empty:
        return pd.DataFrame({"poly_id": pd.Series(dtype="int64"),
                             "gx": pd.Series(dtype="int64"),
                             "gy": pd.Series(dtype="int64")})
    gx = cells_pdf["gx"].to_numpy(np.int64)
    gy = cells_pdf["gy"].to_numpy(np.int64)
    cx, cy = 2 * gx + 1, 2 * gy + 1
    rings = [(2 * np.asarray(r["xs"], dtype=np.int64),
              2 * np.asarray(r["ys"], dtype=np.int64))
             for _, r in rings_pdf.iterrows()]
    max_edges = max(len(xs) for xs, _ in rings)
    step = max(1, _CHUNK // max(1, max_edges))
    total = np.zeros(len(cx), dtype=np.int64)
    for lo in range(0, len(cx), step):
        hi = min(lo + step, len(cx))
        for xs, ys in rings:
            total[lo:hi] += _crossings(cx[lo:hi], cy[lo:hi], xs, ys)
    inside = (total % 2) == 1
    return pd.DataFrame({
        "poly_id": cells_pdf["poly_id"].to_numpy(np.int64)[inside],
        "gx": gx[inside], "gy": gy[inside]})


def rasterize_polygons(polys: DataFrame,
                       id_col: str = "poly_id",
                       xs_col: str = "xs",
                       ys_col: str = "ys") -> DataFrame:
    """-> (poly_id, gx, gy): unit cells whose center (gx+0.5, gy+0.5)
    is inside the polygon by the even-odd rule over ALL its rings.
    ``polys``: one row per ring, integer vertex arrays (closing edge
    last->first implicit). |coords| < 5e8 for exact int64 products —
    ENFORCED via raise_error (silent int64 wrap would flip crossing
    parities; same guard pattern as hull.py:_COORD_LIMIT)."""
    rings = polys.select(
        F.col(id_col).cast("bigint").alias("poly_id"),
        _guard_coords(F.col(xs_col).cast("array<bigint>"), "x").alias("xs"),
        _guard_coords(F.col(ys_col).cast("array<bigint>"), "y").alias("ys"))

    bbox = (rings.groupBy("poly_id")
            .agg(F.min(F.array_min("xs")).alias("x0"),
                 F.max(F.array_max("xs")).alias("x1"),
                 F.min(F.array_min("ys")).alias("y0"),
                 F.max(F.array_max("ys")).alias("y1"))
            .where((F.col("x1") > F.col("x0"))
                   & (F.col("y1") > F.col("y0"))))
    cells = (bbox
             .select("poly_id",
                     F.explode(F.sequence("x0", F.col("x1") - 1))
                     .alias("gx"), "y0", "y1")
             .select("poly_id", "gx",
                     F.explode(F.sequence("y0", F.col("y1") - 1))
                     .alias("gy")))

    return (cells.groupBy("poly_id")
            .cogroup(rings.groupBy("poly_id"))
            .applyInPandas(
                lambda c, r: _raster_group(c, r),
                schema="poly_id bigint, gx bigint, gy bigint"))


def raster_overlay(polys: DataFrame, id_col: str = "poly_id",
                   xs_col: str = "xs", ys_col: str = "ys") -> DataFrame:
    """Pairwise polygon overlay on the unit-cell raster: ->
    (id_a, id_b, inter_area, area_a, area_b) for every unordered pair
    with a non-empty intersection — the GIS intersect/overlay operator
    in its scalable cell-exact form (exact on the grid the layer was
    rasterized to; the same contract as the dissolve/union composition
    in __spark_entry__.q_dissolve_boundary). Union area and IoU derive
    by inclusion-exclusion: area_a + area_b - inter_area.

    Scale shape: rasterize once (the cogrouped even-odd kernel), then
    ONE equi-join on the cell key (gx, gy) — a co-location join whose
    fan-out per cell is the polygon stack depth at that cell, never an
    all-pairs product; the pair count aggregates with map-side
    partials. Deep stacks (k polygons on one cell -> k^2 join rows)
    are the inherent overlay cost and AQE-splittable.
    """
    cells = rasterize_polygons(polys, id_col, xs_col, ys_col) \
        .localCheckpoint(eager=True)            # reused 3x
    areas = cells.groupBy("poly_id").agg(F.count("*").alias("area"))
    l = cells.select(F.col("poly_id").alias("id_a"), "gx", "gy")
    r = cells.select(F.col("poly_id").alias("id_b"), "gx", "gy")
    inter = (l.join(r, ["gx", "gy"])
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("inter_area")))
    return (inter
            .join(areas.select(F.col("poly_id").alias("id_a"),
                               F.col("area").alias("area_a")), "id_a")
            .join(areas.select(F.col("poly_id").alias("id_b"),
                               F.col("area").alias("area_b")), "id_b")
            .select("id_a", "id_b", "inter_area", "area_a", "area_b"))
