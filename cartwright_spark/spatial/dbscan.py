"""DBSCAN point labelling (core / border / noise) over integer planar
coordinates.

The density-based clustering primitive for web-event point clouds
(POI conflation, check-in clusters, crawl-geo outliers): a point is
CORE when its eps-ball holds at least ``min_pts`` points (the point
itself counts, matching sklearn's ``min_samples`` convention), BORDER
when it is not core but some core point lies within eps, NOISE
otherwise. Cluster ids for the core graph are the job of
``grid_cluster`` / connected components (operators/ranking.py shape);
this operator supplies the density labels those ids attach to.

Reference scope note: jataware/cartwright has no clustering layer (its
spatial notion is per-column lat/lon classification,
cartwright/category_helpers.py:25-88); this operator is engine scope
from the brief's geospatial tier, the density member of the spatial
family next to kNN (spatial/knn.py), radius (spatial/distjoin.py) and
grid clustering.

Exactness: coordinates are BIGINT (microdegrees / pixels / metres —
caller's unit), the ball test is the integer comparison
``dx*dx + dy*dy <= eps*eps`` — no float anywhere in the keep/drop or
the label decision, so a SQL oracle cannot diverge.

Scale shape (the 100 TB audit):
  1. Grid pitch = eps. The LEFT copy of the corpus maps to exactly ONE
     cell (map-only); the RIGHT copy explodes to its 3x3 cell
     neighbourhood (constant fan-out 9). Any pair within eps differs by
     at most one cell per axis, so the candidate set is complete, and
     a pair meets EXACTLY once (the left point lives in one cell) — no
     dedup pass.
  2. Neighbour counting is groupBy(point) with map-side partial
     aggregation: all of a point's candidates are co-located in its
     cell's partition, so the count exchange carries one row per point.
  3. The border pass re-joins only the NON-CORE points (one cell each)
     against the CORE points (3x3 explode) — both sides already
     filtered, same single-shuffle shape; existence (max) aggregation
     again collapses map-side.
  Dense urban cells are plain equi-join skew -> AQE skew-split; the
  count/exists aggregations never see the skew (partial agg absorbs it).

Overflow bound: candidates differ by <= 2*eps per axis after the cell
gate, so dx*dx + dy*dy <= 8*eps^2; BIGINT-safe while eps < 1e9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: exact floor-division cell coordinate for BIGINT c at pitch p —
#: (c - pmod(c, p)) is exactly divisible, so DIV's truncation is exact
#: for negative coordinates too (unlike a bare `c DIV p`).
_CELL = "CAST((({c}) - pmod(({c}), {p})) DIV {p} AS BIGINT)"


def _with_cell(df: DataFrame, eps: int) -> DataFrame:
    return df.withColumn("cx", F.expr(_CELL.format(c="px", p=eps))) \
             .withColumn("cy", F.expr(_CELL.format(c="py", p=eps)))


def _pairs(left: DataFrame, right: DataFrame, eps: int) -> DataFrame:
    """Candidate (left point, right point) rows within eps, exact gate.

    ``left`` sits in its own cell; ``right`` fans out to 3x3. Both
    inputs must already carry (id, px, py); output carries the LEFT
    id as ``id`` and the RIGHT id as ``nbr_id``.
    """
    l = _with_cell(left, eps).select("id", "px", "py", "cx", "cy")
    r = (_with_cell(right, eps)
         .select(F.col("id").alias("nbr_id"),
                 F.col("px").alias("qx"), F.col("py").alias("qy"),
                 "cx", "cy")
         .withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
         .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
         .select("nbr_id", "qx", "qy",
                 (F.col("cx") + F.col("dx")).alias("cx"),
                 (F.col("cy") + F.col("dy")).alias("cy")))
    eps2 = int(eps) * int(eps)
    return (l.join(r, ["cx", "cy"])
            .where(F.expr(f"(px - qx) * (px - qx) + (py - qy) * (py - qy)"
                          f" <= {eps2}"))
            .select("id", "nbr_id"))


def dbscan_label(points: DataFrame, eps: int, min_pts: int) -> DataFrame:
    """-> (id, n_nbrs, label) for points(id, px, py) with BIGINT planar
    coordinates: label in ('core', 'border', 'noise'), n_nbrs = exact
    |N_eps| including the point itself.
    """
    eps = int(eps)
    min_pts = int(min_pts)
    if eps <= 0:
        raise ValueError("dbscan_label: eps must be positive")
    if eps >= 1_000_000_000:
        raise ValueError("dbscan_label: eps >= 1e9 breaks the BIGINT "
                         "distance bound (8*eps^2 overflows)")
    if min_pts < 1:
        raise ValueError("dbscan_label: min_pts must be >= 1")

    pts = points.select("id", "px", "py")
    counts = (_pairs(pts, pts, eps)
              .groupBy("id")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_nbrs")))
    # one row per point (every point neighbours itself), carrying coords
    flags = (pts.join(counts, "id")
             .withColumn("is_core", F.col("n_nbrs") >= F.lit(min_pts)))

    non_core = flags.where(~F.col("is_core")).select("id", "px", "py")
    core = flags.where(F.col("is_core")).select("id", "px", "py")
    has_core_nbr = (_pairs(non_core, core, eps)
                    .groupBy("id")
                    .agg(F.max(F.lit(True)).alias("near_core")))

    return (flags.join(has_core_nbr, "id", "left")
            .select("id", "n_nbrs",
                    F.when(F.col("is_core"), F.lit("core"))
                    .when(F.col("near_core"), F.lit("border"))
                    .otherwise(F.lit("noise")).alias("label")))
