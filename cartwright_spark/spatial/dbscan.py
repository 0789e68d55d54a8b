"""DBSCAN point labelling (core / border / noise) over integer planar
coordinates.

The density-based clustering primitive for web-event point clouds
(POI conflation, check-in clusters, crawl-geo outliers): a point is
CORE when its eps-ball holds at least ``min_pts`` points (the point
itself counts, matching sklearn's ``min_samples`` convention), BORDER
when it is not core but some core point lies within eps, NOISE
otherwise. Cluster ids for the core graph are the job of
``grid_cluster`` / connected components (functions/graph.py shape);
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

COUNTS ARE CAPPED AT min_pts. Exact |N_eps(p)| is inherently
output-bound — Σ n_nbrs equals the number of true eps-pairs, which is
QUADRATIC in blob density (measured: a 5-blob corpus went 4.5 s ->
624 s for 10x data because ~2.2e9 true pairs exist). Labels only need
count >= min_pts, so n_nbrs = least(|N_eps(p)|, min_pts) and the
plan never enumerates a dense blob's pairs:

Scale shape (the 100 TB audit):
  1. Sub-cell shortcut: grid pitch = ceil(eps/2) >= eps/2 is NOT
     enough — we need same-cell pairs within eps, i.e. pitch <= eps/2
     via floor; see _pitch — any two points in one cell are mutual
     neighbours (cell diagonal = pitch*sqrt(2) <= eps). ONE corpus
     rollup counts each cell; a point in a cell with count >= min_pts
     is core with NO pair work — the entire quadratic mass of dense
     blobs resolves here.
  2. Only UNDECIDED points (own-cell count < min_pts) enter the pair
     join: undecided sit in their one cell, the full corpus explodes
     to its 5x5 cell neighbourhood (constant fan-out 25 — linear).
     A (undecided, other) pair meets exactly once; counts cap at
     min_pts after an algebraic groupBy whose map-side combine
     collapses candidates in place.
  3. The border pass joins only NON-CORE points (one cell each)
     against CORE points (5x5 explode, linear) — existence via
     groupBy-max. Every join is a plain equi-join: dense-cell keys are
     AQE skew-split, and join OUTPUT is bounded by
     |undecided-or-non-core points| x |their candidate neighbours| —
     small by the density argument (an undecided point's own cell is
     sparse; its 24 neighbour cells contribute candidates
     proportional to LOCAL density only).

Overflow bound: candidates differ by <= 3*pitch <= 2.13*eps per axis
after the cell gate, so dx*dx + dy*dy <= 9.1*eps^2; BIGINT-safe while
eps < 1e9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: exact floor-division cell coordinate for BIGINT c at pitch p —
#: (c - pmod(c, p)) is exactly divisible, so DIV's truncation is exact
#: for negative coordinates too (unlike a bare `c DIV p`).
_CELL = "CAST((({c}) - pmod(({c}), {p})) DIV {p} AS BIGINT)"


def _pitch(eps: int) -> int:
    """Largest pitch with pitch*sqrt(2) <= eps, so same-cell points are
    guaranteed mutual neighbours: floor(eps / sqrt(2)) computed in
    exact integer arithmetic (isqrt of eps^2 // 2)."""
    import math
    return max(1, math.isqrt((eps * eps) // 2))


def _with_cell(df: DataFrame, pitch: int) -> DataFrame:
    return df.withColumn("cx", F.expr(_CELL.format(c="px", p=pitch))) \
             .withColumn("cy", F.expr(_CELL.format(c="py", p=pitch)))


def _pairs(left: DataFrame, right: DataFrame, eps: int, pitch: int,
           reach: int) -> DataFrame:
    """Candidate (left point, right point) rows within eps, exact gate.

    ``left`` sits in its own cell; ``right`` fans out to the
    (2*reach+1)^2 neighbourhood. ``reach`` must satisfy
    reach * pitch >= eps so no true pair is missed. Output carries the
    LEFT id as ``id`` and the RIGHT id as ``nbr_id``.
    """
    offs = list(range(-reach, reach + 1))
    l = _with_cell(left, pitch).select("id", "px", "py", "cx", "cy")
    r = (_with_cell(right, pitch)
         .select(F.col("id").alias("nbr_id"),
                 F.col("px").alias("qx"), F.col("py").alias("qy"),
                 "cx", "cy")
         .withColumn("dx", F.explode(F.array(*[F.lit(i) for i in offs])))
         .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in offs])))
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
    coordinates: label in ('core', 'border', 'noise'),
    n_nbrs = least(|N_eps|, min_pts) (capped — see module docstring;
    the point itself counts).
    """
    eps = int(eps)
    min_pts = int(min_pts)
    if eps <= 0:
        raise ValueError("dbscan_label: eps must be positive")
    if eps >= 1_000_000_000:
        raise ValueError("dbscan_label: eps >= 1e9 breaks the BIGINT "
                         "distance bound (9.1*eps^2 overflows)")
    if min_pts < 1:
        raise ValueError("dbscan_label: min_pts must be >= 1")
    pitch = _pitch(eps)
    # reach * pitch >= eps always holds at reach=2 for eps >= 2
    # (pitch >= floor(eps/sqrt(2)) >= eps/2 for integer eps >= 2); for
    # eps = 1, pitch = 1 and reach 2 covers trivially.
    reach = 2

    pts = points.select("id", "px", "py")
    cellcount = (_with_cell(pts, pitch)
                 .groupBy("cx", "cy")
                 .agg(F.count(F.lit(1)).cast("bigint").alias("n_same")))
    flagged = (_with_cell(pts, pitch)
               .join(cellcount, ["cx", "cy"])
               .select("id", "px", "py", "n_same"))
    dense = flagged.where(F.col("n_same") >= min_pts) \
        .select("id", "px", "py")
    undecided = flagged.where(F.col("n_same") < min_pts) \
        .select("id", "px", "py")

    u_counts = (_pairs(undecided, pts, eps, pitch, reach)
                .groupBy("id")
                .agg(F.least(F.count(F.lit(1)), F.lit(min_pts))
                     .cast("bigint").alias("n_nbrs")))
    u_flags = (undecided.join(u_counts, "id")
               .withColumn("is_core", F.col("n_nbrs") >= F.lit(min_pts)))

    core = dense.unionByName(
        u_flags.where(F.col("is_core")).select("id", "px", "py"))
    non_core = u_flags.where(~F.col("is_core")).select("id", "px", "py")
    has_core_nbr = (_pairs(non_core, core, eps, pitch, reach)
                    .groupBy("id")
                    .agg(F.max(F.lit(True)).alias("near_core")))

    dense_rows = dense.select(
        "id", F.lit(min_pts).cast("bigint").alias("n_nbrs"),
        F.lit("core").alias("label"))
    u_rows = (u_flags.join(has_core_nbr, "id", "left")
              .select("id", "n_nbrs",
                      F.when(F.col("is_core"), F.lit("core"))
                      .when(F.col("near_core"), F.lit("border"))
                      .otherwise(F.lit("noise")).alias("label")))
    return dense_rows.unionByName(u_rows)
