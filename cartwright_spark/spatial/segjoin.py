"""Segment-intersection join: which segment pairs (A x B) properly cross.

Reference scope note: cartwright has no geometry-overlay layer; this is
engine scope from the brief's geospatial tier — the primitive under
road/boundary overlay, route-vs-admin clipping, and polyline conflation.

Semantics: PROPER intersection only (the segments cross at an interior
point of both). Collinear overlaps and endpoint touches are excluded —
the orientation test is exact, so the boundary cases are deterministic,
not float-fuzzy. Coordinates are INTEGERS (e.g. microdegrees / mercator
pixels); every orientation sign is exact BIGINT arithmetic, so Spark and
any SQL oracle agree bit-for-bit with no epsilon anywhere.

Orientation: cross(p,q,r) = (qx-px)(ry-py) - (qy-py)(rx-px). Segments
(a1,a2) x (b1,b2) properly cross iff cross(a1,a2,b1) and cross(a1,a2,b2)
have strictly opposite signs AND cross(b1,b2,a1) / cross(b1,b2,a2) do.
Written as pure comparisons (no sign multiply) so the largest
intermediate is one cross product: |coord| < 2^31 never overflows.

Scale shape (the 100 TB audit):
  1. Each segment explodes to the grid cells its BBOX spans — fan-out
     is ((len/cell)+2)^2, a small constant when `cell` is sized near
     the max segment length (pick cell ~ P95 length; longer outliers
     just fan out a bit more).
  2. ONE shuffle equi-join on (cx, cy) — never a cartesian; AQE skew
     splitting applies if one cell is hot (urban grids).
  3. Exactly-once claim without a distinct: a candidate pair is kept
     only in the cell at the MAX of the two bboxes' min-cell corners —
     that cell is in both bbox ranges iff the bboxes overlap, and it is
     unique, so no pair is emitted twice and no dedup shuffle is paid
     (same trick as operators/temporal_join.py interval_overlap, in 2D).
  4. The exact orientation refine runs inside the join's codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells(df: DataFrame, side: str, cell: int) -> DataFrame:
    """Explode a segment table (id, x0, y0, x1, y1) to one row per grid
    cell its bbox spans, carrying the endpoints + the bbox min cell."""
    c = float(cell)
    lo = lambda a, b: F.least(F.col(a), F.col(b))
    hi = lambda a, b: F.greatest(F.col(a), F.col(b))
    flo = lambda col: F.floor(col.cast("double") / F.lit(c)).cast("bigint")
    out = (df
           .withColumn("_cx0", flo(lo("x0", "x1")))
           .withColumn("_cx1", flo(hi("x0", "x1")))
           .withColumn("_cy0", flo(lo("y0", "y1")))
           .withColumn("_cy1", flo(hi("y0", "y1")))
           .select(
               F.col("id").alias(f"{side}_id"),
               F.col("x0").alias(f"{side}x0"), F.col("y0").alias(f"{side}y0"),
               F.col("x1").alias(f"{side}x1"), F.col("y1").alias(f"{side}y1"),
               F.col("_cx0").alias(f"{side}_cx0"),
               F.col("_cy0").alias(f"{side}_cy0"),
               F.explode(F.expr("sequence(_cx0, _cx1)")).alias("cx"),
               F.col("_cy0").alias("_ylo"), F.col("_cy1").alias("_yhi"))
           .select("*", F.explode(F.expr("sequence(_ylo, _yhi)")).alias("cy"))
           .drop("_ylo", "_yhi"))
    return out


def proper_cross_predicate():
    """Exact integer proper-crossing predicate over columns
    ax0..ay1 / bx0..by1 — comparisons only, no sign products."""
    def cross(px, py, qx, qy, rx, ry):
        return ((F.col(qx) - F.col(px)) * (F.col(ry) - F.col(py))
                - (F.col(qy) - F.col(py)) * (F.col(rx) - F.col(px)))
    d1 = cross("ax0", "ay0", "ax1", "ay1", "bx0", "by0")
    d2 = cross("ax0", "ay0", "ax1", "ay1", "bx1", "by1")
    d3 = cross("bx0", "by0", "bx1", "by1", "ax0", "ay0")
    d4 = cross("bx0", "by0", "bx1", "by1", "ax1", "ay1")
    opp = lambda u, v: ((u > 0) & (v < 0)) | ((u < 0) & (v > 0))
    return opp(d1, d2) & opp(d3, d4)


def segment_intersections(a: DataFrame, b: DataFrame,
                          cell: int = 500) -> DataFrame:
    """(a_id, b_id) for every properly-crossing pair. Both inputs are
    segment tables with columns (id, x0, y0, x1, y1), integer coords.
    `cell`: grid pitch for the candidate join — size it near the P95
    segment length."""
    ac = _cells(a, "a", cell)
    bc = _cells(b, "b", cell)
    cand = ac.join(bc, ["cx", "cy"], "inner")
    claimed = cand.where(
        (F.col("cx") == F.greatest("a_cx0", "b_cx0"))
        & (F.col("cy") == F.greatest("a_cy0", "b_cy0")))
    return (claimed.where(proper_cross_predicate())
            .select("a_id", "b_id"))
