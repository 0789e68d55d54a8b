"""Nearest-segment snap join (map matching primitive).

For every point, find the closest segment within a search radius — the
primitive under GPS-trace map matching, address snapping, and
point-to-road conflation.

Reference scope note: jataware/cartwright has no geometry layer at all
(its spatial notion is per-column lat/lon classification,
cartwright/category_helpers.py); this operator is engine scope from the
brief's geospatial spatial-join tier, the point→polyline member of the
join family next to PIP (spatial/pip.py), kNN (spatial/knn.py), radius
(spatial/distjoin.py) and segment×segment (spatial/segjoin.py).

Coordinates are INTEGERS (microdegrees / mercator pixels / metres —
caller's choice of unit). The point-to-segment squared distance is a
RATIONAL over exact BIGINT arithmetic:

    d  = (x1-x0, y1-y0)          segment vector
    w  = (px-x0, py-y0)          point minus segment start
    t* = w.d / d.d               unclamped projection parameter

    wd <= 0      ->  dist2 = |w|^2                    (A = |w|^2,  B = 1)
    wd >= dd     ->  dist2 = |p - (x1,y1)|^2          (A = |u|^2,  B = 1)
    else         ->  dist2 = (|w|^2*dd - wd^2) / dd   (A = that,   B = dd)

so the radius gate `dist2 <= r^2` is the EXACT integer comparison
`A <= r^2 * B` — no epsilon, no float in the keep/drop decision. Only
the final reported dist2 (and the argmin ordering) is a double, and it
is produced by the SAME generated SQL expression in Spark and in any
SQL oracle (`snap_sql`), so both engines round identically (IEEE).

Overflow bound: A <= (|w|^2)*(dd) <= ((L+r)^2)*(L^2) for segment length
L and radius r; BIGINT-safe while (L+r)*L < 3e9 — e.g. L, r <= 30,000
units. `snap_to_segments` raises if radius alone breaks the bound; the
per-row arithmetic is the caller's unit contract.

Scale shape (the 100 TB audit):
  1. Segments explode to the grid cells of their bbox PADDED by r —
     fan-out ~((L+2r)/cell + 1)^2, a constant when cell ~ r. Points
     map to exactly ONE cell each (map-only, no fan-out on the big
     side — points are the corpus, segments are the road network).
  2. ONE shuffle equi-join on (cx, cy). Each (point, segment) pair can
     meet at most once (the point exists in one cell only), so there is
     NO dedup pass. Any segment within r of a point shares that point's
     cell by construction (bbox padded by r covers the point, hence its
     cell), so the candidate set is complete — refine never misses.
  3. The exact integer refine + radius gate run inside the join's
     codegen stage; the per-point argmin is a min(struct) aggregation
     whose map-side partial combine collapses each point to ONE row
     before the shuffle (all of a point's candidates are co-located in
     its cell's partition), so the agg exchange carries <= one row per
     matched point.
Hot cells (dense urban grids) are plain equi-join skew -> AQE split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snap_sql(px: str = "px", py: str = "py") -> dict:
    """SQL expression strings for the exact point-to-segment kernel over
    columns (px, py, x0, y0, x1, y1). ONE generator feeds the Spark plan
    and the DuckDB oracle, so every float is produced by the identical
    expression tree in both engines.

    Returns {'a': .., 'b': .., 'dist2': .., 't': ..} where a/b are exact
    BIGINTs with dist2 = a/b, and t is the clamped projection parameter
    as a double (0 at the start vertex, 1 at the end).
    """
    dx, dy = "(x1 - x0)", "(y1 - y0)"
    wx, wy = f"({px} - x0)", f"({py} - y0)"
    ux, uy = f"({px} - x1)", f"({py} - y1)"
    dd = f"({dx} * {dx} + {dy} * {dy})"
    wd = f"({wx} * {dx} + {wy} * {dy})"
    ww = f"({wx} * {wx} + {wy} * {wy})"
    uu = f"({ux} * {ux} + {uy} * {uy})"
    a = (f"CAST(CASE WHEN {dd} = 0 OR {wd} <= 0 THEN {ww} "
         f"WHEN {wd} >= {dd} THEN {uu} "
         f"ELSE {ww} * {dd} - {wd} * {wd} END AS BIGINT)")
    b = (f"CAST(CASE WHEN {dd} = 0 OR {wd} <= 0 OR {wd} >= {dd} "
         f"THEN 1 ELSE {dd} END AS BIGINT)")
    t = (f"CASE WHEN {dd} = 0 OR {wd} <= 0 THEN CAST(0.0 AS DOUBLE) "
         f"WHEN {wd} >= {dd} THEN CAST(1.0 AS DOUBLE) "
         f"ELSE CAST({wd} AS DOUBLE) / CAST({dd} AS DOUBLE) END")
    return {"a": a, "b": b, "t": t,
            "dist2": "CAST(snap_a AS DOUBLE) / CAST(snap_b AS DOUBLE)"}


def snap_to_segments(points: DataFrame, segments: DataFrame,
                     radius: int, cell: int | None = None) -> DataFrame:
    """Snap each point to its nearest segment within `radius`.

    points:   (id, px, py)            integer coords
    segments: (id, x0, y0, x1, y1)    integer coords
    cell:     candidate-grid pitch, default = radius.

    -> (point_id, seg_id, dist2, t) — one row per point that has a
    segment within radius; argmin over the exact rational distance with
    deterministic seg_id tie-break. dist2/t are doubles from the shared
    `snap_sql` kernel; the radius gate itself is exact integer math.
    """
    radius = int(radius)
    if radius <= 0:
        raise ValueError("snap_to_segments: radius must be positive")
    if radius > 30_000:
        raise ValueError(
            "snap_to_segments: radius > 30000 breaks the documented "
            "BIGINT overflow bound (L+r)*L < 3e9")
    c = int(cell) if cell is not None else radius
    if c <= 0:
        raise ValueError("snap_to_segments: cell must be positive")

    flo = lambda e: F.floor(e.cast("double") / F.lit(float(c))).cast("bigint")
    seg = (segments
           .withColumn("_cx0", flo(F.least("x0", "x1") - F.lit(radius)))
           .withColumn("_cx1", flo(F.greatest("x0", "x1") + F.lit(radius)))
           .withColumn("_cy0", flo(F.least("y0", "y1") - F.lit(radius)))
           .withColumn("_cy1", flo(F.greatest("y0", "y1") + F.lit(radius)))
           .select(F.col("id").alias("seg_id"), "x0", "y0", "x1", "y1",
                   F.explode(F.expr("sequence(_cx0, _cx1)")).alias("cx"),
                   F.col("_cy0").alias("_ylo"), F.col("_cy1").alias("_yhi"))
           .select("*", F.explode(F.expr("sequence(_ylo, _yhi)")).alias("cy"))
           .drop("_ylo", "_yhi"))
    pts = points.select(F.col("id").alias("point_id"), "px", "py",
                        flo(F.col("px")).alias("cx"),
                        flo(F.col("py")).alias("cy"))
    k = snap_sql()
    cand = (pts.join(seg, ["cx", "cy"])
            .withColumn("snap_a", F.expr(k["a"]))
            .withColumn("snap_b", F.expr(k["b"]))
            # exact integer radius gate: dist2 <= r^2  <=>  A <= r^2 * B
            .where(F.col("snap_a")
                   <= F.lit(radius) * F.lit(radius) * F.col("snap_b"))
            .select("point_id", "seg_id",
                    F.expr(k["dist2"]).alias("dist2"),
                    F.expr(k["t"]).alias("t")))
    best = (cand.groupBy("point_id")
            .agg(F.min(F.struct("dist2", "seg_id", "t")).alias("_m"))
            .select("point_id", F.col("_m.seg_id").alias("seg_id"),
                    F.col("_m.dist2").alias("dist2"),
                    F.col("_m.t").alias("t")))
    return best
