"""Great-circle route densification: interpolate k waypoints along the
geodesic between OD pairs (spherical linear interpolation on unit
vectors — Shoemake slerp applied to the sphere, the standard flight-
route formula). The od_matrix tier aggregates flows; this materializes
the geometry a tile/heatmap layer renders for them.

    A, B unit vectors; delta = central angle;
    P(f) = ( sin((1-f)*delta)*A + sin(f*delta)*B ) / sin(delta)

All trig is a fixed float expression shape over the caller's exact
coordinates, replayed literally by the oracle. Degenerate pairs
(delta ~ 0) are dropped with an explicit sin(delta) > eps filter
rather than dividing by sin(0) — eps defaults to 1e-7 (~0.6 m)
because float-identical endpoints can leave dot a few ulp BELOW 1.0,
i.e. delta ~ 1e-8, never exactly zero; antipodal pairs
(undefined geodesic) are the caller's responsibility, as in every
public implementation of this formula.

Scale shape: one in-row explode of the k+1 fraction steps (map-side,
no join, no shuffle at all) — route count x (k+1) output rows, each a
pure projection. The classic pattern: densification is embarrassingly
parallel; only the downstream tile rollup shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def great_circle_waypoints(routes: DataFrame, k: int = 8,
                           lat1: str = "lat1", lon1: str = "lon1",
                           lat2: str = "lat2", lon2: str = "lon2",
                           eps: float = 1e-7) -> DataFrame:
    """-> input key columns + (step, frac, wp_lat, wp_lon) for
    step = 0..k (endpoints included)."""
    if k < 1 or k > 100_000:
        raise ValueError("k must be in [1, 1e5]")
    rad = F.lit(0.017453292519943295)          # pi / 180, both engines
    p1, l1 = F.col(lat1) * rad, F.col(lon1) * rad
    p2, l2 = F.col(lat2) * rad, F.col(lon2) * rad
    ax = F.cos(p1) * F.cos(l1)
    ay = F.cos(p1) * F.sin(l1)
    az = F.sin(p1)
    bx = F.cos(p2) * F.cos(l2)
    by = F.cos(p2) * F.sin(l2)
    bz = F.sin(p2)
    dot = ax * bx + ay * by + az * bz
    delta = F.acos(F.least(F.lit(1.0), F.greatest(F.lit(-1.0), dot)))

    base = (routes
            .withColumn("__d", delta)
            .where(F.sin(F.col("__d")) > F.lit(float(eps)))
            .withColumn("__ax", ax).withColumn("__ay", ay)
            .withColumn("__az", az)
            .withColumn("__bx", bx).withColumn("__by", by)
            .withColumn("__bz", bz)
            .withColumn("step",
                        F.explode(F.sequence(F.lit(0), F.lit(int(k))))))
    f = F.col("step").cast("double") / F.lit(float(k))
    sd = F.sin(F.col("__d"))
    wa = F.sin((F.lit(1.0) - f) * F.col("__d")) / sd
    wb = F.sin(f * F.col("__d")) / sd
    px = wa * F.col("__ax") + wb * F.col("__bx")
    py = wa * F.col("__ay") + wb * F.col("__by")
    pz = wa * F.col("__az") + wb * F.col("__bz")
    inv = F.lit(57.29577951308232)             # 180 / pi, both engines
    return (base
            .withColumn("frac", f)
            .withColumn("wp_lat",
                        F.asin(F.least(F.lit(1.0),
                                       F.greatest(F.lit(-1.0), pz)))
                        * inv)
            .withColumn("wp_lon", F.atan2(py, px) * inv)
            .drop("__d", "__ax", "__ay", "__az", "__bx", "__by", "__bz"))
