"""Spherical polygon measures: area + perimeter per polygon, distributed.

Input is a VERTEX TABLE (poly_id, pos, lat, lon) — the natural shape for
polygon collections too large to hold as per-row arrays (a 100 TB admin/
tile layer streams vertices; nothing ever collects a whole polygon onto
the driver or into one task except its own window partition).

Area: the spherical shoelace of Chamberlain & Duquette, "Some algorithms
for polygons on a sphere" (JPL Publication 07-3, 2007 — public):

    area = |Σ_edges (λ2 − λ1) · (2 + sin φ1 + sin φ2)| · R² / 2

(sanity anchor: a ring tracing the equator gives Σ = 2·2π, so
area = 2πR² — a hemisphere)

exact in the limit of short edges (admin boundaries, tiles), within
~1e-6 relative for ~100 km edges. Perimeter: haversine sum over edges.

Determinism: per-edge terms are doubles, but a float SUM is
order-dependent — Spark's partial aggregation order differs run-to-run
AND from any SQL oracle's order. Each term is therefore rounded to
DECIMAL(38, 12) and summed as decimal: decimal addition is exact and
associative, so the result is bit-identical across partition layouts and
across engines (the DuckDB oracle mirrors the same rounding). A 1-ulp
libm difference in sin/haversine (~1e-18 at term scale) cannot flip a
1e-12 rounding except on a measure-zero boundary.

Scale shape: ONE shuffle (window by poly_id ordered by pos, to pair each
vertex with its successor — lead() + wrap-around via first()), then an
algebraic decimal sum per polygon. No explode blow-up, no driver path.

Edges are assumed longitude-unwrapped per ring (the PIP layer's
convention, spatial/pip.py _unwrap_ring); a dateline-crossing ring
should be unwrapped before measuring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cartwright_spark.functions.geodesy import EARTH_RADIUS_M, haversine_col

#: decimal quantum for per-edge terms — coarse enough to absorb 1-ulp
#: libm drift, fine enough that a 10^6-edge polygon keeps ~6 exact
#: decimals of km²
TERM_DECIMALS = 12


def polygon_measures(vertices: DataFrame, id_col: str = "poly_id",
                     pos_col: str = "pos", lat_col: str = "lat",
                     lon_col: str = "lon") -> DataFrame:
    """(poly_id, n_vertices, area_km2, perimeter_km) per polygon.

    ``vertices``: one row per ring vertex, ``pos`` 0..n-1 in ring order
    (closing edge n-1 → 0 is implicit; a repeated closing vertex is
    harmless — its edge terms are zero)."""
    w = Window.partitionBy(id_col).orderBy(F.col(pos_col).asc())
    # successor vertex: lead(), wrapping the last vertex back to pos 0
    nxt_lat = F.coalesce(F.lead(lat_col).over(w),
                         F.first(lat_col).over(w))
    nxt_lon = F.coalesce(F.lead(lon_col).over(w),
                         F.first(lon_col).over(w))
    e = vertices.select(
        F.col(id_col).alias("poly_id"),
        F.col(lat_col).alias("lat1"), F.col(lon_col).alias("lon1"),
        nxt_lat.alias("lat2"), nxt_lon.alias("lon2"))

    area_term = (
        (F.radians("lon2") - F.radians("lon1"))
        * (F.lit(2.0) + F.sin(F.radians("lat1")) + F.sin(F.radians("lat2"))))
    perim_term = haversine_col(F.col("lat1"), F.col("lon1"),
                               F.col("lat2"), F.col("lon2"))
    dec = f"decimal(38,{TERM_DECIMALS})"
    agg = e.groupBy("poly_id").agg(
        F.count("*").alias("n_vertices"),
        F.sum(area_term.cast(dec)).alias("__a"),
        F.sum(perim_term.cast(dec)).alias("__p"))
    r_km = EARTH_RADIUS_M / 1000.0
    return agg.select(
        "poly_id", "n_vertices",
        (F.abs(F.col("__a").cast("double"))
         * F.lit(r_km * r_km / 2.0)).alias("area_km2"),
        (F.col("__p").cast("double") / F.lit(1000.0)).alias("perimeter_km"))
