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


def sde_sql() -> dict:
    """Standard-deviational-ellipse expressions over the EXACT BIGINT
    moment columns (n, sx, sy, na, nb, nc) where
        na = n*sum(x^2) - sx^2   (n-scaled central moment, exact)
        nb = n*sum(y^2) - sy^2
        nc = n*sum(x*y) - sx*sy
    — one generator, two engines. Only IEEE-exact operations (division,
    sqrt, the four arithmetic ops) appear, so Spark and any SQL oracle
    produce bit-identical doubles; orientation is reported as the exact
    INTEGER pair (2*nc, na - nb) = (sin, cos) numerators of tan(2*theta)
    instead of an atan2 whose last-ulp is libm-dependent."""
    n2 = "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
    # eigenvalues of the population covariance matrix [[na, nc], [nc, nb]]/n^2
    disc = ("sqrt((CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))"
            " * (CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))"
            " + CAST(4.0 AS DOUBLE) * CAST(nc AS DOUBLE)"
            " * CAST(nc AS DOUBLE))")
    return {
        "cx": "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)",
        "cy": "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)",
        "var_x": f"CAST(na AS DOUBLE) / {n2}",
        "var_y": f"CAST(nb AS DOUBLE) / {n2}",
        "cov_xy": f"CAST(nc AS DOUBLE) / {n2}",
        "sigma_major": f"sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)"
                       f" + {disc}) / (CAST(2.0 AS DOUBLE) * {n2}))",
        "sigma_minor": f"sqrt(greatest(CAST(na AS DOUBLE)"
                       f" + CAST(nb AS DOUBLE) - {disc},"
                       f" CAST(0.0 AS DOUBLE))"
                       f" / (CAST(2.0 AS DOUBLE) * {n2}))",
    }


def std_ellipse(points: DataFrame, group_col: str = "grp",
                x_col: str = "px", y_col: str = "py") -> DataFrame:
    """Standard deviational ellipse per group over BIGINT planar
    coordinates -> (grp, n, cx, cy, var_x, var_y, cov_xy, sigma_major,
    sigma_minor, orient_num, orient_den).

    The classic point-cloud dispersion summary (Lefever 1926; the
    ArcGIS "Standard Deviational Ellipse" tool): centroid, population
    covariance, and the ellipse axes = sqrt of the covariance
    eigenvalues. orient_num/orient_den = (2*nc, na-nb), the exact
    integer tan(2*theta) pair — callers recover the rotation with
    atan2(orient_num, orient_den)/2 when they want degrees.

    Exactness: the five moment sums are BIGINT (n-scaled central
    moments bound: n^2 * max|coord|^2 < 9.2e18, i.e.
    n * max|coord| < 3e9 per group — microdegree city clouds at 1M
    points/group are in bounds); every derived double comes from the
    shared ``sde_sql`` generator using only IEEE-exact ops.

    Scale shape: ONE groupBy shuffle with map-side partial aggregation
    — group skew is absorbed before the exchange; the generator math is
    per-group scalar work at metadata scale.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    mom = (points.groupBy(F.col(group_col).alias("grp"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(x).cast("bigint").alias("sx"),
                F.sum(y).cast("bigint").alias("sy"),
                F.sum(x * x).cast("bigint").alias("sxx"),
                F.sum(y * y).cast("bigint").alias("syy"),
                F.sum(x * y).cast("bigint").alias("sxy"))
           .withColumn("na", F.expr("n * sxx - sx * sx"))
           .withColumn("nb", F.expr("n * syy - sy * sy"))
           .withColumn("nc", F.expr("n * sxy - sx * sy")))
    e = sde_sql()
    return mom.select(
        "grp", "n",
        F.expr(e["cx"]).alias("cx"), F.expr(e["cy"]).alias("cy"),
        F.expr(e["var_x"]).alias("var_x"),
        F.expr(e["var_y"]).alias("var_y"),
        F.expr(e["cov_xy"]).alias("cov_xy"),
        F.expr(e["sigma_major"]).alias("sigma_major"),
        F.expr(e["sigma_minor"]).alias("sigma_minor"),
        (F.lit(2) * F.col("nc")).cast("bigint").alias("orient_num"),
        (F.col("na") - F.col("nb")).cast("bigint").alias("orient_den"))
