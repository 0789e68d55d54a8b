"""Geodesy + map-tile math as numpy kernels AND Spark column expressions.

The column-expression forms keep tile assignment inside whole-stage codegen
(no UDF); the numpy forms serve pandas-UDF kernels and brute-force oracles.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8


# ---- numpy ----------------------------------------------------------------

def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    la1, lo1, la2, lo2 = (np.deg2rad(np.asarray(a, dtype=np.float64))
                          for a in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    h = np.sin(dlat / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0, 1)))


def geodesic_destination(lat_deg, lon_deg, delta_rad, theta_rad):
    """Exact spherical destination point(s): start at (lat, lon), travel
    ``delta_rad`` radians of arc along initial bearing ``theta_rad``.

    Broadcasts: pass lat/lon shaped (Q, 1) and delta/theta shaped (S,)
    to get (Q, S) destination grids. Unlike planar lat/lon offsets
    (dlat + dlon/cos(lat)), this stays exact at ANY arc distance — the
    planar form leaves coverage gaps past ~1000 km that broke the kNN
    cover-disc exactness audit on growth rounds.

    Returns (lat_deg, lon_deg) with lon normalized to [-180, 180)."""
    la1 = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lo1 = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    sind, cosd = np.sin(delta_rad), np.cos(delta_rad)
    sinl1, cosl1 = np.sin(la1), np.cos(la1)
    sinl2 = np.clip(sinl1 * cosd + cosl1 * sind * np.cos(theta_rad), -1, 1)
    la2 = np.arcsin(sinl2)
    lo2 = lo1 + np.arctan2(np.sin(theta_rad) * sind * cosl1,
                           cosd - sinl1 * sinl2)
    # At the exact poles the general formula collapses: the cosl1·sind
    # cross-term (~1e-18) is absorbed into cosd (ulp ~1e-16), leaving
    # atan2(±tiny, 0) = ±π/2 — every bearing lands on ONE meridian and a
    # cover disc around a polar point misses all other longitudes. The
    # lat→±90 limit of the destination longitude is lon+θ from the south
    # pole and lon+π−θ from the north pole (derivation: expand num/den to
    # first order in cos(lat)); substitute it where cosl1 underflows the
    # absorption threshold.
    pole = np.broadcast_to(np.abs(cosl1) < 1e-12, lo2.shape)
    if np.any(pole):
        theta = np.asarray(theta_rad, dtype=np.float64)
        lo2_pole = lo1 + np.where(sinl1 > 0, np.pi - theta, theta)
        lo2 = np.where(pole, np.broadcast_to(lo2_pole, lo2.shape), lo2)
    return (np.rad2deg(la2),
            ((np.rad2deg(lo2) + 180.0) % 360.0) - 180.0)


def tile_xy_np(lat, lon, zoom: int):
    """Web-Mercator z/x/y (slippy-map convention), clamped at ±85.05113°."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    lon = np.asarray(lon, dtype=np.float64)
    n = float(1 << zoom)
    xt = np.floor((lon + 180.0) / 360.0 * n)
    lat_r = np.deg2rad(lat)
    yt = np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n)
    xt = np.clip(xt, 0, n - 1).astype(np.int64)
    yt = np.clip(yt, 0, n - 1).astype(np.int64)
    return xt, yt


# ---- Spark column expressions (JVM-side, codegen-friendly) -----------------

def haversine_col(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    la1, lo1, la2, lo2 = (F.radians(c) for c in (lat1, lon1, lat2, lon2))
    h = (
        F.pow(F.sin((la2 - la1) / 2), 2)
        + F.cos(la1) * F.cos(la2) * F.pow(F.sin((lo2 - lo1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(F.greatest(h, F.lit(0.0)), F.lit(1.0))))


def tile_x_col(lon: Column, zoom: int) -> Column:
    n = float(1 << zoom)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    return F.least(F.greatest(x, F.lit(0)), F.lit(int(n) - 1)).cast("long")


def tile_y_col(lat: Column, zoom: int) -> Column:
    n = float(1 << zoom)
    clamped = F.least(F.greatest(lat, F.lit(-85.05112878)), F.lit(85.05112878))
    lat_r = F.radians(clamped)
    y = F.floor(
        (F.lit(1.0) - F.log(F.tan(lat_r) + F.lit(1.0) / F.cos(lat_r)) / F.lit(float(np.pi)))
        / F.lit(2.0) * F.lit(n)
    )
    return F.least(F.greatest(y, F.lit(0)), F.lit(int(n) - 1)).cast("long")


def tile_id_col(lat: Column, lon: Column, zoom: int) -> Column:
    """Single sortable long: (zoom << 58) | (x << 29) | y."""
    return (
        (F.lit(int(zoom)).cast("long") * F.lit(2**58).cast("long"))
        + tile_x_col(lon, zoom) * F.lit(2**29).cast("long")
        + tile_y_col(lat, zoom)
    )
