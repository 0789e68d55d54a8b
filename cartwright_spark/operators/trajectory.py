"""Trajectory segmentation: per-user stay-region sessions over an
event stream with coordinates.

Reference scope note: cartwright has no trajectory layer (its temporal
work is per-column resolution classification, reference
cartwright/time_resolution.py); this is engine scope from the brief's
geospatial tier — the GeoLife-style "split a movement trace where the
subject jumped or went quiet" primitive (Li et al., ACM GIS 2008)
behind stay-point mining, feeding the same cell/tile rollups as the
rest of the spatial layer.

Semantics: order each user's events by (time, event_id); start a new
session when
  - it is the user's first event, or
  - the squared coordinate gap to the previous event exceeds
    `gap_deg`^2 (degree-space Euclidean — EXACT double arithmetic,
    no transcendentals, so the break flag is bit-identical in any
    engine; pass a haversine threshold instead if metric realism
    matters more than oracle exactness), or
  - the time gap exceeds `gap_s` seconds.
Sessions then roll up to (user, session_id, n_points, t_start_us,
t_end_us, clat, clon) with centroids computed as DECIMAL(38,12) sums
(exact + associative — partition layout cannot reorder them) divided
at the end.

Scale shape (the 100 TB audit):
  ONE shuffle on user_id feeds both the window pass and the session
  rollup (the groupBy reuses the window's hash partitioning — no
  second exchange); per-user traces are the unit of sequential work,
  which is the right grain: a user's history fits a task, and hot
  users are a J9 salting problem, not a plan problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CENTROID_DECIMALS = 12


def trajectory_sessions(events: DataFrame, user_col: str = "user_id",
                        ts_col: str = "ts", lat_col: str = "lat",
                        lon_col: str = "lon", order_col: str = "event_id",
                        gap_deg: float = 10.0,
                        gap_s: int = 2592000) -> DataFrame:
    """-> (user, session_id, n_points, t_start_us, t_end_us, clat,
    clon), session_id numbered 1.. per user in time order."""
    dec = f"decimal(38,{CENTROID_DECIMALS})"
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (Window.partitionBy(user_col)
         .orderBy(us.asc(), F.col(order_col).asc()))
    dlat = F.col(lat_col) - F.lag(lat_col).over(w)
    dlon = F.col(lon_col) - F.lag(lon_col).over(w)
    dt = us - F.lag(us).over(w)
    brk = F.when(F.lag(lat_col).over(w).isNull(), F.lit(1)).when(
        (dlat * dlat + dlon * dlon > F.lit(float(gap_deg) ** 2))
        | (dt > F.lit(int(gap_s) * 1_000_000)), F.lit(1)).otherwise(F.lit(0))
    sid = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # NB: keep user_col un-aliased here — re-aliasing it would mint a
    # new attribute and break alias-aware partitioning propagation, so
    # the rollup would re-exchange on (user, session) instead of
    # reusing the window's user hash partitioning (verified in the
    # plan-gate test: exactly one hashpartitioning exchange).
    tagged = events.select(
        F.col(user_col), us.alias("__us"),
        F.col(lat_col).alias("__lat"), F.col(lon_col).alias("__lon"),
        sid.alias("session_id"))
    agg = (tagged
           .groupBy(user_col, "session_id")
           .agg(F.count(F.lit(1)).alias("n_points"),
                F.min("__us").alias("t_start_us"),
                F.max("__us").alias("t_end_us"),
                F.sum(F.col("__lat").cast(dec)).alias("__slat"),
                F.sum(F.col("__lon").cast(dec)).alias("__slon")))
    n = F.col("n_points").cast("double")
    return agg.select(
        F.col(user_col).alias("user_id"), "session_id", "n_points",
        "t_start_us", "t_end_us",
        (F.col("__slat").cast("double") / n).alias("clat"),
        (F.col("__slon").cast("double") / n).alias("clon"))


def od_matrix(sessions: DataFrame, cell_deg: float = 10.0) -> DataFrame:
    """Origin-destination matrix over the output of
    `trajectory_sessions`: snap each session's centroid to a grid cell,
    take per-user consecutive session transitions (session_id order),
    and roll up trip counts per (origin, destination) cell pair —
    including self-transitions (a return to the same stay region).

    Determinism: centroids are exact (decimal sums / count), so the
    floor-to-cell snap and the transition pairs are engine-exact.

    Scale shape: ONE shuffle on user_id for the lag window (sessions
    are already per-user rows — orders of magnitude smaller than the
    event corpus), then one partial-agg'd rollup whose output is
    bounded by (occupied cells)^2. -> (o_row, o_col, d_row, d_col,
    n_trips)."""
    oc_r = F.floor((F.col("clat") + F.lit(90.0)) / F.lit(float(cell_deg)))
    oc_c = F.floor((F.col("clon") + F.lit(180.0)) / F.lit(float(cell_deg)))
    cells = sessions.select(
        "user_id", "session_id",
        oc_r.cast("bigint").alias("d_row"),
        oc_c.cast("bigint").alias("d_col"))
    w = Window.partitionBy("user_id").orderBy("session_id")
    trans = cells.select(
        F.lag("d_row").over(w).alias("o_row"),
        F.lag("d_col").over(w).alias("o_col"),
        "d_row", "d_col")
    return (trans.where(F.col("o_row").isNotNull())
            .groupBy("o_row", "o_col", "d_row", "d_col")
            .agg(F.count(F.lit(1)).alias("n_trips")))


def octant_sql(dx: str = "dx", dy: str = "dy") -> str:
    """45-degree heading sector (0=E ... 7=SE, counter-clockwise) of an
    integer move vector — pure sign/magnitude comparisons, no atan2, so
    the classification is EXACT and bit-identical in any engine.
    Sector k covers [k*45, (k+1)*45) degrees; a zero move is NULL.
    """
    ax, ay = f"abs({dx})", f"abs({dy})"
    return (f"CASE"
            f" WHEN {dx} > 0 AND {dy} >= 0 AND {ay} < {ax} THEN 0"
            f" WHEN {dx} > 0 AND {dy} > 0 AND {ay} >= {ax} THEN 1"
            f" WHEN {dy} > 0 AND {dx} <= 0 AND {ax} < {ay} THEN 2"
            f" WHEN {dy} > 0 AND {dx} < 0 AND {ax} >= {ay} THEN 3"
            f" WHEN {dx} < 0 AND {dy} <= 0 AND {ay} < {ax} THEN 4"
            f" WHEN {dx} < 0 AND {dy} < 0 AND {ay} >= {ax} THEN 5"
            f" WHEN {dy} < 0 AND {dx} >= 0 AND {ax} < {ay} THEN 6"
            f" WHEN {dy} < 0 AND {dx} > 0 AND {ax} >= {ay} THEN 7"
            f" END")


def heading_octants(events: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts", x_col: str = "px",
                    y_col: str = "py",
                    order_col: str = "event_id") -> DataFrame:
    """Per-user movement-direction histogram over BIGINT planar
    coordinates: -> (user, octant, n_moves, l1_total).

    Consecutive events per user (ordered by time then ``order_col``)
    form move vectors (dx, dy); each non-zero move lands in one of 8
    exact 45-degree sectors (``octant_sql``). ``l1_total`` is the
    exact BIGINT sum of |dx|+|dy| per sector — a taxicab path length.

    Scale shape: ONE shuffle on the user key feeds the lag window, and
    the (user, octant) rollup reuses that hash partitioning (group keys
    are a superset of the partitioning key — no second exchange);
    map-side combine collapses each user's moves before any exchange
    the plan might still need. Zero floats end-to-end.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (Window.partitionBy(user_col)
         .orderBy(us.asc(), F.col(order_col).asc()))
    moved = (events
             .withColumn("dx", F.col(x_col) - F.lag(x_col).over(w))
             .withColumn("dy", F.col(y_col) - F.lag(y_col).over(w))
             .withColumn("octant", F.expr(octant_sql()))
             .where(F.col("octant").isNotNull()))
    return (moved.groupBy(F.col(user_col).alias("user"), "octant")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_moves"),
                 F.sum(F.abs(F.col("dx")) + F.abs(F.col("dy")))
                 .cast("bigint").alias("l1_total")))


def stay_points(events: DataFrame, user_col: str = "user_id",
                ts_col: str = "ts", lat_col: str = "lat",
                lon_col: str = "lon", order_col: str = "event_id",
                dist_deg: float = 5.0,
                min_dwell_s: int = 3600) -> DataFrame:
    """Stay-point detection — the classic anchor-scan algorithm of
    Li et al. (ACM GIS 2008, the GeoLife stay-point miner): walk each
    user's trace in time order; from an anchor point a, extend while
    every following point stays within `dist_deg` (degree-space
    Euclidean — exact doubles, no transcendentals) of the ANCHOR; when
    the first point escapes at index e, the candidate segment is
    [a, e-1]. If its time span >= `min_dwell_s` it is a stay point and
    the walk jumps to e; otherwise the anchor advances by one. Unlike
    `trajectory_sessions` (which SPLITS on jumps between consecutive
    points), this finds maximal dwells around a fixed anchor — the two
    disagree exactly when a trace drifts slowly out of a disc.

    -> (user_id, sp_id 1.., n_pts, t_start_us, t_end_us, anchor_lat,
    anchor_lon). Anchor coords are emitted verbatim (no centroid
    arithmetic), keeping every output value engine-exact.

    Scale shape: the algorithm is inherently sequential PER USER (each
    decision depends on the previous anchor), so the user is the unit
    of parallel work — one shuffle groups traces, then an Arrow-batched
    applyInPandas kernel scans each trace with geometrically-growing
    vectorized distance chunks (per-anchor cost ~ O(segment length),
    never a full n^2 rescan). Hot users are a salting problem only if
    a single trace outgrows a task — at crawl scale traces are bounded
    by retention windows. Reference scope note: cartwright has no
    trajectory layer (see module header); engine scope from the
    geospatial tier.
    """
    import numpy as np
    import pandas as pd

    thr = float(dist_deg) ** 2
    min_dwell_us = int(min_dwell_s) * 1_000_000

    def _first_beyond(lat, lon, a, n):
        step = 64
        j = a + 1
        while j < n:
            hi = min(n, j + step)
            d2 = (lat[j:hi] - lat[a]) ** 2 + (lon[j:hi] - lon[a]) ** 2
            k = np.nonzero(d2 > thr)[0]
            if k.size:
                return j + int(k[0])
            j = hi
            step *= 2
        return n

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["__us", order_col], kind="mergesort")
        lat = pdf[lat_col].to_numpy(np.float64)
        lon = pdf[lon_col].to_numpy(np.float64)
        us = pdf["__us"].to_numpy(np.int64)
        uid = pdf[user_col].iloc[0]
        n = len(pdf)
        rows = []
        a = 0
        while a < n:
            e = _first_beyond(lat, lon, a, n)
            if us[e - 1] - us[a] >= min_dwell_us:
                rows.append((uid, len(rows) + 1, e - a,
                             int(us[a]), int(us[e - 1]),
                             float(lat[a]), float(lon[a])))
                a = e
            else:
                a += 1
        return pd.DataFrame(rows, columns=[
            "user_id", "sp_id", "n_pts", "t_start_us", "t_end_us",
            "anchor_lat", "anchor_lon"])

    tagged = events.select(
        F.col(user_col), F.col(order_col), F.col(lat_col), F.col(lon_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"))
    return tagged.groupBy(user_col).applyInPandas(
        kernel, "user_id long, sp_id long, n_pts long, t_start_us long, "
                "t_end_us long, anchor_lat double, anchor_lon double")
