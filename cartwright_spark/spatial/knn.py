"""kNN join via cell-ring expansion (SURVEY.md §2.3 J7).

Sites (gazetteer points) are indexed once by S2 cell at a chosen level.
Each query point explodes into the candidate cells covering a disc of
radius `r_cover` around it (center cell + concentric circle samples — a
geometric k-ring that is exact regardless of face boundaries), then an
equi-join on cell + a per-query top-k window over haversine distance.

Exactness: a result rank-k is provably correct iff its distance ≤ r_cover
(everything outside the disc is farther). Queries that fail that check
(sparse regions) fall back to a brute-force pass — rare by construction
when r_cover is sized to the site density.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cartwright_spark.functions.geodesy import EARTH_RADIUS_M, haversine_col
from cartwright_spark.spatial import s2


_DISC_OFFSETS: dict[tuple[int, float], tuple[np.ndarray, np.ndarray]] = {}


def _disc_offsets(level: int, r_cover_m: float):
    """(dlat_rad, dlon_rad_at_equator) sample offsets covering a disc:
    center + concentric rings spaced 0.7 cell edges, samples 0.5 edges
    apart along each ring. Depends only on (level, r_cover) → memoized."""
    key = (level, r_cover_m)
    hit = _DISC_OFFSETS.get(key)
    if hit is not None:
        return hit
    edge_m = s2.avg_edge_radians(level) * EARTH_RADIUS_M
    radii = np.arange(edge_m * 0.7, r_cover_m + edge_m, edge_m * 0.7)
    dlats, dlons = [0.0], [0.0]
    for r in radii:
        n_samples = max(8, int(2 * np.pi * r / (edge_m * 0.5)))
        ang = np.linspace(0, 2 * np.pi, n_samples, endpoint=False)
        dlats.append((r / EARTH_RADIUS_M) * np.cos(ang))
        dlons.append((r / EARTH_RADIUS_M) * np.sin(ang))
    out = (np.hstack([np.atleast_1d(a) for a in dlats]),
           np.hstack([np.atleast_1d(a) for a in dlons]))
    _DISC_OFFSETS[key] = out
    return out


def _disc_cells(lat: np.ndarray, lon: np.ndarray, level: int,
                r_cover_m: float) -> list[list[int]]:
    """Cells covering a disc around each point. Fully vectorized: ONE
    latlng_to_cell call over the (queries × samples) matrix — the offset
    set is precomputed per (level, r_cover), so per-row cost amortizes even
    when a partition holds a single query point (the earlier per-angle loop
    was ~40 ms/query and dominated the whole kNN join)."""
    lat = np.asarray(lat, float)
    lon = np.asarray(lon, float)
    dlat, dlon = _disc_offsets(level, r_cover_m)
    coslat = np.cos(np.deg2rad(lat))
    coslat = np.where(np.abs(coslat) < 1e-6, 1e-6, coslat)
    sl = np.clip(lat[:, None] + np.rad2deg(dlat)[None, :], -89.999, 89.999)
    so = ((lon[:, None] + np.rad2deg(dlon)[None, :] / coslat[:, None]
           + 180) % 360) - 180
    cells = s2.latlng_to_cell(sl.ravel(), so.ravel(), level) \
        .astype(np.int64).reshape(sl.shape)
    return [np.unique(row).tolist() for row in cells]


def knn_join(queries: DataFrame, sites: DataFrame, k: int = 5,
             level: int = 7, r_cover_m: float = 1_500_000.0,
             qid_col: str = "qid", sid_col: str = "site_id",
             exact_fallback: bool = True) -> DataFrame:
    """(qid, site_id, rank, dist_m) — k nearest sites per query point.

    queries(qid, lat, lon); sites(site_id, lat, lon). Small site dims get
    auto-broadcast; the candidate join is an equi-join on cell id.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def disc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(_disc_cells(lat.to_numpy(), lon.to_numpy(),
                                     level, r_cover_m))

    from cartwright_spark.spatial.udfs import s2_cell
    s = sites.select(F.col(sid_col).alias("site_id"),
                     F.col("lat").alias("slat"), F.col("lon").alias("slon"))
    s = s.withColumn("cell", s2_cell(F.col("slat"), F.col("slon"), level))
    # materialize the encoded site index ONCE: the candidate join's
    # key-null filter re-evaluates the encode UDF (pushed below the join,
    # so the Arrow stage runs twice) and the brute-force fallback scans it
    # again — measured 4.7 s → 1.5 s at the 24k-site gazetteer dim.
    # Blocks release via the context cleaner when unreferenced.
    s = s.localCheckpoint(eager=True)

    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col("lat").alias("qlat"), F.col("lon").alias("qlon"))
    qc = q.withColumn("cell", F.explode(disc(F.col("qlat"), F.col("qlon"))))

    dist = haversine_col(F.col("qlat"), F.col("qlon"),
                         F.col("slat"), F.col("slon"))
    cand = (qc.join(s, "cell", "inner")
            .select("qid", "qlat", "qlon", "site_id",
                    dist.alias("dist_m"))
            .dropDuplicates(["qid", "site_id"]))
    w = Window.partitionBy("qid").orderBy(F.asc("dist_m"), F.asc("site_id"))
    topk = (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))

    if not exact_fallback:
        return topk.select("qid", "site_id", "rank", "dist_m")

    # The audit + fallback below consume `topk` three times (audit agg,
    # anti-join, semi-join); without materialization Spark would re-run the
    # whole disc-explode + candidate join + window per consumer — measured
    # 3-4× the single-pass cost. Eager localCheckpoint materializes the
    # (tiny: ≤ k rows/query) top-k once AND releases its blocks via the
    # context cleaner when unreferenced — unlike persist(), which leaked a
    # cache entry per call across a long session (round-1 ADVICE item).
    topk = topk.localCheckpoint(eager=True)

    # exactness audit: a query is resolved iff it has k hits all ≤ r_cover.
    # NB: audit only sees qids WITH candidates — a query whose disc found
    # no sites at all is absent from `audit`, so the unresolved set must be
    # derived by anti-joining the RESOLVED ids against the full query set
    # (an earlier formulation silently dropped zero-candidate queries).
    audit = topk.groupBy("qid").agg(
        F.count("*").alias("n_found"), F.max("dist_m").alias("kth"))
    resolved_ids = audit.where(
        (F.col("n_found") >= k) & (F.col("kth") <= r_cover_m)).select("qid")
    resolved = topk.join(resolved_ids, "qid", "left_semi")

    # brute-force pass only for unresolved queries (small by construction)
    qq = q.join(resolved_ids, "qid", "left_anti")
    brute = qq.crossJoin(s.drop("cell")).select(
        "qid", "site_id",
        haversine_col(F.col("qlat"), F.col("qlon"),
                      F.col("slat"), F.col("slon")).alias("dist_m"))
    bw = Window.partitionBy("qid").orderBy(F.asc("dist_m"), F.asc("site_id"))
    brute_k = (brute.withColumn("rank", F.row_number().over(bw))
               .where(F.col("rank") <= k))
    return resolved.select("qid", "site_id", "rank", "dist_m").unionByName(
        brute_k.select("qid", "site_id", "rank", "dist_m"))


def knn_join_h3(queries: DataFrame, sites: DataFrame, k: int = 5,
                res: int = 3, ring_k: int = 2,
                qid_col: str = "qid", sid_col: str = "site_id",
                exact_fallback: bool = True) -> DataFrame:
    """kNN join via H3-style hex k-ring expansion (SURVEY.md §2.3 J7, the
    north star's named strategy): sites indexed once by hex cell at `res`;
    each query explodes into its geometric k-ring (face-boundary-safe),
    equi-join on cell, per-query top-k window over haversine distance.

    Exactness guarantee mirrors knn_join: rank-k answers are exact iff the
    k-th distance ≤ the ring cover radius (ring_k · √3 · edge); queries
    failing the audit fall back to a brute-force pass."""
    from pyspark.sql.functions import pandas_udf

    from cartwright_spark.spatial import h3

    r_cover_m = ring_k * np.sqrt(3.0) * h3.edge_length_radians(res) \
        * EARTH_RADIUS_M

    @pandas_udf("array<long>")
    def ring(lat: pd.Series, lon: pd.Series) -> pd.Series:
        cid = h3.latlng_to_cell(lat.to_numpy(np.float64),
                                lon.to_numpy(np.float64), res)
        return pd.Series([c.tolist() for c in h3.k_ring_geo(cid, ring_k)])

    @pandas_udf("long")
    def hexcell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(h3.latlng_to_cell(
            lat.to_numpy(np.float64), lon.to_numpy(np.float64), res))

    s = sites.select(F.col(sid_col).alias("site_id"),
                     F.col("lat").alias("slat"), F.col("lon").alias("slon"))
    s = s.withColumn("cell", hexcell(F.col("slat"), F.col("slon")))
    # materialize once — same double-eval + fallback-rescan reasoning as
    # knn_join above
    s = s.localCheckpoint(eager=True)
    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col("lat").alias("qlat"), F.col("lon").alias("qlon"))
    qc = q.withColumn("cell", F.explode(ring(F.col("qlat"), F.col("qlon"))))

    dist = haversine_col(F.col("qlat"), F.col("qlon"),
                         F.col("slat"), F.col("slon"))
    cand = (qc.join(s, "cell", "inner")
            .select("qid", "qlat", "qlon", "site_id", dist.alias("dist_m"))
            .dropDuplicates(["qid", "site_id"]))
    w = Window.partitionBy("qid").orderBy(F.asc("dist_m"), F.asc("site_id"))
    topk = (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
    if not exact_fallback:
        return topk.select("qid", "site_id", "rank", "dist_m")

    # eager localCheckpoint, not persist: see knn_join (cache-leak fix)
    topk = topk.localCheckpoint(eager=True)
    # resolved-ids anti-join (NOT unresolved semi-join): zero-candidate
    # queries are absent from the audit and must still reach the fallback
    audit = topk.groupBy("qid").agg(
        F.count("*").alias("n_found"), F.max("dist_m").alias("kth"))
    resolved_ids = audit.where(
        (F.col("n_found") >= k) & (F.col("kth") <= r_cover_m)).select("qid")
    resolved = topk.join(resolved_ids, "qid", "left_semi")
    qq = q.join(resolved_ids, "qid", "left_anti")
    brute = qq.crossJoin(s.drop("cell")).select(
        "qid", "site_id",
        haversine_col(F.col("qlat"), F.col("qlon"),
                      F.col("slat"), F.col("slon")).alias("dist_m"))
    bw = Window.partitionBy("qid").orderBy(F.asc("dist_m"), F.asc("site_id"))
    brute_k = (brute.withColumn("rank", F.row_number().over(bw))
               .where(F.col("rank") <= k))
    return resolved.select("qid", "site_id", "rank", "dist_m").unionByName(
        brute_k.select("qid", "site_id", "rank", "dist_m"))


def brute_force_knn(queries: pd.DataFrame, sites: pd.DataFrame,
                    k: int = 5) -> set[tuple]:
    """Oracle: exact haversine sort (tests only). Returns {(qid, site_id, rank)}."""
    from cartwright_spark.functions.geodesy import haversine_m
    out = set()
    for r in queries.itertuples(index=False):
        d = haversine_m(r.lat, r.lon, sites["lat"].to_numpy(),
                        sites["lon"].to_numpy())
        order = np.lexsort((sites["site_id"].to_numpy(), d))
        for rank, idx in enumerate(order[:k], start=1):
            out.add((r.qid, sites["site_id"].iloc[idx], rank))
    return out
