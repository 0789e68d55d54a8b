"""kNN join via cell-ring expansion (SURVEY.md §2.3 J7).

Sites (gazetteer points) are indexed once by S2 cell at a chosen level.
Each query point explodes into the candidate cells covering a disc of
radius `r_cover` around it (center cell + concentric circle samples — a
geometric k-ring that is exact regardless of face boundaries), then an
equi-join on cell + a per-query top-k window over haversine distance.

Exactness: a result rank-k is provably correct iff its distance ≤ r_cover
(everything outside the disc is farther). Queries that fail that check
(sparse regions) re-enter the SAME candidate join with a doubled cover
radius — bounded rounds of geometric growth — so the exact brute-force
pass only ever sees the residue of the widest disc, and a loud pair-budget
guard rejects any call where that residue would still cartesian at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cartwright_spark.functions.geodesy import (EARTH_RADIUS_M,
                                                geodesic_destination,
                                                haversine_col)
from cartwright_spark.spatial import s2


_DISC_OFFSETS: dict[tuple[float, float], tuple[np.ndarray, np.ndarray]] = {}


def _disc_offsets(edge_rad: float, r_cover_m: float):
    """(arc_delta_rad, bearing_rad) polar sample grid covering a geodesic
    disc: center + concentric rings spaced 0.7 cell edges, samples 0.5
    edges apart along each ring (ring circumference measured ON the
    sphere: 2π·sin δ, so near-antipodal rings don't over-sample).
    Depends only on (edge, r_cover) → memoized."""
    key = (edge_rad, r_cover_m)
    hit = _DISC_OFFSETS.get(key)
    if hit is not None:
        return hit
    r = min(r_cover_m / EARTH_RADIUS_M, np.pi)
    deltas, thetas = [0.0], [0.0]
    for d in np.arange(edge_rad * 0.7, r + edge_rad, edge_rad * 0.7):
        d = min(d, np.pi)
        circ = 2 * np.pi * max(np.sin(d), 1e-9)
        n_samples = max(8, int(np.ceil(circ / (edge_rad * 0.5))))
        ang = np.linspace(0, 2 * np.pi, n_samples, endpoint=False)
        deltas.append(np.full(n_samples, d))
        thetas.append(ang)
    out = (np.hstack([np.atleast_1d(a) for a in deltas]),
           np.hstack([np.atleast_1d(a) for a in thetas]))
    _DISC_OFFSETS[key] = out
    return out


def _disc_cells(lat: np.ndarray, lon: np.ndarray, edge_rad: float,
                r_cover_m: float, encode) -> list[list[int]]:
    """Cells covering a disc around each point, for any cell scheme
    (``encode(lat_deg, lon_deg) -> int64 cells``; both the S2 and hex
    index use this — sampling density only depends on the cell edge).
    Fully vectorized: ONE encode call over the (queries × samples)
    matrix — the offset set is precomputed per (edge, r_cover), so
    per-row cost amortizes even when a partition holds a single query
    point (the earlier per-angle loop was ~40 ms/query and dominated the
    whole kNN join).

    Sample placement uses the exact spherical destination formula — the
    earlier planar dlat/dlon offsets left coverage gaps past ~1000 km,
    which broke the exactness audit once fallback rounds started growing
    the disc (a query could pass `kth ≤ r_cover` with a closer site
    missing from the gapped candidate set).

    The (rows × samples) work is processed in blocks of ~256k sample
    points: this kernel is MEMORY-bound (the destination formula plus
    the S2 encode allocate dozens of matrix-sized temporaries), and a
    cache-sized working set is what makes it scale with concurrent
    workers. Measured on the 32-vCPU box (1M queries, level 8, ~100
    samples/query, 10k-row Arrow batches): un-chunked, 32 workers
    aggregate SLOWER than 8 (20k vs 31k rows/s — bandwidth saturation);
    chunked, throughput scales instead of inverting, and the superlinear
    per-batch penalty (4× batch → 11× wall) disappears."""
    lat = np.asarray(lat, float)
    lon = np.asarray(lon, float)
    delta, theta = _disc_offsets(edge_rad, r_cover_m)
    n_samples = len(delta)
    block = max(1, 262_144 // max(1, n_samples))
    out: list[list[int]] = []
    for i in range(0, len(lat), block):
        sl, so = geodesic_destination(lat[i:i + block, None],
                                      lon[i:i + block, None],
                                      delta[None, :], theta[None, :])
        sl = np.clip(sl, -89.999, 89.999)
        cells = encode(sl.ravel(), so.ravel()) \
            .astype(np.int64).reshape(sl.shape)
        out.extend(np.unique(row).tolist() for row in cells)
    return out


#: half the Earth's circumference — a cover radius beyond this means the
#: disc is the whole planet and further growth cannot resolve anything new
_HALF_CIRCUMFERENCE_M = np.pi * EARTH_RADIUS_M

_OUT_COLS = ["qid", "site_id", "rank", "dist_m"]


def _grown_cover_knn(q: DataFrame, s: DataFrame, k: int, cand_topk,
                     covers: list, fallback_rounds: int,
                     max_fallback_pairs: int) -> DataFrame:
    """Shared resolve loop for both kNN variants (round-3 VERDICT item:
    the old single-round design cross-joined ALL unresolved queries
    against the full site table — unbounded when the caller's cover
    radius undershoots the site density).

    ``cand_topk(qdf, cover) -> (topk_df, r_cover_m)`` runs one candidate
    round; ``covers`` is the geometric growth schedule (each next entry
    doubles the reach). After the schedule, the residue is counted and a
    crossJoin only runs under ``max_fallback_pairs`` — past it the call
    fails loudly instead of silently planning a 100 TB cartesian."""
    resolved_parts: list[DataFrame] = []
    pending: DataFrame | None = q
    for rnd, cover in enumerate(covers[:max(1, fallback_rounds)]):
        topk, r_cover_m = cand_topk(pending, cover)
        # The audit + anti-join below consume `topk` repeatedly; without
        # materialization Spark re-runs the whole disc-explode +
        # candidate join + window per consumer — measured 3-4× the
        # single-pass cost. Eager localCheckpoint materializes the
        # (tiny: ≤ k rows/query) top-k once AND releases its blocks via
        # the context cleaner when unreferenced — unlike persist(), which
        # leaked a cache entry per call (round-1 ADVICE item).
        topk = topk.localCheckpoint(eager=True)
        # exactness audit: a query is resolved iff it has k hits all
        # ≤ r_cover (everything outside the disc is provably farther) —
        # or the disc already spans the whole planet, in which case fewer
        # than k hits just means fewer than k sites exist.
        # NB: the audit only sees qids WITH candidates — zero-candidate
        # queries are absent from it, so the unresolved set is derived by
        # anti-joining the RESOLVED ids against the pending set (an
        # earlier formulation silently dropped zero-candidate queries).
        audit = topk.groupBy("qid").agg(
            F.count("*").alias("n_found"), F.max("dist_m").alias("kth"))
        cond = (F.col("kth") <= F.lit(r_cover_m))
        if r_cover_m < _HALF_CIRCUMFERENCE_M:
            cond = cond & (F.col("n_found") >= k)
        resolved_ids = audit.where(cond).select("qid")
        resolved_parts.append(topk.join(resolved_ids, "qid", "left_semi")
                              .select(*_OUT_COLS))
        pending = pending.join(resolved_ids, "qid", "left_anti") \
            .localCheckpoint(eager=True)
        if pending.isEmpty():
            pending = None
            break
        if r_cover_m >= _HALF_CIRCUMFERENCE_M:
            break   # planet-wide disc: growth can't find more candidates

    if pending is not None:
        n_pending = pending.count()
        n_sites = s.count()   # free: s is an eager localCheckpoint
        if n_pending * n_sites > max_fallback_pairs:
            raise ValueError(
                f"knn exact fallback would cross-join {n_pending} "
                f"still-unresolved queries × {n_sites} sites "
                f"(> max_fallback_pairs={max_fallback_pairs}) after "
                f"{len(covers)} cover expansions — raise r_cover_m/"
                f"ring_k, fallback_rounds, or max_fallback_pairs")
        brute = pending.crossJoin(s.drop("cell")).select(
            "qid", "site_id",
            haversine_col(F.col("qlat"), F.col("qlon"),
                          F.col("slat"), F.col("slon")).alias("dist_m"))
        bw = Window.partitionBy("qid").orderBy(F.asc("dist_m"),
                                               F.asc("site_id"))
        resolved_parts.append(
            brute.withColumn("rank", F.row_number().over(bw))
            .where(F.col("rank") <= k).select(*_OUT_COLS))

    out = resolved_parts[0]
    for part in resolved_parts[1:]:
        out = out.unionByName(part)
    return out


def knn_join(queries: DataFrame, sites: DataFrame, k: int = 5,
             level: int = 7, r_cover_m: float = 1_500_000.0,
             qid_col: str = "qid", sid_col: str = "site_id",
             exact_fallback: bool = True, fallback_rounds: int = 4,
             max_fallback_pairs: int = 50_000_000) -> DataFrame:
    """(qid, site_id, rank, dist_m) — k nearest sites per query point.

    queries(qid, lat, lon); sites(site_id, lat, lon). Small site dims get
    auto-broadcast; the candidate join is an equi-join on cell id.
    Queries unresolved at ``r_cover_m`` retry with a doubled disc (up to
    ``fallback_rounds`` rounds, capped at a planet-wide disc) before any
    brute-force residue pass, which is itself bounded by
    ``max_fallback_pairs`` (fails loudly past it)."""
    from pyspark.sql.functions import pandas_udf

    from cartwright_spark.spatial.udfs import s2_cell
    s = sites.select(F.col(sid_col).alias("site_id"),
                     F.col("lat").alias("slat"), F.col("lon").alias("slon"))
    s = s.withColumn("cell", s2_cell(F.col("slat"), F.col("slon"), level))
    # materialize the encoded site index ONCE: the candidate join's
    # key-null filter re-evaluates the encode UDF (pushed below the join,
    # so the Arrow stage runs twice) and every fallback round rescans it
    # — measured 4.7 s → 1.5 s at the 24k-site gazetteer dim.
    # Blocks release via the context cleaner when unreferenced.
    s = s.localCheckpoint(eager=True)

    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col("lat").alias("qlat"), F.col("lon").alias("qlon"))

    edge_rad = s2.avg_edge_radians(level)

    def cand_topk(qdf: DataFrame, r_m: float):
        r_m = float(min(r_m, _HALF_CIRCUMFERENCE_M))

        @pandas_udf("array<long>")
        def disc(lat: pd.Series, lon: pd.Series) -> pd.Series:
            return pd.Series(_disc_cells(
                lat.to_numpy(), lon.to_numpy(), edge_rad, r_m,
                lambda la, lo: s2.latlng_to_cell(la, lo, level)))

        qc = qdf.withColumn(
            "cell", F.explode(disc(F.col("qlat"), F.col("qlon"))))
        dist = haversine_col(F.col("qlat"), F.col("qlon"),
                             F.col("slat"), F.col("slon"))
        cand = (qc.join(s, "cell", "inner")
                .select("qid", "qlat", "qlon", "site_id",
                        dist.alias("dist_m"))
                .dropDuplicates(["qid", "site_id"]))
        w = Window.partitionBy("qid").orderBy(F.asc("dist_m"),
                                              F.asc("site_id"))
        topk = (cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k))
        return topk, r_m

    if not exact_fallback:
        topk, _ = cand_topk(q, r_cover_m)
        return topk.select(*_OUT_COLS)

    covers = [r_cover_m * (2.0 ** i) for i in range(max(1, fallback_rounds))]
    return _grown_cover_knn(q, s, k, cand_topk, covers, fallback_rounds,
                            max_fallback_pairs)


def knn_join_h3(queries: DataFrame, sites: DataFrame, k: int = 5,
                res: int = 3, ring_k: int = 2,
                qid_col: str = "qid", sid_col: str = "site_id",
                exact_fallback: bool = True, fallback_rounds: int = 4,
                max_fallback_pairs: int = 50_000_000) -> DataFrame:
    """kNN join via H3-style hex k-ring expansion (SURVEY.md §2.3 J7, the
    north star's named strategy): sites indexed once by hex cell at `res`;
    each query explodes into its geometric k-ring (face-boundary-safe),
    equi-join on cell, per-query top-k window over haversine distance.

    Exactness guarantee mirrors knn_join: rank-k answers are exact iff the
    k-th distance ≤ the ring cover radius (ring_k · √3 · edge); queries
    failing the audit retry with a doubled ring (bounded rounds) before
    the pair-budget-guarded brute-force residue pass."""
    from pyspark.sql.functions import pandas_udf

    from cartwright_spark.spatial import h3

    edge_m = h3.edge_length_radians(res) * EARTH_RADIUS_M

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

    def cand_topk(qdf: DataFrame, rk: int):
        # the claimed-exact radius for ring_k is rk·√3·edge; candidate
        # cells come from the SAME dense geodesic disc sampler as the S2
        # variant (k_ring_geo's √3-edge ring spacing is too sparse to
        # back the exactness audit once fallback rounds grow the cover)
        r_m = float(min(int(rk) * np.sqrt(3.0) * edge_m,
                        _HALF_CIRCUMFERENCE_M))

        @pandas_udf("array<long>")
        def ring(lat: pd.Series, lon: pd.Series) -> pd.Series:
            return pd.Series(_disc_cells(
                lat.to_numpy(np.float64), lon.to_numpy(np.float64),
                h3.edge_length_radians(res), r_m,
                lambda la, lo: h3.latlng_to_cell(la, lo, res)))

        qc = qdf.withColumn(
            "cell", F.explode(ring(F.col("qlat"), F.col("qlon"))))
        dist = haversine_col(F.col("qlat"), F.col("qlon"),
                             F.col("slat"), F.col("slon"))
        cand = (qc.join(s, "cell", "inner")
                .select("qid", "qlat", "qlon", "site_id",
                        dist.alias("dist_m"))
                .dropDuplicates(["qid", "site_id"]))
        w = Window.partitionBy("qid").orderBy(F.asc("dist_m"),
                                              F.asc("site_id"))
        topk = (cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k))
        return topk, r_m

    if not exact_fallback:
        topk, _ = cand_topk(q, ring_k)
        return topk.select(*_OUT_COLS)

    covers = [ring_k * (2 ** i) for i in range(max(1, fallback_rounds))]
    return _grown_cover_knn(q, s, k, cand_topk, covers, fallback_rounds,
                            max_fallback_pairs)


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
