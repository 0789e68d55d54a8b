"""Bulk-PIP scale bench: 2,000 polygons x 1,000,000 points at S2 level 9.

Reproduces the BENCH/BASELINE.md 'Bulk PIP at scale' figure (round 2:
17.8 s on local[32] with the driver-broadcast rings; round 3 replaces
that with the cogrouped ring shuffle). Usage:

    python scripts/bulk_pip_bench.py [n_polys] [n_points]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from cartwright_spark.session import get_spark  # noqa: E402
from cartwright_spark.spatial.pip import point_in_polygon_join_bulk  # noqa: E402


def main(n_polys: int = 2000, n_points: int = 1_000_000) -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(41)

    la0 = rng.uniform(-60, 70, n_polys)
    lo0 = rng.uniform(-170, 150, n_polys)
    h = rng.uniform(1, 6, n_polys)
    w = rng.uniform(1, 10, n_polys)
    polys = pd.DataFrame({
        "admin_id": [f"adm{i}" for i in range(n_polys)],
        "ring_lat": [[float(a), float(a), float(a + hh), float(a + hh)]
                     for a, hh in zip(la0, h)],
        "ring_lon": [[float(b), float(b + ww), float(b + ww), float(b)]
                     for b, ww in zip(lo0, w)],
    })
    polys_df = spark.createDataFrame(polys).repartition(32)

    pts = (spark.range(n_points)
           .select(F.col("id").alias("point_id"),
                   (F.rand(7) * 150 - 70).alias("lat"),
                   (F.rand(11) * 360 - 180).alias("lon")))
    pts = pts.localCheckpoint()  # time the join, not the generator

    t0 = time.perf_counter()
    n = point_in_polygon_join_bulk(
        spark, pts, polys_df, level=9, point_id_col="point_id").count()
    wall = time.perf_counter() - t0
    print(json.dumps({"metric": "bulk_pip_2kx1M", "value": round(wall, 2),
                      "unit": "sec", "hits": n,
                      "pts_per_sec": round(n_points / wall)}))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
