"""Radius-join (spatial/distjoin.py) stress bench: 1M query points ×
100k sites at 50 km, measured at two parallelism levels on the same
input for the north rule's two-cluster-size scaling criterion.

    python scripts/radius_bench.py [--queries 1000000] [--sites 100000]
                                   [--r-km 50] [--pair 8,32] [--repeats 2]

Prints one JSON line: walls, pairs/sec at both core budgets, and the
normalized scaling efficiency. GC threads are pinned to the core budget
(the local[N] box-ceiling lesson from BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def run_once(cores: int, n_q: int, n_s: int, r_m: float,
             repeats: int) -> dict:
    from pyspark.sql import functions as F

    from cartwright_spark.session import get_spark
    from cartwright_spark.spatial.distjoin import within_distance_join

    spark = get_spark(
        f"radius_bench_{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(8, 2 * cores),
        extra_conf={"spark.driver.memory":
                    os.environ.get("SPARK_DRIVER_MEM", "24g")})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()

    def build(n, a, b, idc):
        return spark.range(n).select(
            F.col("id").alias(idc),
            (((F.col("id") * a) % 17001) / 100.0 - 85.0).alias("lat"),
            (((F.col("id") * b) % 36001) / 100.0 - 180.0).alias("lon"))

    best, n_pairs = None, None
    for _ in range(repeats):
        # rebuild per repeat: a reused DataFrame would reuse its
        # materialized AQE shuffle stages (the r3 control-bench bug)
        q = build(n_q, 7919, 104729, "qid").repartition(2 * cores)
        s = build(n_s, 131, 211, "site_id").repartition(max(4, cores))
        t0 = time.perf_counter()
        n_pairs = within_distance_join(q, s, r_m).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return {"cores": cores, "wall_s": round(best, 2), "pairs": n_pairs,
            "queries_per_sec": round(n_q / best),
            "pairs_per_sec": round(n_pairs / best)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=1_000_000)
    ap.add_argument("--sites", type=int, default=100_000)
    ap.add_argument("--r-km", type=float, default=50.0)
    ap.add_argument("--pair", default="8,32")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cores", type=int, default=0,
                    help="child mode: run one core budget and print json")
    args = ap.parse_args()

    if args.cores:
        # child: GC threads pinned via the env the parent set
        print(json.dumps(run_once(args.cores, args.queries, args.sites,
                                  args.r_km * 1000.0, args.repeats)))
        return

    lo, hi = (int(x) for x in args.pair.split(","))
    results = {}
    for cores in (lo, hi):
        env = dict(os.environ)
        env["SPARK_SUBMIT_OPTS"] = (
            f"-XX:ParallelGCThreads={cores} -XX:ConcGCThreads="
            f"{max(1, cores // 4)}")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--cores", str(cores),
             "--queries", str(args.queries), "--sites", str(args.sites),
             "--r-km", str(args.r_km), "--repeats", str(args.repeats)],
            capture_output=True, text=True, env=env, check=True)
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    eff = results[hi]["pairs_per_sec"] / (
        (hi / lo) * results[lo]["pairs_per_sec"])
    print(json.dumps({"lo": results[lo], "hi": results[hi],
                      "raw_scaling_efficiency": round(eff, 3),
                      "r_km": args.r_km}))


if __name__ == "__main__":
    main()
