"""Graph-layer scaling evidence: PageRank at two parallelism levels.

Same protocol as scripts/scaling_bench.py (the north rule's two-cluster-
size criterion evidenced as local[8] vs local[32] on identical input):
a pre-written edge table is ranked with the same fixed-iteration job at
both core counts; efficiency = throughput_32 / (4 * throughput_8),
normalized against the box ceiling measured by cpu_scaling_control.py.

The edge table is web-shaped on purpose: 20M edges over 2M nodes with a
5% megahub (every 20th edge points at node 0) and 10% dangling sinks —
the skewed in-link key and the dangling-mass path are both live, so the
measured scaling covers the algebraic-agg absorption the operator's
100 TB story rests on.

    python scripts/graph_scaling_bench.py prepare
    python scripts/graph_scaling_bench.py run --cores 8
    python scripts/graph_scaling_bench.py run --cores 32
    python scripts/graph_scaling_bench.py report
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

WORK = "/tmp/cartwright_graph_scaling"
EDGES = 20_000_000
NODES = 2_000_000
ITERS = 5


def prepare() -> str:
    src = os.path.join(WORK, "edges")
    if os.path.exists(os.path.join(src, "_SUCCESS")):
        return src
    from pyspark.sql import functions as F

    from cartwright_spark.session import get_spark
    spark = get_spark("graph_scaling_prep", master="local[32]")
    # sinks: nodes >= 0.9*NODES never appear as src (dangling mass);
    # megahub: every 20th edge lands on node 0
    e = (spark.range(EDGES, numPartitions=256)
         .select(((F.col("id") * 48271) % int(NODES * 0.9)).alias("src"),
                 F.when(F.col("id") % 20 == 0, F.lit(0))
                 .otherwise((F.col("id") * 2654435761 + 12345) % NODES)
                 .alias("dst")))
    e.write.mode("overwrite").parquet(src)
    spark.stop()
    return src


def run(cores: int, repeats: int = 3) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from pyspark.sql import functions as F  # noqa: F401

    from cartwright_spark.functions.graph import pagerank
    from cartwright_spark.session import get_spark
    # same protocol as scaling_bench.py: pin GC parallelism to the core
    # budget (ParallelGC otherwise lends the low-N run host-core-count GC
    # threads), min-of-N walls (shared host — interference only slows),
    # loadavg recorded per repeat as external-quietness evidence.
    gc_opts = (f"-XX:+UseParallelGC -XX:ParallelGCThreads={cores} "
               f"-XX:ConcGCThreads={max(1, cores // 4)}")
    spark = get_spark(
        "graph_scaling_run", master=f"local[{cores}]",
        shuffle_partitions=max(8, 2 * cores),
        extra_conf={"spark.driver.memory":
                    os.environ.get("SPARK_DRIVER_MEM", "48g"),
                    "spark.driver.extraJavaOptions": gc_opts})
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(os.path.join(WORK, "edges"))
    walls, loads, n = [], [], 0
    for _ in range(repeats):
        with open("/proc/loadavg") as f:
            loads.append(float(f.read().split()[0]))
        t0 = time.perf_counter()
        n = pagerank(edges, "src", "dst", iters=ITERS).count()
        walls.append(round(time.perf_counter() - t0, 2))
    wall = min(walls)
    out = {"cores": cores, "wall_s": wall, "nodes": n,
           "edge_iters_per_s": round(EDGES * ITERS / wall),
           "edges": EDGES, "iters": ITERS,
           "all_walls": walls, "all_loadavg": loads}
    with open(os.path.join(WORK, f"run_{cores}.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    spark.stop()


def report() -> None:
    runs = {}
    for c in (8, 32):
        p = os.path.join(WORK, f"run_{c}.json")
        if os.path.exists(p):
            runs[c] = json.load(open(p))
    if len(runs) == 2:
        eff = runs[32]["edge_iters_per_s"] / (4 * runs[8]["edge_iters_per_s"])
        print(json.dumps({"runs": runs, "raw_efficiency_8_to_32":
                          round(eff, 3)}))
    else:
        print(json.dumps({"runs": runs, "note": "need both runs"}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["prepare", "run", "report"])
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    os.makedirs(WORK, exist_ok=True)
    if args.cmd == "prepare":
        prepare()
    elif args.cmd == "run":
        run(args.cores)
    else:
        report()


if __name__ == "__main__":
    main()
