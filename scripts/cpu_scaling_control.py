"""Pure-CPU thread-scaling control for the shared-host scaling evidence.

Measures an embarrassingly parallel, zero-memory-traffic JVM job
(sum of sin over a range, whole-stage codegen) at two parallelism levels.
Whatever efficiency THIS job reaches is the box's own N→4N ceiling under
its current external load — the engine pipeline's ratio should be read
against it, not against a theoretical 1.0 (a real multi-executor cluster
adds cores *and* memory systems; one shared box adds only threads).

    python scripts/cpu_scaling_control.py --pair 2,8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def run(cores: int, n: int = 2_000_000_000, repeats: int = 3) -> float:
    from pyspark.sql import functions as F

    from cartwright_spark.session import get_spark
    gc = (f"-XX:+UseParallelGC -XX:ParallelGCThreads={cores} "
          f"-XX:ConcGCThreads={max(1, cores // 4)}")
    spark = get_spark("cpu_ctl", master=f"local[{cores}]",
                      extra_conf={"spark.driver.extraJavaOptions": gc})
    spark.sparkContext.setLogLevel("ERROR")
    def job(offset: int):
        # FRESH DataFrame per run: re-collecting one DataFrame object
        # reuses its materialized AQE shuffle stage, so repeat walls
        # measure a cache hit (~60 ms), not the compute. The offset also
        # defeats any plan-level result caching.
        df = spark.range(offset, offset + n, 1, 64)
        return df.select(F.sum(F.sin(F.col("id").cast("double"))))

    job(999).collect()  # warm codegen
    best = None
    for i in range(repeats):
        t0 = time.perf_counter()
        job(i).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="2,8")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.pair.split(","))
    with open("/proc/loadavg") as f:
        load0 = f.read().split()[0]
    # fresh subprocess per level would be cleaner, but the job has no
    # cross-run cache state (pure compute) — sequential sessions suffice
    wlo = run(lo, repeats=args.repeats)
    whi = run(hi, repeats=args.repeats)
    eff = (wlo / whi) / (hi / lo)
    print(json.dumps({
        f"wall_{lo}": round(wlo, 2), f"wall_{hi}": round(whi, 2),
        "ceiling_efficiency": round(eff, 3), "loadavg_before": load0,
    }))


if __name__ == "__main__":
    main()
