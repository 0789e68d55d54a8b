"""Scale + skew ratios for queries added after the r03 sf1 table
(gopher_repetition, asof_events, range_join_orders): time each at
sf0.1, sf1 (10x), and sf1-skew, same warmup + min-of-N protocol as
bench.py, and print one JSON line for the BENCH record.

    python scripts/new_query_scale_bench.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CORPORA = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/tmp/cartwright_sf1",
    "sf1_skew": "/tmp/cartwright_sf1_skew",
}


def main() -> None:
    names = sys.argv[1:] or ["gopher_repetition", "asof_events",
                             "range_join_orders"]
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from cartwright_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("new_query_scale_bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, 2 * int(cpus)))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()

    qmap = entry_mod.queries()
    out: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf, path in CORPORA.items():
        if not os.path.isdir(path):
            print(f"-- skipping {sf}: {path} missing", file=sys.stderr)
            continue
        for n in names:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qmap[n](spark, path).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[n][sf] = round(best, 3)
            print(f"{n} @{sf}: {best:.2f}s", file=sys.stderr)
    for n in names:
        r = out[n]
        if "sf0.1" in r and "sf1" in r:
            r["ratio_10x"] = round(r["sf1"] / r["sf0.1"], 2)
        if "sf1" in r and "sf1_skew" in r:
            r["skew_ratio"] = round(r["sf1_skew"] / r["sf1"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
