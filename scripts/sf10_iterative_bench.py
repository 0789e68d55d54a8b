"""sf10 stress for the iterative tier (VERDICT r4 item 5).

suffix_array, douglas_peucker, cdc_dedup, prefix_jaccard and isotonic_fit
cost round-count x per-round shuffle; their evidence stopped at sf1. This
runs each one more decade up:

* douglas_peucker / cdc_dedup / prefix_jaccard / isotonic_fit: the exact
  contract queries at sf1 (10 replicas of sf0.1, gen_scale.py) and sf10
  (100 replicas) — cross-replica token suffixes keep similarity structure
  per-replica, so candidate work scales linearly by construction and any
  super-linear wall is the ENGINE's fault, which is what we're testing.
* suffix_array: the contract query caps the corpus string at 8000 chars
  (its oracle must replay in DuckDB), so corpus replication would not
  stress it. The honest axis is STRING LENGTH: build the char rows the
  same way the contract query does, at 100k chars ("sf1 leg") and 1M
  chars ("sf10 leg"), and record the executed doubling-round count
  (rounds = O(log longest repeat); per-round data is linear).

Ratios are wall(sf10)/wall(sf1) against the 10x data ideal. Prints ONE
JSON line for the BENCH record.

    python scripts/sf10_iterative_bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CORPORA = {"sf1": "/tmp/cartwright_sf1", "sf10": "/tmp/cartwright_sf10"}
QUERIES = ["douglas_peucker", "cdc_dedup", "prefix_jaccard", "isotonic_fit"]
SUFFIX_CHARS = {"sf1": 100_000, "sf10": 1_000_000}


def _suffix_chars(spark, path: str, cap: int):
    """Char rows for the first `cap` chars of the newline-joined
    doc_id-ordered corpus — same construction as q_suffix_array, with the
    per-doc offset map computed distributed (a window cumsum) instead of
    the contract query's metadata collect, since sf10 has ~500k docs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{path}/documents.parquet") \
        .select("doc_id", "text")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    d = (docs
         .withColumn("off", F.coalesce(
             F.sum(F.length("text") + 1).over(w), F.lit(0)))
         .where(F.col("off") < cap))
    return (d.select("off", F.posexplode(
                F.split(F.concat("text", F.lit("\n")), ""))
                .alias("p", "c"))
            .select((F.col("off") + F.col("p") + 1).alias("i"), "c")
            .where((F.col("i") <= cap) & (F.col("c") != "")))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from cartwright_spark.operators.suffix import suffix_array
    from cartwright_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("sf10_iterative_bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, 2 * int(cpus)))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()

    qmap = entry_mod.queries()
    out: dict[str, dict] = {n: {} for n in QUERIES + ["suffix_array"]}

    for sf, path in CORPORA.items():
        if not os.path.isdir(path):
            print(f"-- missing corpus {path}; run gen_scale.py",
                  file=sys.stderr)
            return
        for n in QUERIES:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qmap[n](spark, path).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[n][sf] = round(best, 3)
            print(f"{n} @{sf}: {best:.2f}s", file=sys.stderr)
        cap = SUFFIX_CHARS[sf]
        rounds: list[int] = []
        t0 = time.perf_counter()
        suffix_array(_suffix_chars(spark, path, cap),
                     rounds_out=rounds) \
            .write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        out["suffix_array"][sf] = round(dt, 3)
        out["suffix_array"][f"{sf}_chars"] = cap
        out["suffix_array"][f"{sf}_rounds"] = rounds[0]
        print(f"suffix_array @{sf} ({cap} chars): {dt:.2f}s, "
              f"{rounds[0]} rounds", file=sys.stderr)

    for n, r in out.items():
        if "sf1" in r and "sf10" in r:
            r["ratio_10x"] = round(r["sf10"] / r["sf1"], 2)
    with open("/proc/loadavg") as f:
        load = float(f.read().split()[0])
    rec = {"metric": "sf10_iterative_stress", "cpus": int(cpus),
           "loadavg": load, "queries": out}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
