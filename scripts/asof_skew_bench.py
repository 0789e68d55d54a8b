"""Hot-key as-of join: plain vs bucket_us skew split.

The plain union+window as-of sorts each key's rows in one task; a key
owning 80% of a corpus serializes 80% of the sort onto one core. The
bucket_us variant partitions the window on (key, time-bucket) and
restores cross-bucket matches with a bucket-grain carry. This measures
both on a deliberately hostile corpus: N left rows with 80% on ONE key,
uniform over a 30-day span, rights at 1/20 density.

    python scripts/asof_skew_bench.py --rows 4000000
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

SPAN_US = 30 * 24 * 3600 * 1_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.8)
    ap.add_argument("--bucket-hours", type=float, default=6.0)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cartwright_spark.operators.temporal_join import asof_join
    from cartwright_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("asof_skew_bench", master=f"local[{cpus}]",
                      shuffle_partitions=2 * int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n, hot = args.rows, args.hot_frac
    # deterministic corpus: hash-scattered times, one dominant key
    left = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.pmod(F.xxhash64("id"), 1000) < int(hot * 1000), 0)
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), 64) + 1)
        .alias("user_id"),
        F.timestamp_micros((F.pmod(F.xxhash64("id", F.lit(2)),
                                   F.lit(SPAN_US)))).alias("ts"))
    right = spark.range(n // 20).select(
        (F.col("id") + 10_000_000).alias("event_id"),
        F.when(F.pmod(F.xxhash64("id", F.lit(3)), 1000) < int(hot * 1000), 0)
        .otherwise(F.pmod(F.xxhash64("id", F.lit(4)), 64) + 1)
        .alias("user_id"),
        F.timestamp_micros((F.pmod(F.xxhash64("id", F.lit(5)),
                                   F.lit(SPAN_US)))).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(6)), 10_000) / 100.0).alias("value"))
    left.localCheckpoint(); right.localCheckpoint()

    def timed(fn):
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    bucket_us = int(args.bucket_hours * 3600 * 1_000_000)
    plain = timed(lambda: asof_join(left, right, ["user_id"], "ts",
                                    ["event_id", "value"]))
    bucketed = timed(lambda: asof_join(left, right, ["user_id"], "ts",
                                       ["event_id", "value"],
                                       bucket_us=bucket_us))
    # correctness spot-check on the same corpus (checksum equality)
    def csum(df):
        return df.agg(F.sum(F.crc32(F.concat_ws(
            ",", "event_id", F.coalesce(F.col("r_event_id"), F.lit(-1)))))
            .alias("h")).collect()[0]["h"]
    same = csum(asof_join(left, right, ["user_id"], "ts",
                          ["event_id", "value"])) == \
        csum(asof_join(left, right, ["user_id"], "ts",
                       ["event_id", "value"], bucket_us=bucket_us))
    print(json.dumps({
        "rows": n, "hot_frac": hot, "bucket_hours": args.bucket_hours,
        "plain_sec": plain, "bucketed_sec": bucketed,
        "speedup": round(plain / bucketed, 2), "checksums_equal": same}))


if __name__ == "__main__":
    main()
