"""Partition-pruning bench: a time-sliced query over the partitioned
iceberg-lite `pages` layout vs the same query full-scan.

Writes a 1M-page table hive-partitioned on warc year (~32 dirs), then
times an aggregation (a) over the whole table, (b) filtered to one year
through Catalyst partition pruning, (c) over the manifest-pruned file
subset (`Catalog.load_table(partition_filter=...)` — the resume path).
Prints ONE JSON line with walls + file counts.

    python scripts/prune_bench.py [n_pages]
"""
from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F  # noqa: E402

from cartwright_spark.plans.pipeline import TIME_PARTITION  # noqa: E402
from cartwright_spark.session import get_spark  # noqa: E402
from cartwright_spark.sources.corpus import generate_pages  # noqa: E402
from cartwright_spark.sources.iceberg_lite import Catalog  # noqa: E402


def main(n: int = 1_000_000) -> None:
    spark = get_spark("prune_bench")
    spark.sparkContext.setLogLevel("ERROR")
    wd = "/tmp/cartwright_prune_bench"
    shutil.rmtree(wd, ignore_errors=True)
    cat = Catalog(wd)
    snap = cat.write_table(
        generate_pages(spark, n).withColumn(
            "warc_part", TIME_PARTITION["year"]()),
        "pages", stage="pages", partition_by=["warc_part"],
        files_per_partition=4)
    years = sorted({f["partition"]["warc_part"] for f in snap["files"]})
    pick = years[len(years) // 2]

    def agg(df):
        return df.agg(F.count("*").alias("n"),
                      F.avg(F.length("text")).alias("t")).collect()

    def timed(fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    full = timed(lambda: agg(cat.load_table(spark, "pages")))
    pruned = timed(lambda: agg(
        cat.load_table(spark, "pages")
        .where(F.col("warc_part") == int(pick))))
    sel = cat.select_files("pages",
                           partition_filter=lambda p: p["warc_part"] == pick)
    manifest = timed(lambda: agg(cat.load_table(
        spark, "pages",
        partition_filter=lambda p: p["warc_part"] == pick)))
    print(json.dumps({
        "metric": "partition_prune_1M", "unit": "sec",
        "full_scan_sec": full, "catalyst_pruned_sec": pruned,
        "manifest_pruned_sec": manifest,
        "files_total": len(snap["files"]), "files_sliced": len(sel),
        "rows_total": snap["row_count"],
        "rows_sliced": sum(f["rows"] for f in sel),
        "speedup": round(full / pruned, 2)}))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
