"""1M-page pipeline amortization bench (round-5 VERDICT task #1).

The r4 VERDICT flagged a pages_pipeline regression at 100k pages
(18.9k -> 12.3-14.4k docs/s) caused by the Gi* hotspot surface landing
as a SIXTH checkpointed stage: the stage's compute is grid-bounded
(near-free at any corpus size) but its fixed snapshot-commit +
job-scheduling cost dominated at bench scale. Round 5 folds the Gi*
derivation into the tile_counts commit (plans/pipeline.py build_tiles:
one snapshot, one lineage hop, a metadata-guarded driver mirror for
coarse zooms) — this script publishes the amortization proof the
VERDICT asked for: the SAME pipeline, hotspot surface ON, at 1M pages.

    PYTHONPATH=. python scripts/pipeline_1m_bench.py [--pages 1000000]

Writes BENCH/pipeline_1M_r05.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--out", default="BENCH/pipeline_1M_r05.json")
    args = ap.parse_args()

    from cartwright_spark.plans.pipeline import TIME_PARTITION, run_pipeline
    from cartwright_spark.session import get_spark
    from cartwright_spark.sources.corpus import generate_pages
    from cartwright_spark.sources.iceberg_lite import Catalog

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("pipeline_1m_bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, 2 * int(cpus)))
    spark.sparkContext.setLogLevel("ERROR")

    n_pages = args.pages
    workdir = "/tmp/cartwright_pipeline_1m"
    shutil.rmtree(workdir, ignore_errors=True)
    # bench.py protocol: the source pages table is committed BEFORE the
    # clock (in production it already exists); docs/sec measures the
    # engine stages extract -> detect -> encode -> tile+Gi* rollup,
    # including every snapshot write.
    Catalog(workdir).write_table(
        generate_pages(spark, n_pages).withColumn(
            "warc_part", TIME_PARTITION["year"]()),
        "pages", stage="pages",
        stage_key=f"pages:n={n_pages}:tp=year:v2",
        partition_by=["warc_part"], files_per_partition=4)
    warm_wd = workdir + "_warm"
    shutil.rmtree(warm_wd, ignore_errors=True)
    run_pipeline(spark, warm_wd, n_pages=2000, s2_level=10, zoom=8)

    t0 = time.perf_counter()
    s = run_pipeline(spark, workdir, n_pages=n_pages, s2_level=10, zoom=8)
    dt = time.perf_counter() - t0

    out = {
        "pages": n_pages,
        "pipeline_sec": round(dt, 2),
        "docs_per_sec": round(n_pages / dt, 1),
        "hotspot_surface": "folded into tile_counts (one commit)",
        "stage_rows": {k: v.get("rows") for k, v in s["stages"].items()},
        "lineage_depth": s["lineage_depth"],
        "cpus": int(cpus),
        "r3_reference_docs_per_sec_100k": 18959,
    }
    print(json.dumps(out))
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    shutil.rmtree(workdir, ignore_errors=True)
    shutil.rmtree(warm_wd, ignore_errors=True)


if __name__ == "__main__":
    main()
