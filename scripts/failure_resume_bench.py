"""Mid-stage failure injection at scale (VERDICT r3 item 6).

The toy-scale resume proofs live in tests/test_pipeline.py; this script
runs the same contract at 1M pages: the checkpointed pipeline is killed
MID-`cells`-STAGE (the `inject_fail` knob makes tasks past
`fail_after_parts` partitions raise inside the stage's write job, so a
prefix of tasks completes before the job aborts and the stage's snapshot
manifest is never committed — the state a lost executor/driver leaves a
100 TB run in; Spark's commit protocol cleans the staging dir on job
abort, and any files that do survive an unclean abort are invisible to
readers because only manifest-listed files are ever loaded). The
restart must reuse the
pages/extracted/detections snapshots, re-run ONLY the torn stage, and
produce bit-identical tiles to a never-crashed run.

Each phase runs in its own subprocess (fresh JVM) so the resumed run
can't borrow JIT/arrow warmup or cached shuffle stages from the crashed
one — the same isolation rule the scaling benches learned in r2.

    python scripts/failure_resume_bench.py --pages 1000000          # all phases
    python scripts/failure_resume_bench.py --pages 1000000 --phase crash
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

WORK = "/tmp/cartwright_failure_resume"
OUT = os.path.join(REPO, "BENCH", "failure_resume_1M_r04.json")


def _run_phase(phase: str, pages: int) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM=os.environ.get(
        "SPARK_DRIVER_MEM", "24g"))
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--pages", str(pages), "--phase", phase],
        env=env, capture_output=True, text=True, cwd=REPO)
    last = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not last:
        raise SystemExit(
            f"phase {phase} produced no result line\n--- stdout\n"
            f"{p.stdout[-4000:]}\n--- stderr\n{p.stderr[-4000:]}")
    return json.loads(last[-1])


def phase_crash(pages: int) -> dict:
    from cartwright_spark.plans.pipeline import run_pipeline
    from cartwright_spark.session import get_spark
    from cartwright_spark.sources.iceberg_lite import Catalog

    wd = os.path.join(WORK, "crash")
    shutil.rmtree(wd, ignore_errors=True)
    spark = get_spark("failure_resume_crash")
    t0 = time.perf_counter()
    err = None
    try:
        run_pipeline(spark, wd, n_pages=pages, inject_fail="cells",
                     fail_after_parts=8)
    except Exception as e:  # noqa: BLE001 — the injected Py4J job failure
        err = type(e).__name__
    wall = time.perf_counter() - t0
    assert err is not None, "injected failure did not fire"
    cat = Catalog(wd)
    committed = {t: len(cat.snapshots(t))
                 for t in ("pages", "extracted", "detections", "cells",
                           "tile_counts")}
    assert committed["detections"] == 1 and committed["cells"] == 0, committed
    # data files surviving the abort (usually 0: Spark's commit protocol
    # cleans staging on job abort; any stragglers are invisible anyway —
    # readers only load manifest-listed files)
    torn_dir = os.path.join(wd, "cells", "data")
    torn_files = sum(len(fs) for _, _, fs in os.walk(torn_dir)) \
        if os.path.isdir(torn_dir) else 0
    spark.stop()
    return {"phase": "crash", "wall_sec": round(wall, 2), "error": err,
            "committed": committed, "torn_cells_files": torn_files}


def _tiles_digest(spark, wd: str):
    from pyspark.sql import functions as F
    from cartwright_spark.sources.iceberg_lite import Catalog
    df = Catalog(wd).load_table(spark, "tile_counts")
    row = df.agg(
        F.count("*").alias("rows"),
        F.sum(F.crc32(F.concat_ws(",", "tile_id", "n_points"))).alias("h"),
    ).collect()[0]
    return row["rows"], row["h"]


def phase_resume(pages: int) -> dict:
    from cartwright_spark.plans.pipeline import run_pipeline
    from cartwright_spark.session import get_spark

    wd = os.path.join(WORK, "crash")
    spark = get_spark("failure_resume_resume")
    t0 = time.perf_counter()
    s = run_pipeline(spark, wd, n_pages=pages)
    wall = time.perf_counter() - t0
    reused = {k: v["reused"] for k, v in s["stages"].items()}
    assert reused == {"pages": True, "extracted": True, "detections": True,
                      "cells": False, "tile_counts": False}, reused
    rows, digest = _tiles_digest(spark, wd)
    spark.stop()
    return {"phase": "resume", "wall_sec": round(wall, 2), "reused": reused,
            "tile_rows": rows, "tile_digest": digest}


def phase_cold(pages: int) -> dict:
    from cartwright_spark.plans.pipeline import run_pipeline
    from cartwright_spark.session import get_spark

    wd = os.path.join(WORK, "cold")
    shutil.rmtree(wd, ignore_errors=True)
    spark = get_spark("failure_resume_cold")
    t0 = time.perf_counter()
    run_pipeline(spark, wd, n_pages=pages)
    wall = time.perf_counter() - t0
    rows, digest = _tiles_digest(spark, wd)
    spark.stop()
    return {"phase": "cold", "wall_sec": round(wall, 2),
            "tile_rows": rows, "tile_digest": digest}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--phase", choices=["crash", "resume", "cold"])
    args = ap.parse_args()

    if args.phase:
        fn = {"crash": phase_crash, "resume": phase_resume,
              "cold": phase_cold}[args.phase]
        print(json.dumps(fn(args.pages)))
        return

    crash = _run_phase("crash", args.pages)
    resume = _run_phase("resume", args.pages)
    cold = _run_phase("cold", args.pages)
    assert (resume["tile_rows"], resume["tile_digest"]) == \
        (cold["tile_rows"], cold["tile_digest"]), (resume, cold)
    result = {
        "pages": args.pages,
        "crash": crash, "resume": resume, "cold": cold,
        "resume_over_cold": round(resume["wall_sec"] / cold["wall_sec"], 3),
        "tiles_identical": True,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
