"""Real multi-JVM cluster evidence: the flagship job via spark-submit
--py-files on a localhost standalone cluster (VERDICT r3 item 2).

local[N] short-circuits executor-boundary serialization, broadcast
transport and the shuffle-service path; the north rule's scaling
criterion is written in EXECUTORS ("N and 4N executors"), which local[N]
can only approximate with threads. This script runs the identical
measured job as scripts/scaling_bench.py (extract → detect → S2/tile
encode → PIP join ‖ salted rollup) on a standalone master with
`spark.executor.cores=8`, so `--pair 8,32` is literally 1 executor vs 4
executors — separate JVMs with their own heaps, python worker pools and
shuffle files.

Orchestrator (builds the package zip, launches via spark-submit):

    python scripts/standalone_bench.py up                    # master + 4 workers
    python scripts/standalone_bench.py all --pages 1000000 --variant engine
    python scripts/standalone_bench.py report --variant engine
    python scripts/standalone_bench.py down

The `job` subcommand is the spark-submit entry point — do not run it
directly.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.dirname(os.path.abspath(__file__))
for p in (REPO, SCRIPTS):
    if p not in sys.path:
        sys.path.insert(0, p)

MASTER = os.environ.get("SPARK_STANDALONE_MASTER", "spark://127.0.0.1:7077")
WORK = "/tmp/cartwright_scaling"
CLUSTER_DIR = "/tmp/spark-standalone"
ZIP = "/tmp/cartwright_spark.zip"


def spark_home() -> str:
    import pyspark
    return os.path.dirname(pyspark.__file__)


def build_zip() -> str:
    """Package zip for --py-files: every executor-side pandas-UDF closure
    imports cartwright_spark by name, so the zip must reach the python
    workers' sys.path (spark-submit handles distribution + PYTHONPATH)."""
    with zipfile.ZipFile(ZIP, "w", zipfile.ZIP_DEFLATED) as z:
        for f in glob.glob(os.path.join(REPO, "cartwright_spark", "**", "*.py"),
                           recursive=True):
            z.write(f, os.path.relpath(f, REPO))
    return ZIP


def cluster_up(workers: int = 4, cores: int = 8, mem: str = "26g") -> None:
    sh = spark_home()
    os.makedirs(f"{CLUSTER_DIR}/logs", exist_ok=True)
    env = {**os.environ, "SPARK_HOME": sh}

    def daemon(name: str, *args: str) -> None:
        with open(f"{CLUSTER_DIR}/logs/{name}.log", "ab") as log:
            p = subprocess.Popen([f"{sh}/bin/spark-class", *args],
                                 stdout=log, stderr=log, env=env,
                                 cwd=CLUSTER_DIR, start_new_session=True)
        with open(f"{CLUSTER_DIR}/{name}.pid", "w") as f:
            f.write(str(p.pid))

    daemon("master", "org.apache.spark.deploy.master.Master",
           "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8080")
    time.sleep(5)
    for i in range(1, workers + 1):
        daemon(f"worker{i}", "org.apache.spark.deploy.worker.Worker",
               MASTER, "--host", "127.0.0.1", "--cores", str(cores),
               "--memory", mem, "--webui-port", f"808{i}",
               "--port", f"4056{i}")
    time.sleep(6)


def cluster_down() -> None:
    for pidf in glob.glob(f"{CLUSTER_DIR}/*.pid"):
        try:
            with open(pidf) as f:
                os.kill(int(f.read().strip()), 15)
        except (OSError, ValueError):
            pass
        os.unlink(pidf)


def submit(cores: int, pages: int, variant: str, repeats: int) -> None:
    sh = spark_home()
    env = {**os.environ, "SPARK_HOME": sh,
           "PYTHONPATH": f"{REPO}:{SCRIPTS}"}
    subprocess.run(
        [f"{sh}/bin/spark-submit", "--master", MASTER,
         "--py-files", build_zip(),
         "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "8g"),
         os.path.abspath(__file__), "job", "--cores", str(cores),
         "--pages", str(pages), "--variant", variant,
         "--repeats", str(repeats)],
        check=True, env=env, cwd=REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["up", "down", "job", "run", "all",
                                    "report"])
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--variant", default="engine",
                    choices=["full", "engine"])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--pair", default="8,32",
                    help="total-core budgets; at executor.cores=8 this is "
                         "1 vs 4 executors")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.pair.split(","))

    if args.cmd == "up":
        cluster_up()
        return
    if args.cmd == "down":
        cluster_down()
        return

    from scaling_bench import prepare, prepare_extracted, run_once

    if args.cmd == "job":
        # running inside spark-submit: measure on the standalone master
        res = run_once(args.cores, args.pages, args.variant, args.repeats,
                       master=MASTER)
        res["mode"] = f"standalone-{args.cores // 8}x8"
        path = os.path.join(WORK,
                            f"standalone_{args.variant}_{args.cores}.json")
        os.makedirs(WORK, exist_ok=True)
        with open(path, "w") as f:
            json.dump(res, f)
        print(json.dumps(res))
        return

    if args.cmd in ("run", "all"):
        if args.variant == "engine":
            prepare_extracted(args.pages)
        else:
            prepare(args.pages)
    if args.cmd == "run":
        submit(args.cores, args.pages, args.variant, args.repeats)
        return
    if args.cmd == "all":
        for cores in (lo, hi):
            submit(cores, args.pages, args.variant, args.repeats)

    v = args.variant
    with open(os.path.join(WORK, f"standalone_{v}_{lo}.json")) as f:
        rlo = json.load(f)
    with open(os.path.join(WORK, f"standalone_{v}_{hi}.json")) as f:
        rhi = json.load(f)
    eff = rhi["docs_per_sec"] / ((hi / lo) * rlo["docs_per_sec"])
    out = {f"exec_{lo // 8}x8": rlo, f"exec_{hi // 8}x8": rhi, "variant": v,
           "scaling_efficiency": round(eff, 3)}
    print(json.dumps(out, indent=1))
    with open(os.path.join(WORK, f"standalone_scaling_{v}_{lo}_{hi}.json"),
              "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
