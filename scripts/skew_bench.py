"""Skewed-corpus stress bench (VERDICT r3 item 1).

Every scale number through r03 ran over a roughly uniform synthetic
corpus; the 100 TB failure mode the north rule cares most about is SKEW
(one urban cell, one hot domain, one near-dup megacluster). This runs
the EXACT bench.py query list (bench.CONTRACT_BENCH_QUERIES + the same
extras) over a given corpus — normally /tmp/cartwright_sf1_skew built by
scripts/gen_skew.py — with a per-query watchdog that cancels the query's
job group after --per-query-timeout seconds instead of wedging the whole
run, and appends one JSON line per query as it goes (a hung 10-minute
bench with zero output is what this replaces).

    python scripts/skew_bench.py run /tmp/cartwright_sf1_skew \
        --out /tmp/skew_bench.jsonl --per-query-timeout 120
    python scripts/skew_bench.py report /tmp/skew_bench.jsonl \
        --uniform BENCH/bench_sf1_r03.json

Also times `minhash_dedup_assign_docs` — the linear-output assignment
operator over the documents table — next to `minhash_lsh` (the pair
enumerator) so the megacluster's Θ(cluster²) pair blow-up has its
measured linear alternative in the same table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def run(sf_dir: str, out_path: str, per_q: float, repeats: int) -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from bench import CONTRACT_BENCH_QUERIES
    from cartwright_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("cartwright_skew_bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, 2 * int(cpus)))
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    # identical warm-up to bench.py
    spark.range(1000).select(F.sum("id")).collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def __warm(x):
        return x

    spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select(__warm(F.col("l_quantity")).alias("q")) \
        .agg(F.sum("q")).collect()

    outf = open(out_path, "a", buffering=1)

    def drain(name: str) -> None:
        """After a cancel, wait for the cancelled tasks to actually free
        their slots — cancelled pandas-UDF tasks can hold python workers
        for a while, and starting the next query immediately makes IT
        look slow (the first skew run recorded two spurious timeouts
        this way)."""
        tracker = sc.statusTracker()
        t0 = time.time()
        while tracker.getActiveJobsIds() and time.time() - t0 < 120:
            sc.cancelJobGroup(name)
            time.sleep(1)
        time.sleep(2)

    def timed(name, fn):
        best, hit_timeout = None, False
        for _ in range(repeats):
            sc.setJobGroup(name, name, interruptOnCancel=True)
            timer = threading.Timer(per_q, sc.cancelJobGroup, [name])
            timer.start()
            t0 = time.perf_counter()
            try:
                fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            except Exception as e:  # cancelled (or genuinely failed)
                hit_timeout = True
                rec = {"q": name, "sec": None, "timeout": True,
                       "budget_sec": per_q,
                       "err": type(e).__name__}
                drain(name)
                break
            finally:
                timer.cancel()
                sc.setJobGroup("", "")
        if not hit_timeout:
            rec = {"q": name, "sec": round(best, 3)}
        outf.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    only = os.environ.get("SKEW_BENCH_ONLY")
    only_set = set(only.split(",")) if only else None

    def want(name: str) -> bool:
        return only_set is None or name in only_set

    qmap = entry_mod.queries()
    for name in CONTRACT_BENCH_QUERIES:
        if want(name):
            timed(name, lambda n=name: qmap[n](spark, sf_dir)
                  .write.format("noop").mode("overwrite").save())

    # the same extra entries bench.py times over the sf tables
    def doc_fp():
        from cartwright_spark.operators.textstats import fingerprint
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        fingerprint(docs).write.format("noop").mode("overwrite").save()
    if want("doc_fingerprint"):
        timed("doc_fingerprint", doc_fp)

    def s2_rollup():
        from cartwright_spark.functions.geodesy import tile_id_col
        from cartwright_spark.spatial.udfs import with_s2_cell
        pts = entry_mod._coords(spark, sf_dir)
        (with_s2_cell(pts, "lat", "lon", 10, "s2_cell")
         .withColumn("tile_id", tile_id_col(F.col("lat"), F.col("lon"), 8))
         .groupBy("tile_id").agg(F.count("*").alias("n"),
                                 F.approx_count_distinct("s2_cell").alias("c"))
         .write.format("noop").mode("overwrite").save())
    if want("s2_tile_rollup"):
        timed("s2_tile_rollup", s2_rollup)

    def minhash():
        # the DEFAULT form — max_bucket=2000 skew-safe cap since r5
        # (VERDICT r4 item 1); uncapped exact enumeration is the
        # explicit opt-in benched as minhash_lsh_uncapped below
        from cartwright_spark.operators.dedup import (minhash_lsh_pairs,
                                                      minhash_signatures)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sigs = minhash_signatures(docs, "text", "doc_id", num_perm=64)
        minhash_lsh_pairs(sigs, bands=16, jaccard_threshold=0.7) \
            .write.format("noop").mode("overwrite").save()
    if want("minhash_lsh"):
        timed("minhash_lsh", minhash)

    def minhash_uncapped():
        from cartwright_spark.operators.dedup import (minhash_lsh_pairs,
                                                      minhash_signatures)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sigs = minhash_signatures(docs, "text", "doc_id", num_perm=64)
        minhash_lsh_pairs(sigs, bands=16, jaccard_threshold=0.7,
                          max_bucket=None) \
            .write.format("noop").mode("overwrite").save()
    if want("minhash_lsh_uncapped"):
        timed("minhash_lsh_uncapped", minhash_uncapped)

    def minhash_capped():
        from cartwright_spark.operators.dedup import (minhash_lsh_pairs,
                                                      minhash_signatures)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sigs = minhash_signatures(docs, "text", "doc_id", num_perm=64)
        minhash_lsh_pairs(sigs, bands=16, jaccard_threshold=0.7,
                          max_bucket=512) \
            .write.format("noop").mode("overwrite").save()
    if want("minhash_lsh_capped"):
        timed("minhash_lsh_capped", minhash_capped)

    def minhash_assign():
        from cartwright_spark.operators.dedup import (minhash_dedup_assign,
                                                      minhash_signatures)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sigs = minhash_signatures(docs, "text", "doc_id", num_perm=64)
        minhash_dedup_assign(sigs, bands=16, jaccard_threshold=0.7) \
            .write.format("noop").mode("overwrite").save()
    if want("minhash_dedup_assign_docs"):
        timed("minhash_dedup_assign_docs", minhash_assign)

    def simsearch():
        from cartwright_spark.operators.simsearch import brute_force_topk
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        brute_force_topk(emb, q, k=10).write.format("noop") \
            .mode("overwrite").save()
    if want("simsearch_topk"):
        timed("simsearch_topk", simsearch)

    outf.close()
    spark.stop()


def report(jsonl: str, uniform_json: str, out_json: str | None) -> None:
    with open(uniform_json) as f:
        uni = json.load(f)["queries"]
    skew = {}
    with open(jsonl) as f:
        for line in f:
            r = json.loads(line)
            skew[r["q"]] = r   # last write wins on reruns
    rows = []
    for q, r in skew.items():
        u = uni.get(q)
        s = r.get("sec")
        ratio = (s / u) if (s and u) else None
        rows.append((q, u, s, ratio, r.get("timeout", False)))
    rows.sort(key=lambda t: (not t[4], -(t[3] or 0)))
    print(f"{'query':30s} {'uniform_s':>9s} {'skew_s':>8s} {'ratio':>6s}")
    for q, u, s, ratio, to in rows:
        mark = "  TIMEOUT" if to else ("  <<<" if (ratio or 0) > 2 else "")
        print(f"{q:30s} {u if u is not None else '-':>9} "
              f"{s if s is not None else '-':>8} "
              f"{f'{ratio:.2f}' if ratio else '-':>6}{mark}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"uniform_src": uniform_json, "skew": skew}, f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["run", "report"])
    ap.add_argument("path", help="sf_dir (run) or results jsonl (report)")
    ap.add_argument("--out", default="/tmp/skew_bench.jsonl")
    ap.add_argument("--per-query-timeout", type=float, default=120.0)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--uniform", default="BENCH/bench_sf1_r03.json")
    ap.add_argument("--report-json", default=None)
    args = ap.parse_args()
    if args.cmd == "run":
        run(args.path, args.out, args.per_query_timeout, args.repeats)
    else:
        report(args.path, args.uniform, args.report_json)


if __name__ == "__main__":
    main()
