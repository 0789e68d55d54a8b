"""spark-submit entry point: training-data curation over a documents table.

    spark-submit --py-files cartwright_spark.zip \
        cartwright_spark/jobs/curate.py \
        --input /data/documents.parquet --output /data/curated \
        --min-words 10 --min-quality 0.5 --langs en,es

Reads (doc_id, text) parquet, runs (optional domain cap →) dedup →
quality scoring → language filter (→ optional Gopher repetition gate)
(plans/curation.py + operators/sampling.py), writes the curated
id/feature table and prints a one-line JSON summary with kept/dropped
counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python .../jobs/x.py` runs: put the repo root on the path
# (spark-submit --py-files provides it via the shipped zip instead)
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-words", type=int, default=10)
    ap.add_argument("--max-words", type=int, default=100_000)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--repetition-filter", action="store_true",
                    help="apply the Gopher repetition gate "
                         "(operators/textstats.py repetition_scores)")
    ap.add_argument("--domain-cap", type=int, default=0,
                    help="if >0: keep at most N docs per --domain-col "
                         "stratum (hot-stratum-safe two-phase sample)")
    ap.add_argument("--domain-col", default="source")
    args = ap.parse_args()

    from cartwright_spark.plans.curation import curate_documents
    from cartwright_spark.session import get_spark

    spark = get_spark("cartwright_curate")
    docs = spark.read.parquet(args.input)
    total = docs.count()
    if args.domain_cap > 0:
        from cartwright_spark.operators.sampling import stratum_cap_sample
        docs = stratum_cap_sample(docs, args.domain_col, args.domain_cap,
                                  "doc_id")
    out = curate_documents(
        docs, min_words=args.min_words, max_words=args.max_words,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        repetition_filter=args.repetition_filter)
    out.write.mode("overwrite").parquet(args.output)
    kept = spark.read.parquet(args.output).count()
    print(json.dumps({"input_rows": total, "kept_rows": kept,
                      "dropped_rows": total - kept, "output": args.output}))


if __name__ == "__main__":
    main()
