"""CLI parity with the reference's ``cartwright`` console script
(categorize.py:476-490, pyproject.toml:33):

    spark-submit --py-files cartwright_spark.zip \
        cartwright_spark/jobs/categorize.py --path data.csv [--num-samples 99]

Prints the categorize() dict as JSON.
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
    ap.add_argument("--path", required=True, help="CSV or parquet input")
    ap.add_argument("--num-samples", type=int, default=99)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from cartwright_spark.operators.classify import categorize, read_in
    from cartwright_spark.session import get_spark

    spark = get_spark("cartwright_categorize")
    spark.sparkContext.setLogLevel("ERROR")
    df = read_in(spark, args.path)
    out = categorize(df, n_samples=args.num_samples, seed=args.seed)
    print(json.dumps(out, indent=2, default=str))


if __name__ == "__main__":
    main()
