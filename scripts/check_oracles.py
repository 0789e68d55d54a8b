"""Local replica of the driver's correctness gate.

Runs each contract query (Spark) and its oracle SQL (DuckDB) at a chosen SF
and compares row count, schema (column names), and a value hash computed the
way the driver does: sort columns by name, sort rows, hash the stringified
values (floats rounded to tolerance-stable reprs).

    python scripts/check_oracles.py                    # all queries, sf0.01
    python scripts/check_oracles.py --sf sf0.001 q1 q2 # subset
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(pdf) -> str:
    import numpy as np
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype(str)
        else:
            try:
                pdf[c] = pdf[c].astype(np.int64)
            except (TypeError, ValueError):
                pdf[c] = pdf[c].astype(str)
    rows = sorted(tuple(str(v) for v in r) for r in pdf.itertuples(index=False))
    return hashlib.sha256(json.dumps(rows).encode()).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--json", default=None,
                    help="write a per-query summary JSON (the CI-style "
                         "whole-list artifact, e.g. ORACLES_LOCAL_r05.json)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/{args.sf}"

    import duckdb
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from cartwright_spark.session import get_spark
    spark = get_spark("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = m.queries()
    oracles = m.oracle_sql()
    names = args.names or list(qs)
    bad = 0
    results: dict[str, dict] = {}
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            results[name] = {"status": "spark_error",
                             "err": f"{type(e).__name__}: {e}"[:300]}
            bad += 1
            continue
        if name not in oracles:
            print(f"{name}: NO_ORACLE rows={len(sdf)}")
            results[name] = {"status": "no_oracle", "rows": len(sdf)}
            bad += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            results[name] = {"status": "oracle_error",
                             "err": f"{type(e).__name__}: {e}"[:300]}
            bad += 1
            continue
        rows_ok = len(sdf) == len(odf)
        schema_ok = sorted(sdf.columns) == sorted(odf.columns)
        hash_ok = rows_ok and schema_ok and value_hash(sdf) == value_hash(odf)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            bad += 1
        results[name] = {"status": "ok" if status == "OK" else "fail",
                         "rows": len(sdf), "oracle_rows": len(odf),
                         "schema": schema_ok, "hash": hash_ok}
        print(f"{name}: {status} rows={len(sdf)}/{len(odf)} "
              f"schema={schema_ok} hash={hash_ok}")
    print(f"--- {len(names) - bad}/{len(names)} green")
    if args.json:
        summary = {
            "sf": args.sf,
            "total": len(names),
            "green": len(names) - bad,
            "queries": results,
        }
        with open(args.json, "w", encoding="utf-8") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {args.json}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
