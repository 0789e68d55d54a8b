"""Deterministic bench-scale synthesizer: sfN from sf0.1 (timing only).

The driver ships sf{0.001,0.01,0.1}; the scale-sensitivity bench (VERDICT
r2 item 4) needs 10x sf0.1. This builds it as K replicas of sf0.1 with:

* fact keys offset by replica * 10^12 (customer/orders/lineitem/events/
  documents/embeddings); dims (region/nation/supplier/part) stay as-is —
  scaling data, not dimensions.
* documents.text: every token suffixed with ~<replica> (replica 0
  unchanged). Within a replica the shingle/minhash/simhash similarity
  structure is EXACTLY sf0.1's; across replicas Jaccard ~ 0 — so
  candidate-pair work scales linearly with data, the honest null
  hypothesis for a scale test (plain replication would make every doc a
  10-way near-dup and quadratic-blow-up every pair op by construction).
* embeddings: coordinates multiplied by a replica-seeded +/-1 pattern —
  within-replica cosines identical, cross-replica pairs pseudo-random.

Timing-only data: the DuckDB correctness oracles keep running at sf0.01.

    python scripts/gen_scale.py [K] [out_dir]     # default 10 /tmp/cartwright_sf1
"""
from __future__ import annotations

import os
import sys

import numpy as np

OFF = 10 ** 12


def main(k: int = 10, out: str = "/tmp/cartwright_sf1",
         src: str = "/root/testdata/sf0.1") -> None:
    import duckdb
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in ["region", "nation", "supplier", "part"]:
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
                    f" TO '{out}/{t}.parquet' (FORMAT parquet)")

    def replicate(table: str, key_cols: list[str], extra: str = "*") -> None:
        sels = []
        for i in range(k):
            cols = ", ".join(
                f"({c} + {i * OFF})::BIGINT AS {c}" for c in key_cols)
            rest = extra.replace("{i}", str(i))
            sels.append(
                f"SELECT {cols}{', ' if rest else ''}{rest} "
                f"FROM read_parquet('{src}/{table}.parquet')")
        con.execute(f"COPY ({' UNION ALL '.join(sels)}) TO "
                    f"'{out}/{table}.parquet' (FORMAT parquet)")

    replicate("customer", ["c_custkey"],
              "c_name, c_nationkey, c_acctbal, c_mktsegment")
    replicate("orders", ["o_orderkey", "o_custkey"],
              "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    replicate("lineitem", ["l_orderkey"],
              "l_partkey, l_suppkey, l_linenumber, l_quantity, "
              "l_extendedprice, l_discount, l_tax, l_returnflag, "
              "l_linestatus, l_shipdate")
    replicate("events", ["event_id", "user_id"],
              "ts, event_type, value, props")
    # documents: token suffix per replica (replica 0 byte-identical)
    doc_sels = [f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM read_parquet('{src}/documents.parquet')"]
    for i in range(1, k):
        doc_sels.append(
            f"SELECT (doc_id + {i * OFF})::BIGINT AS doc_id, "
            f"regexp_replace(text, '(\\S+)', '\\1~{i}', 'g') AS text, "
            f"lang, source, n_chars "
            f"FROM read_parquet('{src}/documents.parquet')")
    con.execute(f"COPY ({' UNION ALL '.join(doc_sels)}) TO "
                f"'{out}/documents.parquet' (FORMAT parquet)")

    # embeddings: numpy sign-flip per replica
    import pyarrow as pa
    import pyarrow.parquet as pq
    emb = con.execute(
        f"SELECT * FROM read_parquet('{src}/embeddings.parquet')").fetchdf()
    mat = np.stack([np.asarray(v, np.float32) for v in emb["embedding"]])
    parts = []
    for i in range(k):
        rng = np.random.default_rng(1000 + i)
        signs = (rng.integers(0, 2, mat.shape[1]) * 2 - 1).astype(np.float32)
        if i == 0:
            signs[:] = 1.0
        p = emb.copy()
        p["vec_id"] = (emb["vec_id"] + i * OFF).astype(np.int64)
        p["embedding"] = list(mat * signs)
        parts.append(p)
    import pandas as pd
    allp = pd.concat(parts, ignore_index=True)
    tbl = pa.Table.from_pydict({
        "vec_id": allp["vec_id"].to_numpy(np.int64),
        "embedding": pa.array([v.tolist() for v in allp["embedding"]],
                              type=pa.list_(pa.float32())),
        "label": allp["label"].to_numpy(np.int32),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 10,
         args[1] if len(args) > 1 else "/tmp/cartwright_sf1")
