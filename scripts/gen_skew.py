"""Deterministic SKEWED bench-scale synthesizer: sf1-skew from sf0.1.

The uniform sf1 corpus (scripts/gen_scale.py) proved linear scaling but
never tested the 100 TB failure mode the north rule cares most about:
SKEW. This builds the same 10x corpus with three zipfian hazards
injected (timing-only data — the DuckDB correctness oracles keep
running at sf0.01):

* **3 hot cells**: 20% of lineitem rows get their coordinate-driving
  keys (l_partkey → lat, l_orderkey → lon) collapsed onto 3 constant
  (lat, lon) pairs — one urban S2/H3/tile cell absorbs ~400k points at
  sf1. Stresses every groupBy(cell) rollup, the PIP candidate join, and
  the salted-aggregate path (J9).
* **10k-doc near-dup megacluster**: one document's text replicated 10k
  times with a single distinct token appended (pairwise Jaccard ≈ 1) as
  doc_ids 10e12*10+i. Every banded-LSH bucket it touches holds 10k
  docs — the candidate-pair hazard is Θ(cluster²) by construction.
* **hot domain**: 30% of all documents get source='hot.example' —
  one groupBy(source) key owns a third of the corpus.
* **2k near-identical embeddings**: vec 0's embedding replicated 2k
  times with deterministic 1e-3 jitter (cosine ≈ 1.0) as vec_ids
  10e12*10+i — the hot IVF/LSH-bucket hazard for the ANN layer.

    python scripts/gen_skew.py [K] [out_dir]   # default 10 /tmp/cartwright_sf1_skew
"""
from __future__ import annotations

import os
import sys

import numpy as np

OFF = 10 ** 12

#: 3 hot (l_partkey, l_orderkey) constants. lat = (p*7919)%18001/100-90,
#: lon = (o*104729 + linenumber)%36001/100-180; linenumber 1..7 jitters
#: lon by ≤0.06° so each pair lands inside one ~0.1° urban cell.
HOT_KEYS = [(101, 1003), (2213, 50021), (9001, 777)]

DUP_CLUSTER_DOCS = 10_000
HOT_EMBED_VECS = 2_000
HOT_DOMAIN_FRACTION = 0.3    # of every replica's docs, deterministic


def main(k: int = 10, out: str = "/tmp/cartwright_sf1_skew",
         src: str = "/root/testdata/sf0.1") -> None:
    import duckdb
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in ["region", "nation", "supplier", "part"]:
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
                    f" TO '{out}/{t}.parquet' (FORMAT parquet)")

    def replicate(table: str, key_cols: list[str], extra: str = "*",
                  post: str = "") -> None:
        sels = []
        for i in range(k):
            cols = ", ".join(
                f"({c} + {i * OFF})::BIGINT AS {c}" for c in key_cols)
            rest = extra.replace("{i}", str(i))
            sels.append(
                f"SELECT {cols}{', ' if rest else ''}{rest} "
                f"FROM read_parquet('{src}/{table}.parquet')")
        con.execute(f"COPY (SELECT * FROM ({' UNION ALL '.join(sels)}) "
                    f"{post}) TO '{out}/{table}.parquet' (FORMAT parquet)")

    replicate("customer", ["c_custkey"],
              "c_name, c_nationkey, c_acctbal, c_mktsegment")
    replicate("orders", ["o_orderkey", "o_custkey"],
              "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    replicate("events", ["event_id", "user_id"],
              "ts, event_type, value, props")

    # lineitem: 10x replicas, then collapse the coordinate keys of a
    # deterministic 20% of rows onto the 3 hot constants (weighted 3:2:1
    # — a zipf-ish head, not three equal warm cells)
    hot_case_p = ("CASE WHEN __h % 6 < 3 THEN {p0} WHEN __h % 6 < 5 "
                  "THEN {p1} ELSE {p2} END").format(
        p0=HOT_KEYS[0][0], p1=HOT_KEYS[1][0], p2=HOT_KEYS[2][0])
    hot_case_o = ("CASE WHEN __h % 6 < 3 THEN {o0} WHEN __h % 6 < 5 "
                  "THEN {o1} ELSE {o2} END").format(
        o0=HOT_KEYS[0][1], o1=HOT_KEYS[1][1], o2=HOT_KEYS[2][1])
    li_sels = []
    for i in range(k):
        li_sels.append(
            f"SELECT (l_orderkey + {i * OFF})::BIGINT AS l_orderkey, "
            f"l_partkey, l_suppkey, l_linenumber, l_quantity, "
            f"l_extendedprice, l_discount, l_tax, l_returnflag, "
            f"l_linestatus, l_shipdate "
            f"FROM read_parquet('{src}/lineitem.parquet')")
    con.execute(f"""
        COPY (
          SELECT CASE WHEN __hot THEN ({hot_case_o})::BIGINT
                      ELSE l_orderkey END AS l_orderkey,
                 CASE WHEN __hot THEN ({hot_case_p})::BIGINT
                      ELSE l_partkey END AS l_partkey,
                 l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM (
            SELECT *, hash(l_orderkey * 31 + l_linenumber) AS __h,
                   (hash(l_orderkey * 31 + l_linenumber) % 5 = 0) AS __hot
            FROM ({' UNION ALL '.join(li_sels)})
          )
        ) TO '{out}/lineitem.parquet' (FORMAT parquet)""")

    # documents: per-replica token suffix (replica 0 byte-identical), a
    # 30% hot domain, plus the 10k-row near-dup megacluster
    doc_sels = []
    for i in range(k):
        text = ("text" if i == 0 else
                f"regexp_replace(text, '(\\S+)', '\\1~{i}', 'g')")
        doc_sels.append(
            f"SELECT (doc_id + {i * OFF})::BIGINT AS doc_id, {text} AS text, "
            f"lang, CASE WHEN hash(doc_id + {i * OFF}) % 10 < 3 "
            f"THEN 'hot.example' ELSE source END AS source, n_chars "
            f"FROM read_parquet('{src}/documents.parquet')")
    base_doc = con.execute(
        f"SELECT text, lang, source, n_chars FROM "
        f"read_parquet('{src}/documents.parquet') ORDER BY doc_id LIMIT 1"
    ).fetchone()
    base_text = base_doc[0].replace("'", "''")
    cluster = (
        f"SELECT ({10 * OFF} + i)::BIGINT AS doc_id, "
        f"'{base_text}' || ' zqx' || i::VARCHAR AS text, "
        f"'{base_doc[1]}' AS lang, 'hot.example' AS source, "
        f"(length('{base_text}') + 6)::INT AS n_chars "
        f"FROM generate_series(0, {DUP_CLUSTER_DOCS - 1}) AS t(i)")
    con.execute(
        f"COPY ({' UNION ALL '.join(doc_sels)} UNION ALL {cluster}) "
        f"TO '{out}/documents.parquet' (FORMAT parquet)")

    # embeddings: sign-flip replicas + the 2k near-identical hot cluster
    import pandas as pd
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
    rng = np.random.default_rng(4242)
    hotv = mat[0][None, :] + rng.normal(
        0, 1e-3, (HOT_EMBED_VECS, mat.shape[1])).astype(np.float32)
    parts.append(pd.DataFrame({
        "vec_id": (10 * OFF + np.arange(HOT_EMBED_VECS)).astype(np.int64),
        "embedding": list(hotv),
        "label": np.full(HOT_EMBED_VECS, int(emb["label"].iloc[0]),
                         np.int32),
    }))
    allp = pd.concat(parts, ignore_index=True)
    tbl = pa.Table.from_pydict({
        "vec_id": allp["vec_id"].to_numpy(np.int64),
        "embedding": pa.array([np.asarray(v, np.float32).tolist()
                               for v in allp["embedding"]],
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
    hot = con.execute(f"""
        SELECT l_partkey, count(*) FROM read_parquet('{out}/lineitem.parquet')
        WHERE l_partkey IN ({HOT_KEYS[0][0]}, {HOT_KEYS[1][0]}, {HOT_KEYS[2][0]})
        GROUP BY 1 ORDER BY 2 DESC""").fetchall()
    print("hot cells:", hot)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 10,
         args[1] if len(args) > 1 else "/tmp/cartwright_sf1_skew")
