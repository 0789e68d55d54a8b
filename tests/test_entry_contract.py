"""Driver-contract conformance: every queries() entry matches its
oracle_sql() in DuckDB — row count, column names, and order-insensitive
value equality (the driver's hash compare, emulated here)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.10g}"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract: must run, be deterministic, and return rows
        assert len(srows) > 0, f"{name}: rows-only query returned nothing"
        again = q(spark, SF_DIR).count()
        assert again == len(srows), f"{name}: nondeterministic row count"
        return
    res = ddb.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: schema mismatch"
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    assert _normalize([tuple(r) for r in srows], scols) == \
        _normalize(orows, ocols), f"{name}: value mismatch"


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"tile_id", "n_points", "n_cells"}


def test_bench_list_covers_every_contract_query():
    """Every queries() entry must be timed by bench.py (doc_fingerprint
    / minhash_lsh / simsearch_topk are timed as dedicated bench fns
    over the real tables at the bench SF)."""
    import bench
    import __spark_entry__ as entry
    benched = (set(bench.CONTRACT_BENCH_QUERIES)
               | {"doc_fingerprint", "minhash_lsh", "simsearch_topk"})
    missing = set(entry.queries()) - benched
    stale = set(bench.CONTRACT_BENCH_QUERIES) - set(entry.queries())
    assert not missing, f"not benched: {sorted(missing)}"
    assert not stale, f"benched but not a query: {sorted(stale)}"
