"""Hilbert curve index (spatial/hilbert.py) — the properties that DEFINE
the curve, checked exhaustively on small grids (no external reference
implementation involved):

1. bijection: 2^order x 2^order grid -> exactly the integers
   [0, 4^order)
2. adjacency: consecutive indexes are Manhattan-distance-1 grid
   neighbors (the Hilbert property; z-order fails this at seams)
3. the standard order-1 orientation (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3
"""

import itertools

import pytest
from pyspark.sql import functions as F

from cartwright_spark.spatial.hilbert import hilbert_index, hilbert_sql


def _grid(spark, order):
    n = 1 << order
    rows = [(x, y) for x, y in itertools.product(range(n), range(n))]
    return spark.createDataFrame(rows, "x long, y long")


@pytest.mark.parametrize("order", [1, 2, 4])
def test_bijection_and_adjacency(spark, order):
    out = hilbert_index(_grid(spark, order), "x", "y", order).collect()
    n = 1 << order
    by_d = {r.hilbert_d: (r.x, r.y) for r in out}
    assert sorted(by_d) == list(range(n * n))          # bijection
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = by_d[d], by_d[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, \
            f"order {order}: d={d} jumps from {(x0, y0)} to {(x1, y1)}"


def test_order1_orientation(spark):
    out = {(r.x, r.y): r.hilbert_d
           for r in hilbert_index(_grid(spark, 1), "x", "y", 1).collect()}
    assert out == {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}


def test_sql_twin_matches_engine(spark):
    duckdb = pytest.importorskip("duckdb")
    order = 3
    got = {(r.x, r.y): r.hilbert_d
           for r in hilbert_index(_grid(spark, order), "x", "y",
                                  order).collect()}
    n = 1 << order
    vals = ", ".join(f"({x}, {y})"
                     for x, y in itertools.product(range(n), range(n)))
    sql = hilbert_sql(f"SELECT * FROM (VALUES {vals}) AS t(x, y)",
                      ["x", "y"], "x", "y", order)
    want = {(x, y): d for x, y, d in duckdb.sql(sql).fetchall()}
    assert got == want


def test_no_shuffle_no_udf_plan(spark):
    df = hilbert_index(_grid(spark, 4), "x", "y", 8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM column arithmetic


def test_order_bounds(spark):
    with pytest.raises(ValueError):
        hilbert_index(_grid(spark, 1), "x", "y", 0)
    with pytest.raises(ValueError):
        hilbert_index(_grid(spark, 1), "x", "y", 32)
