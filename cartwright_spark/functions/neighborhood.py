"""Graph neighborhood function N(t) — distance distribution / effective
diameter, the crawl-graph health metric (how many hops until the graph
is "done" expanding).

N(t) = |{(u, v) : v reachable from u in <= t directed hops}|, t = 0..T.
The ratio N(t)/N(T) is the cumulative distance distribution; the
smallest t with N(t) >= 0.9 * N(inf) is the standard "effective
diameter".

Two paths:

* `neighborhood_function_exact` — materializes the reachable-pair set
  per round (one equi-join + distinct per hop). Exact, but the pair
  table is O(sum of ball sizes): the verification-scale path, and the
  oracle's formulation.

* `hyperball` — Boldi & Vigna 2013: one HyperLogLog counter per node,
  ball(u, t) = {u} ∪ ⋃_{u->v} ball(v, t-1), with the union done by
  register-wise MAX — the merge is algebraic, so each round is ONE
  equi-join of the register table onto reversed edges plus ONE
  (node, reg) max-aggregation that combines map-side. State is
  <= 2^p rows per node REGARDLESS of ball size — this is the 100 TB
  path (the exact pair table would be |V| * avg-ball rows; the web
  graph's balls cover the graph within ~20 hops, making exact
  quadratic). Estimates reuse `operators/sketch.py hll_sketch` /
  register->estimate math so sketch semantics stay identical
  engine-wide.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _nodes(edges: DataFrame) -> DataFrame:
    return (edges.select(F.col("src").alias("n"))
            .unionByName(edges.select(F.col("dst").alias("n")))
            .distinct())


def neighborhood_function_exact(edges: DataFrame,
                                t_max: int = 4) -> DataFrame:
    """-> (t, pairs) for t = 0..t_max, exact directed reachability
    counts. One join + distinct per hop; early exit when a round adds
    no pairs (N(t) has converged to N(inf))."""
    if t_max < 0:
        raise ValueError("neighborhood_function_exact: t_max must be >= 0")
    spark = edges.sparkSession
    e = edges.select("src", "dst").where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()).distinct()
    reach = (_nodes(e).select(F.col("n").alias("u"), F.col("n").alias("v"))
             .localCheckpoint(eager=True))
    rows = [(0, reach.count())]
    for t in range(1, t_max + 1):
        nxt = (reach.join(e, reach["v"] == e["src"])
               .select("u", e["dst"].alias("v")))
        reach = (reach.unionByName(nxt).distinct()
                 .localCheckpoint(eager=True))   # lineage truncation
        n = reach.count()
        rows.append((t, n))
        if n == rows[-2][1]:                     # converged: pad and stop
            rows.extend((tt, n) for tt in range(t + 1, t_max + 1))
            break
    return spark.createDataFrame(rows, "t int, pairs bigint")


def hyperball(edges: DataFrame, t_max: int = 4, p: int = 6) -> DataFrame:
    """-> (t, est_pairs double): HyperLogLog-approximated N(t). Per
    round: register rows of ball(v) hop onto edges u->v, union the
    node's own registers, (node, reg) MAX — state bounded by
    |V| * 2^p rows forever."""
    if t_max < 0:
        raise ValueError("hyperball: t_max must be >= 0")
    from cartwright_spark.operators.sketch import (hll_estimate_registers,
                                                   hll_sketch)
    spark = edges.sparkSession
    e = edges.select("src", "dst").where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()).distinct() \
        .localCheckpoint(eager=True)
    nodes = _nodes(e)
    sk = hll_sketch(nodes.select(F.col("n"), F.col("n").alias("val")),
                    "n", "val", p=p).localCheckpoint(eager=True)

    def est_total(sketch: DataFrame) -> float:
        est = hll_estimate_registers(sketch, "n", p)
        return float(est.agg(F.sum("est_distinct").alias("s"))
                     .collect()[0]["s"])

    rows = [(0, est_total(sk))]
    for t in range(1, t_max + 1):
        hopped = (sk.join(e, sk["n"] == e["dst"])
                  .select(e["src"].alias("n"), "reg", "rho"))
        sk = (sk.unionByName(hopped)
              .groupBy("n", "reg").agg(F.max("rho").alias("rho"))
              .localCheckpoint(eager=True))
        rows.append((t, est_total(sk)))
    return spark.createDataFrame(rows, "t int, est_pairs double")
