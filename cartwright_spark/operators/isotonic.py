"""Distributed isotonic regression — parallel PAVA (pool adjacent
violators), the calibration-curve fit (quality-score -> observed
outcome) a training-data pipeline runs on its scorers.

Semantics: given (grp, x, y), fit the non-decreasing step function
minimizing sum (fit - y)^2 per group. Output = the MAXIMAL pools
(grp, x_lo, x_hi, n_pts, y_sum, fitted): contiguous x-ranges with
constant fitted value = pool mean; adjacent pools have strictly
increasing means (equal-mean neighbours are merged, making the pooling
canonical — the fitted FUNCTION is the unique L2 projection, by the
classic max-min identity fit(i) = max_{j<=i} min_{k>=i} mean(y_j..y_k),
which is also exactly what the SQL oracle evaluates).

Parallel decomposition (public Spark MLlib design, also Kearsley et
al.): PAVA's pools are blocks — re-running PAVA over the concatenation
of per-range PAVA results (pools as weighted atoms) equals PAVA over
the raw sequence, because a pool only ever merges as a unit when its
neighbour forces its mean down/up.

Scale shape (the 100 TB audit):
  1. Stage 0 pre-pools duplicate x per (grp, x) with a plain groupBy
     sum/count — map-side combinable; the shuffle carries one row per
     distinct (grp, x).
  2. repartitionByRange(grp, x) makes each partition a contiguous
     x-slice of its group; stage 1 runs PAVA per (grp, partition) over
     that slice (Arrow applyInPandas) and emits its pools — a lossless
     reduction, like the hull-of-hulls.
  3. Stage 2 re-runs PAVA per grp over the surviving pools
     (|partitions of the group| x |pools| rows — metadata scale).
  4. All pool comparisons are EXACT integer cross-multiplications
     (s_a * n_b >= s_b * n_a, arbitrary-precision Python ints), so the
     pooling is deterministic and partition-invariant; the only float
     is the reported fitted mean, computed once per final pool.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POOL_SCHEMA = ("grp bigint, x_lo bigint, x_hi bigint, "
                "n_pts bigint, y_sum bigint")


def _pava(rows: list[tuple[int, int, int, int]]) -> list[tuple[int, int, int, int]]:
    """PAVA over (x_lo, x_hi, n, s) atoms sorted by x_lo. Merges while
    prev_mean >= cur_mean (>= : equal-mean pools coalesce -> maximal
    pools). Exact integer arithmetic throughout."""
    stack: list[list[int]] = []
    for x_lo, x_hi, n, s in rows:
        cur = [x_lo, x_hi, n, s]
        # merge left while the left pool's mean >= current pool's mean
        while stack and stack[-1][3] * cur[2] >= cur[3] * stack[-1][2]:
            lo, _, n0, s0 = stack.pop()
            cur = [lo, cur[1], n0 + cur[2], s0 + cur[3]]
        stack.append(cur)
    return [tuple(p) for p in stack]


def _pava_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("x_lo")
    pools = _pava(list(zip((int(v) for v in pdf["x_lo"]),
                           map(int, pdf["x_hi"]),
                           map(int, pdf["n_pts"]),
                           map(int, pdf["y_sum"]))))
    return pd.DataFrame(pools, columns=["x_lo", "x_hi", "n_pts", "y_sum"]) \
        .assign(grp=int(pdf["grp"].iloc[0]))[
            ["grp", "x_lo", "x_hi", "n_pts", "y_sum"]]


def isotonic_fit(pts: DataFrame, group_col: str = "grp",
                 x_col: str = "x", y_col: str = "y") -> DataFrame:
    """-> (grp, x_lo, x_hi, n_pts, y_sum, fitted) maximal PAVA pools
    per group. Integer x and y only (exact pooling decisions)."""
    atoms = (pts.select(F.col(group_col).cast("bigint").alias("grp"),
                        F.col(x_col).cast("bigint").alias("x"),
                        F.col(y_col).cast("bigint").alias("y"))
             .where(F.col("x").isNotNull() & F.col("y").isNotNull())
             .groupBy("grp", "x")
             .agg(F.count("*").alias("n_pts"), F.sum("y").alias("y_sum"))
             .select("grp", F.col("x").alias("x_lo"),
                     F.col("x").alias("x_hi"), "n_pts", "y_sum"))

    ranged = atoms.repartitionByRange("grp", "x_lo") \
        .withColumn("pid", F.spark_partition_id())
    local = ranged.groupBy("grp", "pid").applyInPandas(
        lambda pdf: _pava_pdf(pdf), schema=_POOL_SCHEMA)
    pools = local.groupBy("grp").applyInPandas(
        lambda pdf: _pava_pdf(pdf), schema=_POOL_SCHEMA)
    return pools.withColumn(
        "fitted", F.col("y_sum").cast("double") / F.col("n_pts"))
