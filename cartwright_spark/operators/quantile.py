"""Exact quantiles at scale — k-th order statistic WITHOUT a global sort.

A 100 TB column's median cannot be `orderBy(col).offset(k)`: that is a
full-data total sort (one range shuffle of everything). The classic
distributed-selection alternative (Blum et al.-style bisection adapted
to aggregation engines; public folklore, e.g. the "histogram quantile"
in Dremel/BigQuery papers) refines a value range with bounded rounds of
ALGEBRAIC aggregation:

  round: bucket the rows of the current range into B equal-width cells
  (one map-side-combinable groupBy → ≤B rows to the driver, plus each
  cell's count/min/max), locate the cell holding the k-th value, recurse
  into [cell.min, cell.max] with k rebased.

Each round the candidate set shrinks ~B× (or the cell collapses to a
single value — min==max — which answers immediately, so a mega-duplicate
value cannot stall the loop). The driver only ever sees ≤B aggregate
rows per round: this is a bounded driver CONTROL loop over
metadata-scale results, not a driver data path. Rows outside the range
are cut by an ordinary pushed-down filter, so later rounds scan less.

Exact semantics: value at 0-based sorted index floor(q·(n−1)) — the
discrete lower quantile, mirrored 1:1 by the SQL
``row_number() = 1 + floor(q·(n−1))`` oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_order_stat(df: DataFrame, value_col: str, k: int,
                     buckets: int = 4096, max_rounds: int = 12) -> float:
    """Exact value at 0-based sorted index ``k`` of ``value_col``
    (nulls excluded), via bounded histogram-refinement rounds."""
    src = df.select(F.col(value_col).cast("double").alias("v")) \
            .where(F.col("v").isNotNull())
    row = src.agg(F.min("v").alias("lo"), F.max("v").alias("hi"),
                  F.count("*").alias("n")).first()
    lo, hi, n = row["lo"], row["hi"], row["n"]
    if n == 0:
        raise ValueError("exact_order_stat over an empty column")
    if not 0 <= k < n:
        raise ValueError(f"k={k} out of range for n={n}")
    for _ in range(max_rounds):
        if lo == hi:
            return lo
        width = (hi - lo) / buckets
        if width <= 0 or not math.isfinite(width):
            return lo    # range below double resolution: all equal-ish
        cells = (src.where((F.col("v") >= lo) & (F.col("v") <= hi))
                 .select(F.least(
                     F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
                     F.lit(buckets - 1)).alias("cell"), "v")
                 .groupBy("cell")
                 .agg(F.count("*").alias("cnt"), F.min("v").alias("mn"),
                      F.max("v").alias("mx"))
                 .orderBy("cell").collect())
        acc = 0
        for c in cells:
            if acc + c["cnt"] > k:
                if c["mn"] == c["mx"]:
                    return c["mn"]
                lo, hi, k = c["mn"], c["mx"], k - acc
                break
            acc += c["cnt"]
        else:   # pragma: no cover - accounting failure would be a bug
            raise AssertionError("k-th cell not found")
    raise ValueError(
        f"not converged after {max_rounds} rounds (range [{lo}, {hi}]) — "
        f"raise max_rounds or buckets")


def exact_quantiles(df: DataFrame, value_col: str, qs: list[float],
                    buckets: int = 4096,
                    max_rounds: int = 12) -> DataFrame:
    """(q, k, value) — exact discrete quantiles of ``value_col`` (the
    value at sorted index floor(q·(n−1))), one bounded selection per q.
    The result is assembled from driver scalars (metadata scale), like
    the resolution medians."""
    spark = df.sparkSession
    src = df.select(F.col(value_col).cast("double").alias("v")) \
            .where(F.col("v").isNotNull())
    # one narrow cache-shaped checkpoint: every selection re-scans the
    # single projected column instead of the caller's full plan
    src = src.localCheckpoint(eager=True)
    n = src.count()
    rows = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        k = int(math.floor(q * (n - 1)))
        v = exact_order_stat(src, "v", k, buckets, max_rounds)
        rows.append((float(q), k, float(v)))
    return spark.createDataFrame(rows, "q double, k long, value double")
