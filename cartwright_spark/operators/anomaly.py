"""Rolling-window anomaly detection over per-series event streams —
the streaming-health companion to CUSUM (operators/changepoint.py) and
PSI drift (operators/drift.py): flag points whose deviation from the
TRAILING window's mean exceeds ``tau`` standard deviations, computed
EXACTLY in integer arithmetic.

The z-test is rearranged so no division or sqrt ever happens:

    z^2 > tau^2   <=>   (n*y - S)^2 > tau^2 * (n*Q - S^2)

with n/S/Q = count/sum/sum-of-squares of the previous ``window`` points
— all BIGINT, so engine and oracle agree bit-for-bit and the
zero-variance window degenerates correctly (any deviation flags).

Scale shape: ONE exchange on the series key, then a bounded ROWS
window per series — linear work, no self-join, no driver state. Skew
is bounded by per-series row count, not window width; a hot series is
still a single sorted partition scan (the asof/temporal_join salting
notes apply if one series dominates the corpus).

Overflow: |n*y - S| <= 2 * window * max|y|, so int64 is safe whenever
window * max|y| < 1.5e9 — callers quantize y (the contract query uses
y in [0, 100)); the constructor enforces sane window/tau bounds.

Reference scope note: jataware/cartwright has no streaming layer —
engine scope for the corpus-health tier (README "monitoring").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_anomaly(df: DataFrame, series_col: str, order_cols: list,
                    y_col: str, window: int = 8, min_points: int = 4,
                    tau: int = 3) -> DataFrame:
    """Flag rows where (n*y - S)^2 > tau^2 * (n*Q - S^2) over the
    trailing ``window`` rows (current row excluded). Rows with fewer
    than ``min_points`` predecessors are not scored (warm-up).

    ``order_cols`` must be a deterministic total order within a series
    (pass a tiebreaker, e.g. ["ts", "event_id"]).
    """
    if window < 2 or window > 10_000_000:
        raise ValueError("window must be in [2, 1e7]")
    if min_points < 1 or min_points > window:
        raise ValueError("min_points must be in [1, window]")
    if tau < 1:
        raise ValueError("tau must be >= 1")
    y = F.col(y_col).cast("bigint")
    w = (Window.partitionBy(series_col)
         .orderBy(*order_cols)
         .rowsBetween(-window, -1))
    scored = (df
              .withColumn("n_prev", F.count(y).over(w))
              .withColumn("s_prev", F.sum(y).over(w))
              .withColumn("q_prev", F.sum(y * y).over(w)))
    # built from the MATERIALIZED window columns, not the window
    # expressions — re-deriving them after the warm-up filter would
    # silently re-run the window over the filtered rows
    n, s, q = F.col("n_prev"), F.col("s_prev"), F.col("q_prev")
    num = n * y - s
    den = F.lit(int(tau) * int(tau)) * (n * q - s * s)
    return (scored
            .withColumn("is_anomaly", (num * num > den).cast("int"))
            .where(n >= F.lit(int(min_points))))
