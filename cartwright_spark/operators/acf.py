"""Autocorrelation function (ACF) per series, exact integer moments.

Corpus-health monitoring (operators/drift.py PSI, changepoint.py CUSUM,
burst.py Kleinberg bursts) watches LEVEL shifts; the ACF is the
periodicity/memory probe — "does this event stream echo itself at lag
k?" — the standard first look before seasonality-aware sampling or
dedup of machine-generated (cron-shaped) traffic.

For each series g and lag k in 1..max_lag, over the totally-ordered
(ts, id) sequence x_1..x_n:

    r_k = sum_{t<=n-k} (x_t - xbar)(x_{t+k} - xbar) / sum_t (x_t - xbar)^2

with xbar the FULL-series mean (the standard biased-denominator ACF —
Box & Jenkins). Everything reduces to exact BIGINT moments via the
expansion sum (x_t - m)(x_{t+k} - m) = S_xy - m*(S_x + S_y) + c_k*m^2
with m = S/n kept RATIONAL (multiply through by n^2):

    num_k * 1 = n^2*S_xy - n*S*(S_x + S_y) + c_k*S^2
    den   * 1 = n^2*Q    - n*S*2*S        + n*S^2     (= n^2 * sum dev^2)

so r_k = num_k / den is ONE float division of two exact integers — no
float accumulation, no cross-engine sum-ordering anywhere (the Geary's
C / Moran's I discipline from spatial/autocorr.py applied to time).

Int64 audit: |x| <= X, series length n. S_xy <= n*X^2, n*S*(S_x+S_y) <=
2*n^2*X * n*X = 2*n^3*X^2-ish — the binding term is n^2 * n*X^2 = n^3*X^2,
guarded via n^3*mx^2 < 2^60 with raise_error (|num| <= 4*n^3*mx^2) (same posture as hull/raster coord
guards): callers with bigger series rescale x or window the series.

Scale shape (the 100 TB audit):
  1. ONE series-key shuffle, shared by every lag: the lead(k) columns
     for k = 1..max_lag all ride the same (grp x (ts, id)) sort — one
     window exchange, max_lag projections.
  2. The per-(grp, lag) rollup is algebraic (map-side partials); output
     is |groups| * max_lag rows — metadata-sized.
  3. All expressions are whole-stage codegen; the only Python is plan
     construction.

Reference scope note: jataware/cartwright profiles temporal COLUMNS
(resolution detection); it has no sequence-statistics layer. Engine
scope for the corpus-monitoring axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# |num| <= 4 * n^3 * max|x|^2 (term-by-term triangle bound), so exactness
# needs n^3 * mx^2 < 2^60; every intermediate product then stays < 2^62.
_I64_GUARD = 2 ** 60


def acf(df: DataFrame, max_lag: int = 5, group_col: str = "grp",
        ts_col: str = "ts", id_col: str = "id",
        value_col: str = "x") -> DataFrame:
    """-> (grp, lag, n, c_pairs, num, den, r): ACF at lags 1..max_lag
    per group. ``x`` must be integer-valued (exactness contract — cast
    or quantize upstream); ``r = num/den`` is the textbook ACF. Groups
    with zero variance (den = 0) are dropped; lags >= n emit nothing
    (c_pairs = 0 rows are pruned)."""
    if max_lag < 1:
        raise ValueError("acf: max_lag must be >= 1")
    w = (Window.partitionBy("g")
         .orderBy(F.col("t").asc(), F.col("i").asc()))
    base = df.select(F.col(group_col).alias("g"),
                     F.col(ts_col).alias("t"),
                     F.col(id_col).alias("i"),
                     F.col(value_col).cast("bigint").alias("x"))
    leads = base.select(
        "g", "x",
        *[F.lead("x", k).over(w).alias(f"x{k}")
          for k in range(1, max_lag + 1)])

    # per-group base moments + per-lag pair moments, one algebraic agg
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("q"),
            F.max(F.abs(F.col("x"))).alias("mx")]
    for k in range(1, max_lag + 1):
        xk = F.col(f"x{k}")
        aggs += [
            F.count(xk).alias(f"c{k}"),
            F.sum(F.when(xk.isNotNull(), F.col("x"))).alias(f"sa{k}"),
            F.sum(F.when(xk.isNotNull(), xk)).alias(f"sb{k}"),
            F.sum(F.col("x") * xk).alias(f"sxy{k}"),
        ]
    mom = leads.groupBy("g").agg(*aggs)

    # int64 guard wraps n ITSELF (the hull.py _COORD_LIMIT pattern) so a
    # column the output depends on carries the raise_error — a detached
    # flag column would be pruned unevaluated by the optimizer. Note
    # n^3 * mx^2 here is double math (exactness is irrelevant for a
    # threshold check; 2^60 is far below where doubles lose integers'
    # ORDER of magnitude).
    bound = (F.col("n").cast("double") * F.col("n") * F.col("n")
             * F.greatest(F.col("mx"), F.lit(1))
             * F.greatest(F.col("mx"), F.lit(1)))
    mom = mom.withColumn(
        "n",
        F.when(bound < F.lit(float(_I64_GUARD)), F.col("n"))
        .otherwise(F.raise_error(F.lit(
            "acf: n^3 * max|x|^2 exceeds the int64-exact bound — "
            "rescale x or shorten the series"))))

    lag_rows = []
    for k in range(1, max_lag + 1):
        n, s, q = F.col("n"), F.col("s"), F.col("q")
        ck, sa, sb, sxy = (F.col(f"c{k}"), F.col(f"sa{k}"),
                           F.col(f"sb{k}"), F.col(f"sxy{k}"))
        num = (n * n * sxy - n * s * (sa + sb) + ck * s * s)
        den = (n * n * q - n * s * s)
        lag_rows.append(
            mom.where(F.col(f"c{k}") > 0)
            .select(F.col("g").alias("grp"),
                    F.lit(k).cast("int").alias("lag"),
                    n.alias("n"),
                    ck.alias("c_pairs"),
                    num.cast("bigint").alias("num"),
                    den.cast("bigint").alias("den")))
    out = lag_rows[0]
    for r in lag_rows[1:]:
        out = out.unionByName(r)
    return (out.where(F.col("den") > 0)
            .withColumn("r", F.col("num").cast("double")
                        / F.col("den").cast("double")))
