"""Grouped least-squares trend fit, exact integer moments.

The corpus-monitoring companion to spatial/trend.py's Theil-Sen (robust
median slope) and operators/changepoint.py's CUSUM (level shifts): OLS
gives the variance-decomposed view — slope, intercept AND R^2, i.e.
"how much of this metric's movement is actually a linear trend" — the
statistic dashboards threshold on before alerting on a drift.

Everything reduces to the five classical sums over integer (x, y):

    slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
    intercept = (Sy - slope*Sx) / n
    R^2       = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)(n*Syy - Sy^2))

The sums are exact BIGINTs (ANSI mode would fault an overflow loudly;
a raise_error guard on n^2 * max|x|^2 * max|y|^2-scale products keeps
the covariance arithmetic int64-exact — the ACF/assortativity posture);
slope/intercept/R^2 are single float expressions over those exact
integers, shared verbatim with the oracle. No float accumulation
anywhere.

Scale shape (the 100 TB audit): ONE algebraic groupBy — map-side
partials absorb hot groups; output is |groups| rows. No windows, no
joins, no iteration, whole-stage codegen end to end.

Reference scope note: jataware/cartwright fits nothing; engine scope
for the corpus-monitoring axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_I64_GUARD = float(2 ** 62)


def ols_trend(df: DataFrame, group_col: str = "grp",
              x_col: str = "x", y_col: str = "y") -> DataFrame:
    """-> (grp, n, sx, sy, sxy, sxx, syy, slope, intercept, r2) per
    group. x and y must be integer-valued (quantize upstream — the
    exactness contract). Groups with zero x-variance emit NULL fit
    columns (vertical data has no OLS line); r2 is NULL when y has
    zero variance."""
    mom = (df.select(F.col(group_col).alias("grp"),
                     F.col(x_col).cast("bigint").alias("x"),
                     F.col(y_col).cast("bigint").alias("y"))
           .groupBy("grp")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"),
                F.max(F.abs(F.col("x"))).alias("__mx"),
                F.max(F.abs(F.col("y"))).alias("__my")))
    # binding products: n*Sxx <= n^2*mx^2, Sx*Sy <= n^2*mx*my — guard
    # the larger of the two shapes in double math (threshold check only)
    mxy = F.greatest(F.greatest("__mx", "__my"), F.lit(1)).cast("double")
    bound = F.col("n").cast("double") * F.col("n") * mxy * mxy
    g = mom.withColumn(
        "n",
        F.when(bound < F.lit(_I64_GUARD), F.col("n"))
        .otherwise(F.raise_error(F.lit(
            "ols_trend: n^2 * max(|x|,|y|)^2 exceeds the int64-exact "
            "bound — recentre/rescale x or y"))))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(dx > 0, num.cast("double") / dx.cast("double"))
    return g.select(
        "grp", "n", "sx", "sy", "sxy", "sxx", "syy",
        slope.alias("slope"),
        F.when(dx > 0,
               (F.col("sy").cast("double")
                - (num.cast("double") / dx.cast("double"))
                * F.col("sx")) / F.col("n")).alias("intercept"),
        F.when((dx > 0) & (dy > 0),
               num.cast("double") * num.cast("double")
               / (dx.cast("double") * dy.cast("double"))).alias("r2"))
