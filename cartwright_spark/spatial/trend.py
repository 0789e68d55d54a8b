"""Emerging-hotspot trend: Mann-Kendall statistic over per-cell
time-binned activity counts (the space-time-cube primitive).

Reference scope note: cartwright has no spatio-temporal layer (its
temporal work is per-column resolution classification); this is engine
scope from the brief's geospatial tier — "is this cell's activity
rising or falling?" over the same grid rollups the tiling layer
produces (Mann 1945 / Kendall 1975; the trend half of ESRI's emerging
hot spot analysis).

Statistic, per cell over its T binned counts x_1..x_T (bins with no
activity in the cell are absent, the standard practical choice —
documented, and mirrored exactly by the oracle; `bin_us` sets the bin
width, default one day):

    S        = sum over bin pairs i<j of sign(x_j - x_i)
    tie_term = sum over tied-value groups of t(t-1)(2t+5)
    var(S)   = (T(T-1)(2T+5) - tie_term) / 18
    z        = (S-1)/sqrt(var)  if S > 0
               (S+1)/sqrt(var)  if S < 0
               0                otherwise        (NULL when var = 0)

S, T and tie_term are EXACT BIGINT aggregates; z is one deterministic
double expression over them, emitted from ONE generator (`mk_z_sql`)
into both the Spark plan and the DuckDB oracle.

Scale shape (the 100 TB audit):
  1. events -> (cell, bin) counts: one partial-agg'd shuffle whose
     output is bounded by grid x time-span, never the corpus.
  2. bin-pair self-join on the CELL key: fan-out T(T-1)/2 per cell
     with T bounded by the time span, over the grid-bounded rollup —
     a bounded explode, not a corpus join.
  3. tie groups: a second grid-bounded agg on (cell, x).
No driver paths; nothing proportional to the corpus after step 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mk_z_sql() -> str:
    """Mann-Kendall z over exact BIGINT columns s_stat / n_bins /
    tie_term — one generator, two engines. NULL when var(S) <= 0
    (fewer than 2 bins, or all counts tied)."""
    var = ("(CAST(n_bins * (n_bins - 1) * (2 * n_bins + 5)"
           " - tie_term AS DOUBLE) / CAST(18.0 AS DOUBLE))")
    sd = f"sqrt(nullif({var}, CAST(0 AS DOUBLE)))"
    return (f"CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / {sd}"
            f" WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / {sd}"
            f" ELSE CAST(0 AS DOUBLE) * {sd} END")


def cell_time_counts(points: DataFrame, lat_col: str = "lat",
                     lon_col: str = "lon", ts_col: str = "ts",
                     cell_deg: float = 5.0,
                     bin_us: int = 86_400_000_000) -> DataFrame:
    """points -> (cell_row, cell_col, mbin, x): grid x time-bin rollup,
    mbin = unix_micros DIV bin_us (integer division — exact, and equal
    to DuckDB's // on the positive timestamps both engines see)."""
    r = F.floor((F.col(lat_col) + F.lit(90.0)) / F.lit(float(cell_deg)))
    c = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(float(cell_deg)))
    mbin = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
                  f" DIV {int(bin_us)}")
    return (points
            .select(r.cast("bigint").alias("cell_row"),
                    c.cast("bigint").alias("cell_col"),
                    mbin.alias("mbin"))
            .groupBy("cell_row", "cell_col", "mbin")
            .agg(F.count(F.lit(1)).alias("x")))


def mann_kendall_trend(points: DataFrame, lat_col: str = "lat",
                       lon_col: str = "lon", ts_col: str = "ts",
                       cell_deg: float = 5.0,
                       bin_us: int = 86_400_000_000) -> DataFrame:
    """-> (cell_row, cell_col, n_bins, s_stat, tie_term, mk_z)."""
    cm = cell_time_counts(points, lat_col, lon_col, ts_col, cell_deg,
                          bin_us)
    a = cm.select("cell_row", "cell_col",
                  F.col("mbin").alias("m1"), F.col("x").alias("x1"))
    b = cm.select("cell_row", "cell_col",
                  F.col("mbin").alias("m2"), F.col("x").alias("x2"))
    s = (a.join(b, ["cell_row", "cell_col"])
         .where(F.col("m1") < F.col("m2"))
         .groupBy("cell_row", "cell_col")
         .agg(F.sum(F.signum(F.col("x2") - F.col("x1")).cast("bigint"))
              .alias("s_stat")))
    ties = (cm.groupBy("cell_row", "cell_col", "x")
            .agg(F.count(F.lit(1)).alias("t"))
            .groupBy("cell_row", "cell_col")
            .agg(F.sum(F.col("t") * (F.col("t") - 1)
                       * (2 * F.col("t") + 5)).alias("tie_term"),
                 F.sum("t").alias("n_bins")))
    per_cell = (ties.join(s, ["cell_row", "cell_col"], "left")
                .select("cell_row", "cell_col", "n_bins",
                        F.coalesce("s_stat", F.lit(0)).cast("bigint")
                        .alias("s_stat"),
                        F.col("tie_term").cast("bigint").alias("tie_term")))
    return per_cell.select("cell_row", "cell_col", "n_bins", "s_stat",
                           "tie_term", F.expr(mk_z_sql()).alias("mk_z"))


def theil_sen_slope(points: DataFrame, lat_col: str = "lat",
                    lon_col: str = "lon", ts_col: str = "ts",
                    cell_deg: float = 5.0,
                    bin_us: int = 86_400_000_000) -> DataFrame:
    """Theil-Sen trend slope per cell: the median of pairwise slopes
    (x_j - x_i) / (m_j - m_i) over the cell's time-binned counts — the
    magnitude companion to `mann_kendall_trend`'s significance (Theil
    1950 / Sen 1968), robust to a 29% outlier fraction.

    Exactness contract: each slope is ONE IEEE division of exact
    BIGINTs (bit-identical in any engine), and the median is the LOWER
    order statistic at rank (n+1) DIV 2 — a selected VALUE, not an
    interpolation, so engines cannot disagree at even counts the way
    a + (b-a)*0.5 vs (a+b)/2 float formulas can.

    Scale shape: same as mann_kendall_trend — the corpus is touched by
    one grid-bounded rollup; the pair table is a bounded bin-pair
    self-join on the CELL key; the rank window partitions by cell over
    that bounded table. -> (cell_row, cell_col, n_pairs, sen_slope)."""
    from pyspark.sql import Window
    cm = cell_time_counts(points, lat_col, lon_col, ts_col, cell_deg,
                          bin_us)
    a = cm.select("cell_row", "cell_col",
                  F.col("mbin").alias("m1"), F.col("x").alias("x1"))
    b = cm.select("cell_row", "cell_col",
                  F.col("mbin").alias("m2"), F.col("x").alias("x2"))
    pairs = (a.join(b, ["cell_row", "cell_col"])
             .where(F.col("m1") < F.col("m2"))
             .select("cell_row", "cell_col",
                     ((F.col("x2") - F.col("x1")).cast("double")
                      / (F.col("m2") - F.col("m1")).cast("double"))
                     .alias("slope")))
    w = Window.partitionBy("cell_row", "cell_col").orderBy("slope")
    ranked = pairs.select(
        "cell_row", "cell_col", "slope",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(
            Window.partitionBy("cell_row", "cell_col")).alias("n_pairs"))
    return (ranked
            .where(F.expr("rk = (n_pairs + 1) DIV 2"))
            .select("cell_row", "cell_col", "n_pairs",
                    F.col("slope").alias("sen_slope")))
