"""Colocation mining: category-pair spatial association (lift) over
grid cells.

Reference scope note: cartwright has no co-occurrence layer (its geo
work stops at per-column classification); this is engine scope from
the brief's geospatial tier — the participation/lift core of spatial
colocation pattern mining (Shekhar & Huang, SSTD 2001) over the same
cell rollups the tiling layer produces: "do categories A and B occur
in the same places more often than independence predicts?"

Statistic, over the set of OCCUPIED cells (cells with >= 1 point):

    lift(a, b) = (N_ab * N_cells) / (N_a * N_b)

with N_a = cells containing a, N_ab = cells containing both, N_cells =
all occupied cells. Every input is an EXACT BIGINT count; lift is one
deterministic double division — engine-exact.

Scale shape (the 100 TB audit):
  1. points -> distinct (cell, category): one partial-agg'd shuffle,
     output bounded by grid x |categories|.
  2. pair join on the CELL key over that bounded table: fan-out
     C(|categories present|, 2) per cell — bounded, never the corpus.
  3. per-category totals and the occupied-cell count are grid-bounded
     aggregates broadcast back onto the pair rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lift_sql() -> str:
    """lift over exact BIGINT columns n_both / n_a / n_b / n_cells —
    one generator, two engines."""
    return ("(CAST(n_both AS DOUBLE) * CAST(n_cells AS DOUBLE))"
            " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))")


def colocation_lift(points: DataFrame, cat_col: str = "category",
                    lat_col: str = "lat", lon_col: str = "lon",
                    cell_deg: float = 5.0) -> DataFrame:
    """-> (cat_a, cat_b, n_both, n_a, n_b, n_cells, lift) for every
    unordered category pair that shares at least one cell."""
    r = F.floor((F.col(lat_col) + F.lit(90.0)) / F.lit(float(cell_deg)))
    c = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(float(cell_deg)))
    cellcat = (points
               .select(r.cast("bigint").alias("cell_row"),
                       c.cast("bigint").alias("cell_col"),
                       F.col(cat_col).alias("cat"))
               .distinct())
    a = cellcat.select("cell_row", "cell_col", F.col("cat").alias("cat_a"))
    b = cellcat.select("cell_row", "cell_col", F.col("cat").alias("cat_b"))
    both = (a.join(b, ["cell_row", "cell_col"])
            .where(F.col("cat_a") < F.col("cat_b"))
            .groupBy("cat_a", "cat_b")
            .agg(F.count(F.lit(1)).alias("n_both")))
    per_cat = cellcat.groupBy("cat").agg(F.count(F.lit(1)).alias("n"))
    total = (cellcat.select("cell_row", "cell_col").distinct()
             .agg(F.count(F.lit(1)).alias("n_cells")))
    return (both
            .join(F.broadcast(per_cat.select(F.col("cat").alias("cat_a"),
                                             F.col("n").alias("n_a"))),
                  "cat_a")
            .join(F.broadcast(per_cat.select(F.col("cat").alias("cat_b"),
                                             F.col("n").alias("n_b"))),
                  "cat_b")
            .crossJoin(F.broadcast(total))
            .select("cat_a", "cat_b", "n_both", "n_a", "n_b", "n_cells",
                    F.expr(lift_sql()).alias("lift")))


def knox_sql() -> str:
    """Knox space-time interaction ratio over exact BIGINT pair counts
    x_pairs / s_pairs / t_pairs / p_pairs — one generator, two engines:

        knox = x_pairs / (s_pairs * t_pairs / p_pairs)

    NULL when either marginal has no close pairs."""
    return ("(CAST(x_pairs AS DOUBLE) * CAST(p_pairs AS DOUBLE))"
            " / nullif(CAST(s_pairs AS DOUBLE) * CAST(t_pairs AS DOUBLE),"
            " CAST(0 AS DOUBLE))")


def knox_statistic(points: DataFrame, lat_col: str = "lat",
                   lon_col: str = "lon", ts_col: str = "ts",
                   cell_deg: float = 5.0,
                   bin_us: int = 86_400_000_000) -> DataFrame:
    """Knox test for space-time clustering (Knox 1964): do events that
    happen in the same PLACE (grid cell) also happen at the same TIME
    (day bin) more often than the marginals predict?

    X = pairs sharing (cell, bin); S = pairs sharing cell; T = pairs
    sharing bin; P = all pairs. Each is an EXACT BIGINT sum of
    c*(c-1) DIV 2 over a rollup — and S, T, n all DERIVE from the one
    (cell, bin) corpus rollup, so the corpus is shuffled exactly once;
    everything downstream is grid x span bounded. -> one row
    (n, p_pairs, x_pairs, s_pairs, t_pairs, knox_ratio)."""
    from .trend import cell_time_counts
    cm = cell_time_counts(points, lat_col, lon_col, ts_col, cell_deg,
                          bin_us)

    def pairs(col):
        return F.sum(F.expr(f"{col} * ({col} - 1) DIV 2")).cast("bigint")

    x = cm.agg(pairs("x").alias("x_pairs"),
               F.sum("x").cast("bigint").alias("n"))
    s = (cm.groupBy("cell_row", "cell_col")
         .agg(F.sum("x").alias("c"))
         .agg(pairs("c").alias("s_pairs")))
    t = (cm.groupBy("mbin").agg(F.sum("x").alias("c"))
         .agg(pairs("c").alias("t_pairs")))
    row = (x.crossJoin(F.broadcast(s)).crossJoin(F.broadcast(t))
           .withColumn("p_pairs",
                       F.expr("n * (n - 1) DIV 2").cast("bigint")))
    return row.select("n", "p_pairs", "x_pairs", "s_pairs", "t_pairs",
                      F.expr(knox_sql()).alias("knox_ratio"))
