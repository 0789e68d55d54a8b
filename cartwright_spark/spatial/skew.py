"""Hot-cell skew handling (SURVEY.md §2.3 J9, §4(2)).

Dense urban cells concentrate a large share of rows on a single shuffle
key. Two mitigations, composable:

* ``salted_aggregate`` — two-stage combine: groupBy(cell, salt) partial →
  groupBy(cell) final, with salt fan-out proportional to measured per-cell
  counts (hot cells split across `fanout` reducers; cold cells salt=0, no
  extra shuffle width).
* ``salted_repartition`` — spread hot-cell rows across partitions for
  downstream per-partition work while keeping cold cells co-located.

The hot-cell map comes from a cheap count pre-pass (optionally sampled) and
is broadcast — deterministic, resume-safe (salts derive from row hashes,
never from random()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_cell_map(df: DataFrame, cell_col: str = "cell",
                 hot_threshold: int = 100_000,
                 max_fanout: int = 64,
                 sample_fraction: float | None = None) -> DataFrame:
    """(cell, fanout) for cells whose row count exceeds the threshold;
    fanout ≈ count/threshold capped at max_fanout. Tiny result → broadcast."""
    src = df if sample_fraction is None else df.sample(sample_fraction, seed=42)
    scale = 1.0 if sample_fraction is None else 1.0 / sample_fraction
    counts = src.groupBy(cell_col).agg((F.count("*") * scale).alias("est"))
    return (counts.where(F.col("est") > hot_threshold)
            .select(F.col(cell_col).alias("__hot_cell"),
                    F.least(F.ceil(F.col("est") / hot_threshold),
                            F.lit(max_fanout)).cast("int").alias("fanout")))


def with_salt(df: DataFrame, cell_col: str, hot: DataFrame,
              salt_from: str | None = None) -> DataFrame:
    """Add a deterministic `salt` column: 0 for cold cells; hash-derived in
    [0, fanout) for hot cells. `salt_from` names a column whose hash drives
    the salt (defaults to all columns via monotonically increasing id-free
    xxhash of the cell + a row fingerprint)."""
    j = df.join(F.broadcast(hot), df[cell_col] == hot["__hot_cell"], "left")
    basis = F.col(salt_from) if salt_from else F.concat_ws(
        "\x00", *[F.col(c).cast("string") for c in df.columns])
    salt = F.when(F.col("fanout").isNotNull(),
                  F.pmod(F.xxhash64(basis), F.col("fanout"))).otherwise(F.lit(0))
    return j.withColumn("salt", salt.cast("int")).drop("__hot_cell", "fanout")


def salted_aggregate(df: DataFrame, cell_col: str,
                     aggs: list[tuple[str, object, str]],
                     hot_threshold: int = 100_000,
                     salt_from: str | None = None) -> DataFrame:
    """groupBy(cell) with hot keys split across reducers.

    `aggs`: (name, partial_expr, merge) triples where merge ∈
    {"sum", "min", "max"} recombines the per-salt partials — the agg must be
    reassociable (count merges with "sum").

        salted_aggregate(df, "cell",
                         [("n", F.count("*"), "sum"),
                          ("max_v", F.max("v"), "max")])
    """
    hot = hot_cell_map(df, cell_col, hot_threshold)
    salted = with_salt(df, cell_col, hot, salt_from=salt_from)
    partial = salted.groupBy(cell_col, "salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr, _ in aggs])
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    finals = [merge_fns[m](F.col(f"__p_{name}")).alias(name)
              for name, _, m in aggs]
    return partial.groupBy(cell_col).agg(*finals)


def salted_counts(df: DataFrame, cell_col: str,
                  hot_threshold: int = 100_000) -> DataFrame:
    """The common case: exact per-cell row counts, skew-safe."""
    return salted_aggregate(df, cell_col,
                            [("n_points", F.count("*"), "sum")],
                            hot_threshold=hot_threshold)


def salted_repartition(df: DataFrame, cell_col: str,
                       hot_threshold: int = 100_000,
                       num_partitions: int | None = None,
                       salt_from: str | None = None) -> DataFrame:
    hot = hot_cell_map(df, cell_col, hot_threshold)
    salted = with_salt(df, cell_col, hot, salt_from=salt_from)
    if num_partitions:
        return salted.repartition(num_partitions, F.col(cell_col), F.col("salt"))
    return salted.repartition(F.col(cell_col), F.col("salt"))
