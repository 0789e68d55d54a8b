"""Canonical-representative selection for duplicate clusters, and SCD2
(slowly-changing-dimension, type 2) validity-interval derivation — the
two bookkeeping operators a crawl corpus needs between dedup and
training: "which copy do we keep" and "what did this entity look like
at time t".

canonical_pick: per duplicate cluster (exact content key, or a dedup
assign label from operators/dedup.py), choose the keeper by an ordered
preference tuple. The pick is a single ``min(struct(prefs..., id))``
algebraic aggregate — partial aggregation map-side, ONE shuffle on the
cluster key, no per-group sort and no window. At 100 TB that is the
difference between a combiner-friendly agg and a row_number() that
materializes and sorts every cluster (the oracle uses row_number, the
engine must not).

scd2_merge: collapse a change log (entity, ts, value) into SCD2 rows
(entity, value, valid_from, valid_to, is_current): consecutive repeats
of the same value merge, valid_to is the next change's valid_from
(NULL while current). Two window functions over ONE exchange — lag to
find change points, lead over the surviving rows for interval ends;
both windows share (partition, order) so Catalyst plans a single
sort+exchange for the first and a re-sort-free second pass.

Reference scope note: jataware/cartwright keeps no corpus lineage —
engine scope (the iceberg_lite snapshot layer stores these outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonical_pick(df: DataFrame, key_col: str, id_col: str,
                   pref_cols: list) -> DataFrame:
    """One row per ``key_col`` cluster: the member minimizing the
    (pref_cols..., id_col) tuple ascending (negate a column to prefer
    descending), plus the exact member count."""
    if not pref_cols:
        raise ValueError("pref_cols must name at least one column")
    best = F.struct(*[F.col(c) for c in pref_cols],
                    F.col(id_col).alias("__cid"))
    return (df.groupBy(key_col)
            .agg(F.min(best).alias("__best"),
                 F.count(F.lit(1)).alias("n_members"))
            .select(key_col,
                    F.col("__best.__cid").alias("canonical_id"),
                    "n_members"))


def scd2_merge(df: DataFrame, entity_col: str, ts_col: str,
               value_col: str, order_cols: list | None = None
               ) -> DataFrame:
    """Change log -> SCD2 intervals. ``order_cols`` is the total order
    within an entity (defaults to [ts_col]; pass a tiebreaker when
    timestamps can collide)."""
    order_cols = list(order_cols or [ts_col])
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    changed = (df
               .withColumn("__prev", F.lag(value_col).over(w))
               .where(F.col("__prev").isNull()
                      | (F.col("__prev") != F.col(value_col)))
               .drop("__prev"))
    w2 = Window.partitionBy(entity_col).orderBy(*order_cols)
    return (changed
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(ts_col).over(w2))
            .withColumn("is_current",
                        F.col("valid_to").isNull().cast("int"))
            .select(entity_col, value_col, "valid_from", "valid_to",
                    "is_current"))
