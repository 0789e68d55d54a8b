"""Distributed order-statistics primitives — global ranks WITHOUT a
single-partition window.

A window over an un-partitioned ORDER BY is the classic Spark scale
trap: the whole corpus serializes through one task. The primitive here
is the textbook two-pass distributed scan instead:

  1. repartitionByRange(order cols) makes every partition a contiguous
     slice of the global order (ties may straddle a boundary);
  2. a metadata pass collects per-partition (count, distinct count,
     first key, last key) — one row per partition;
  3. the driver turns those into exact per-partition rank offsets,
     merging rank ids across boundaries where last_key(p) ==
     first_key(p+1) (dense ranks must not double-count a key split by
     the range partitioner);
  4. mapInPandas assigns final ranks partition-locally — NO second
     corpus shuffle (the range exchange, paid once behind an eager
     localCheckpoint, is the only data movement).

Used by the suffix-array prefix-doubling rounds (operators/suffix.py);
the same pattern, fused with its aggregation, powers
operators/inequality.py gini_concentration.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_dense_rank(df: DataFrame, order_cols: list[str],
                      rank_col: str = "rank") -> DataFrame:
    """Adds ``rank_col``: the 1-based DENSE rank of the row's
    ``order_cols`` tuple in the global ascending order. Equal tuples
    get equal ranks; ranks are contiguous. Deterministic, partition
    count independent. Order columns must be non-null (countDistinct
    skips nulls; encode absence as a sentinel below the domain)."""
    ranged = (df.repartitionByRange(*order_cols)
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=True))

    key = F.struct(*[F.col(c) for c in order_cols])
    totals = (ranged.groupBy("__pid")
              .agg(F.count("*").alias("cnt"),
                   F.countDistinct(*order_cols).alias("nd"),
                   F.min(key).alias("first_key"),
                   F.max(key).alias("last_key"))
              .collect())

    offsets: dict[int, int] = {}
    running = 0
    prev_last = None
    for row in sorted(totals, key=lambda r: r["__pid"]):
        merge = prev_last is not None and row.first_key == prev_last
        # first local group reuses the previous partition's last rank
        offsets[row["__pid"]] = running - 1 if merge else running
        running += row.nd - (1 if merge else 0)
        prev_last = row.last_key

    out_cols = df.columns

    def _assign(batches):
        pdfs = [b for b in batches]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        pid = int(pdf["__pid"].iloc[0])
        pdf = pdf.sort_values(order_cols, kind="mergesort",
                              ignore_index=True)
        grp = (pdf[order_cols].ne(pdf[order_cols].shift())
               .any(axis=1).cumsum())
        pdf[rank_col] = grp.astype("int64") + offsets[pid]
        yield pdf[out_cols + [rank_col]]

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields) + f", {rank_col} bigint"
    return ranged.mapInPandas(_assign, schema=schema)
