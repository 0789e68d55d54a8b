"""Source-parallelism guard for heavy batch stages.

Narrow stages inherit the SOURCE partitioning, and a single-file parquet
table (one row group — unsplittable by maxPartitionBytes) runs any
downstream Arrow/mapInPandas kernel in ONE task no matter how many cores
the cluster has. Measured on the exact-cosine operator: 20k vectors on a
1-partition source = 26-42 s on local[32]; fanned out = 1.4 s. At 100 TB
the same hazard appears as "a few giant files from an upstream export".

``fan_out`` is a no-op when the source is already parallel enough, so it
is safe to put in front of every expensive batch kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to the core budget iff it is under-partitioned.

    The round-robin shuffle moves each row once — always cheaper than
    serializing an O(n·d) or O(n²) kernel onto one core. Callers that
    know a better key (e.g. a later groupBy key) should repartition on
    that instead; this is the generic guard."""
    sc = df.sparkSession.sparkContext
    want = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)
