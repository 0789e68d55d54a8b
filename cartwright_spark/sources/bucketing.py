"""Bucketed (pre-shuffled) table layout for co-located joins.

At 100 TB the dominant cost of a repeated equi-join (pages ⋈ detections
on url, cells self-joins on cell) is re-shuffling both sides every run.
Hash-bucketing both tables on the join key AT WRITE TIME pre-pays that
shuffle once: Spark's bucketed scan exposes the hash distribution to
Catalyst, and a join of two tables bucketed on the same key with the
same bucket count needs NO Exchange on either side (and with sorted
buckets, no Sort either) — the sort-merge join streams bucket-to-bucket.

Local notes: bucket metadata lives in the session catalog
(``saveAsTable``), not in the parquet files, so cross-session reads need
a persistent metastore — on a real deployment that's the Hive metastore
or an Iceberg bucket partition transform (this module is the API shape
+ the plan proof). Bucket count is chosen like shuffle partitions at
scale: ~2x total executor cores, sized so a bucket fits in executor
memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   path: str | None = None, sort: bool = True) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-key/same-count bucketed tables — shuffle-free by
    construction (asserted in tests/test_plan_quality.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
