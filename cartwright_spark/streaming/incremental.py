"""Incremental micro-batch processing over Iceberg-lite tables.

``incremental_stage`` reads only the source files that appeared after the
last increment it committed (file-level change detection from snapshot
manifests — the same trick Iceberg's incremental scan uses), applies the
transform, and appends a new snapshot of the derived table. Re-running with
no new source data is a no-op; re-running after a crash re-processes only
uncommitted increments (the snapshot commit is the atomic point), so the
pipeline is exactly-once at file granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cartwright_spark.sources.iceberg_lite import Catalog


def _processed_files(catalog: Catalog, out_table: str) -> set[str]:
    done: set[str] = set()
    for snap in catalog.snapshots(out_table):
        done.update(snap.get("metrics", {}).get("source_files", []))
    return done


def incremental_stage(spark: SparkSession, catalog: Catalog,
                      src_table: str, out_table: str,
                      transform, stage: str = "incremental") -> dict | None:
    """Process source files not yet consumed by `out_table`.

    transform: DataFrame -> DataFrame. Returns the committed snapshot
    manifest, or None when there is nothing new.
    """
    src_snap = catalog.latest_snapshot(src_table)
    if src_snap is None:
        return None
    all_files = [f["path"] for f in src_snap["files"]]
    done = _processed_files(catalog, out_table)
    new_files = [f for f in all_files if f not in done]
    if not new_files:
        return None
    paths = [os.path.join(catalog.root, f) for f in new_files]
    df: DataFrame = spark.read.parquet(*paths)
    out = transform(df)
    snap = catalog.write_table(
        out, out_table, stage=stage,
        stage_key=f"{stage}:{src_snap['snapshot_id']}:{len(done)}",
        parent=src_snap,
        metrics={"source_files": new_files,
                 "source_snapshot": src_snap["snapshot_id"]})
    return snap
