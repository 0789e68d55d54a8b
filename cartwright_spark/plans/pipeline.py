"""End-to-end pipeline: pages → extract → detect → encode → tiles.

Each stage commits an Iceberg-lite snapshot (schema + per-file row lineage +
wall-time metrics) and is skipped on resume when a committed snapshot with
the same stage key exists — checkpointed batch resumability per the north
rule. The flagship query answers: "which map tiles / S2 cells contain how
many detected coordinates, per zoom level".

Launched via ``spark-submit --py-files`` through
``cartwright_spark/jobs/pipeline.py``.
"""

from __future__ import annotations

import time

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartwright_spark.functions.geodesy import tile_id_col, tile_x_col, tile_y_col
from cartwright_spark.operators.extract import extract_pages
from cartwright_spark.sources.corpus import generate_pages
from cartwright_spark.sources.iceberg_lite import Catalog
from cartwright_spark.spatial.udfs import s2_cell


#: partition-column granularity for the time axis. Real Common-Crawl
#: snapshots span weeks-to-months, so date(warc_ts) ("day") gives the
#: bounded daily layout the north rule wants; the synthetic corpus
#: spreads warc_ts ~90 days per 100k pages, so "month" reproduces a
#: comparable directory scale at bench sizes. One knob, same machinery.
TIME_PARTITION = {
    "day": lambda: F.to_date("warc_ts").cast("string").alias("warc_part"),
    "month": lambda: F.date_format("warc_ts", "yyyy-MM").alias("warc_part"),
    "year": lambda: F.year("warc_ts").alias("warc_part"),
}


def _stage(catalog: Catalog, table: str, stage_key: str, parent,
           build, metrics_extra=None, force=False, partition_by=None):
    """Run one checkpointed stage: reuse the committed snapshot if present."""
    snap = None if force else catalog.find_snapshot(table, stage_key)
    if snap is not None:
        return snap, True
    t0 = time.perf_counter()
    df = build()
    snap = catalog.write_table(df, table, stage=table, stage_key=stage_key,
                               parent=parent, metrics=metrics_extra or {},
                               partition_by=partition_by)
    # wall time is only known after the commit; amend the manifest so the
    # persisted lineage carries real per-stage latency (north rule)
    snap = catalog.amend_metrics(
        table, snap["snapshot_id"],
        {"stage_wall_sec": time.perf_counter() - t0})
    return snap, False


def run_pipeline(spark: SparkSession, workdir: str, n_pages: int = 2000,
                 s2_level: int = 10, h3_res: int = 6, zoom: int = 8,
                 force: bool = False, time_partition: str = "month") -> dict:
    cat = Catalog(workdir)
    summary: dict = {"stages": {}}
    t_start = time.perf_counter()
    warc_part = TIME_PARTITION[time_partition]

    # 1) pages corpus (Iceberg-style source table), hive-partitioned on
    # the warc timestamp so every later time-bounded scan partition-prunes
    pages_snap, reused = _stage(
        cat, "pages", f"pages:n={n_pages}:tp={time_partition}:v2", None,
        lambda: generate_pages(spark, n_pages).withColumn(
            "warc_part", warc_part()),
        partition_by=["warc_part"])
    summary["stages"]["pages"] = {"rows": pages_snap["row_count"], "reused": reused}

    # 2) extract text (byte-identical per url) — projection pruned to the
    # columns the stage needs so the parquet scan skips `text`; keeps the
    # pages table's time partitioning (partition col rides the select)
    def build_extract():
        pages = cat.load_table(spark, "pages", pages_snap["snapshot_id"])
        return extract_pages(
            pages.select("url", "warc_ts", "html", "lang", "warc_part")) \
            .drop("html")
    ext_snap, reused = _stage(
        cat, "extracted",
        f"extract:v2:tp={time_partition}:parent={pages_snap['snapshot_id']}",
        pages_snap, build_extract, partition_by=["warc_part"])
    summary["stages"]["extracted"] = {"rows": ext_snap["row_count"], "reused": reused}

    # 3) detect entities in extracted text (JVM regex + broadcast joins)
    def build_detect():
        ext = cat.load_table(spark, "extracted", ext_snap["snapshot_id"])
        from cartwright_spark.operators.detect import detect_all
        return detect_all(ext, spark, text_col="extracted_text")
    det_snap, reused = _stage(
        cat, "detections", f"detect:v3:parent={ext_snap['snapshot_id']}",
        ext_snap, build_detect)
    summary["stages"]["detections"] = {"rows": det_snap["row_count"], "reused": reused}

    # 4) encode S2 cell + H3 hex + web-mercator tile for spatial
    # detections (north star: every detected coordinate carries BOTH cell
    # systems — S2 feeds the PIP layer, H3 the k-ring kNN layer). S2 +
    # tiles are the all-JVM staged encode (one codegen stage); H3 is the
    # single Arrow stage in the pipeline, fed only narrow lat/lon doubles
    # (measured flat across parallelism in BENCH finding #1)
    def build_cells():
        from pyspark.sql.functions import pandas_udf

        from cartwright_spark.spatial import h3 as h3mod
        from cartwright_spark.spatial.udfs import with_s2_cell

        @pandas_udf("long")
        def hex_cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
            import numpy as np
            return pd.Series(h3mod.latlng_to_cell(
                lat.to_numpy(np.float64), lon.to_numpy(np.float64), h3_res))

        # project to the columns the tiling layer consumes BEFORE the
        # encode — the detections table carries wide entity strings that
        # would otherwise ride through the scan, encode, and snapshot
        det = cat.load_table(spark, "detections", det_snap["snapshot_id"]) \
            .where(F.col("lat").isNotNull()) \
            .select("url", "kind", "lat", "lon")
        from cartwright_spark.spatial.udfs import s2_parent_col
        return (
            with_s2_cell(det, "lat", "lon", s2_level, "s2_cell")
            .withColumn("hex_cell", hex_cell(F.col("lat"), F.col("lon")))
            .withColumn("tile_x", tile_x_col(F.col("lon"), zoom))
            .withColumn("tile_y", tile_y_col(F.col("lat"), zoom))
            .withColumn("tile_id", tile_id_col(F.col("lat"), F.col("lon"), zoom))
            # coarse spatial partition prefix (level-4 parent, pure bit
            # math on the already-encoded cell): a bbox-bounded read of
            # the cells table prunes to the touched level-4 directories
            .withColumn("s2_l4", s2_parent_col(F.col("s2_cell"), 4))
        )
    cell_snap, reused = _stage(
        cat, "cells",
        f"cells:v4:s2={s2_level}:h3={h3_res}:z={zoom}"
        f":parent={det_snap['snapshot_id']}",
        det_snap, build_cells, partition_by=["s2_l4"])
    summary["stages"]["cells"] = {"rows": cell_snap["row_count"], "reused": reused}

    # 5) tile histogram — two-stage salted aggregation: the 3 hot urban
    # boxes concentrate ~20% of rows on 3 tile keys (J9; AQE alone only
    # splits *join* skew, not groupBy hot keys)
    def build_tiles():
        from cartwright_spark.spatial.skew import salted_aggregate
        cells = cat.load_table(spark, "cells", cell_snap["snapshot_id"])
        agg = salted_aggregate(
            cells, "tile_id",
            [("n_points", F.count("*"), "sum"),
             ("lat_min", F.min("lat"), "min"),
             ("lat_max", F.max("lat"), "max"),
             ("lon_min", F.min("lon"), "min"),
             ("lon_max", F.max("lon"), "max")],
            hot_threshold=max(10_000, n_pages // 50),
            salt_from="url")
        # tile_id encodes (zoom, x, y) — recover x/y with bit math
        return (agg.withColumn("tile_x", F.expr("(tile_id >> 29) & 536870911"))
                .withColumn("tile_y", F.expr("tile_id & 536870911")))
    tile_snap, reused = _stage(
        cat, "tile_counts", f"tiles:v2:z={zoom}:parent={cell_snap['snapshot_id']}",
        cell_snap, build_tiles)
    summary["stages"]["tile_counts"] = {"rows": tile_snap["row_count"], "reused": reused}

    summary["wall_sec"] = time.perf_counter() - t_start
    summary["docs_per_sec"] = n_pages / summary["wall_sec"]
    summary["lineage_depth"] = len(cat.lineage("tile_counts"))
    return summary


def tile_histogram(spark: SparkSession, workdir: str) -> DataFrame:
    return Catalog(workdir).load_table(spark, "tile_counts") \
        .orderBy(F.desc("n_points"))
