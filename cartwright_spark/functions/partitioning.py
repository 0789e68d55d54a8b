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

import os

from pyspark.sql import DataFrame

# Driver-side file statting is O(files); at 100 TB scale a table can have
# 1e5-1e6 files and a per-operator stat loop becomes driver seconds.
# Sample at most this many files and extrapolate the total.
_SIZE_SAMPLE_CAP = 256


def _file_size(sc, uri: str) -> int | None:
    """Best-effort on-disk size of one input file URI.

    Local paths go through ``os.path.getsize``; any other scheme
    (hdfs://, s3a://, ...) is statted through the JVM Hadoop FileSystem
    so the size gate keeps working on exactly the deployments the 100 TB
    comments target instead of silently degrading to the .rdd probe.
    """
    if uri.startswith("file://"):
        p = uri[7:]
    elif uri.startswith("file:"):
        p = uri[5:]
    elif "://" not in uri:
        p = uri
    else:
        try:
            jvm = sc._jvm
            jpath = jvm.org.apache.hadoop.fs.Path(uri)
            fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
            return int(fs.getFileStatus(jpath).getLen())
        except Exception:
            return None
    try:
        return os.path.getsize(p)
    except OSError:
        return None


def _estimate_bytes(sc, files: list[str]) -> int | None:
    """Estimated total bytes across ``files``, statting at most
    ``_SIZE_SAMPLE_CAP`` of them (evenly strided) and extrapolating."""
    n = len(files)
    step = max(1, -(-n // _SIZE_SAMPLE_CAP))  # ceil-div stride
    sample = files[::step][:_SIZE_SAMPLE_CAP]
    total = 0
    for f in sample:
        sz = _file_size(sc, f)
        if sz is None:
            return None
        total += sz
    return int(total * (n / len(sample)))


def fan_out(df: DataFrame, min_partitions: int | None = None,
            min_bytes_per_task: int = 2 << 20) -> DataFrame:
    """Repartition ``df`` to the core budget iff it is under-partitioned
    AND big enough for the shuffle to pay off.

    The size gate reads the source files' on-disk bytes (driver
    metadata, sampled to ≤256 stats); below ~2 MB/partition the kernel
    is sub-second on one core and the extra shuffle + Python-worker
    round-trip costs more than it buys (measured: +0.4-0.5 s on the
    sf0.1 embedding ops). Frames with no file lineage (in-memory test
    frames) engage the fan-out — at scale unknown means big. Callers
    that know a better key (e.g. a later groupBy key) should repartition
    on that instead; this is the generic guard."""
    sc = df.sparkSession.sparkContext
    want = min_partitions or sc.defaultParallelism
    # size probe FIRST: inputFiles() is cached file-listing metadata,
    # while .rdd translation costs ~0.1-0.2 s of driver analysis — on a
    # sub-second query the probe must not be the overhead it guards
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        if len(files) >= want:
            # Enough source splits for the core budget, zero stats
            # needed. If the files are big, the scan spreads them over
            # ≥want tasks; if they are tiny enough for Spark to pack
            # several per split, the per-task row volume is bounded by
            # the pack ceiling and the kernel cannot serialize onto one
            # core anyway.
            return df
        total = _estimate_bytes(sc, files)
        if total is not None and total < min_bytes_per_task:
            return df          # fits one task's budget: never worth it
    parts = df.rdd.getNumPartitions()
    if parts >= want:
        return df
    return df.repartition(want)
