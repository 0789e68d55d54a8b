"""fan_out source-parallelism guard (functions/partitioning.py) — the
round-3 VERDICT items: the size probe must not stat O(files) on the
driver, and non-local URIs must not silently disable the gate."""

import os

import pytest

from cartwright_spark.functions import partitioning as pt
from cartwright_spark.functions.partitioning import fan_out


@pytest.fixture()
def stat_counter(monkeypatch):
    calls = {"n": 0}
    real = os.path.getsize

    def counted(p):
        calls["n"] += 1
        return real(p)

    monkeypatch.setattr(pt.os.path, "getsize", counted)
    return calls


def test_many_file_source_short_circuits_without_stats(
        spark, tmp_path, stat_counter):
    """A source with >= core-budget files needs no fan-out AND no size
    probe — the stat loop is O(files) driver time at 100 TB scale."""
    want = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "many")
    spark.range(0, 10_000).repartition(want + 8).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= want
    out = fan_out(df)
    assert out is df
    assert stat_counter["n"] == 0


def test_size_estimate_stats_at_most_256_files(monkeypatch):
    calls = {"n": 0}

    def fake_size(sc, uri):
        calls["n"] += 1
        return 1000

    monkeypatch.setattr(pt, "_file_size", fake_size)
    est = pt._estimate_bytes(None, [f"/fake/{i}.parquet"
                                    for i in range(10_000)])
    assert calls["n"] <= 256
    # extrapolated, not truncated: the estimate covers all 10k files
    assert est == 10_000 * 1000


def test_small_single_file_source_not_shuffled(spark, tmp_path):
    path = str(tmp_path / "small")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    assert fan_out(df) is df    # under min_bytes_per_task: no-op


def test_big_single_file_source_fans_to_core_budget(spark, tmp_path):
    from pyspark.sql import functions as F
    path = str(tmp_path / "big")
    (spark.range(0, 200_000)
     .withColumn("pad", F.sha2(F.col("id").cast("string"), 256))
     .coalesce(1).write.parquet(path))
    df = spark.read.parquet(path)
    assert sum(os.path.getsize(os.path.join(path, f))
               for f in os.listdir(path) if f.endswith(".parquet")) \
        > 2 << 20
    # force the under-partitioned condition regardless of how many
    # byte-range splits the scan happens to produce on this box
    want = df.rdd.getNumPartitions() * 2
    out = fan_out(df, min_partitions=want)
    assert out is not df
    assert out.rdd.getNumPartitions() == want


def test_file_size_handles_schemes(spark, tmp_path):
    sc = spark.sparkContext
    p = tmp_path / "one.bin"
    p.write_bytes(b"x" * 1234)
    assert pt._file_size(sc, str(p)) == 1234
    assert pt._file_size(sc, "file://" + str(p)) == 1234
    # remote scheme goes through the JVM Hadoop FileSystem; an
    # unreachable authority degrades to None (probe off), never raises
    assert pt._file_size(sc, "hdfs://nosuchhost:9/x.parquet") is None


def test_file_size_jvm_path_works_for_real_files(spark, tmp_path):
    """The Hadoop FileSystem branch itself returns real sizes (exercised
    via an explicit file: URI routed through the JVM)."""
    sc = spark.sparkContext
    p = tmp_path / "two.bin"
    p.write_bytes(b"y" * 4321)
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path("file://" + str(p))
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    assert int(fs.getFileStatus(jpath).getLen()) == 4321
