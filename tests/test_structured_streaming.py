"""Structured Streaming operators (streaming/structured.py) vs batch
equivalents: file-source readStream, watermarked windowed agg, and the
applyInPandasWithState sessionizer."""

import shutil
import uuid

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cartwright_spark.sources.corpus import generate_pages
from cartwright_spark.streaming.structured import (
    run_available_now,
    sessionize_batch,
    sessionize_events,
    stream_pages,
    streaming_cell_counts,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    # two separate writes → two file groups, exercising multi-batch discovery
    generate_pages(spark, 1500).where(F.col("url").isNotNull()) \
        .repartition(3).write.mode("append").parquet(d)
    generate_pages(spark, 1500).withColumn(
        "url", F.concat(F.lit("b2-"), F.col("url"))) \
        .repartition(3).write.mode("append").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_cell_counts_matches_batch(spark, pages_dir):
    """readStream → watermark → window+cell agg under AvailableNow equals
    the same aggregation computed in batch (no late data in the fixture,
    so the watermark drops nothing)."""
    name = f"cells_{uuid.uuid4().hex[:8]}"
    stream = stream_pages(spark, pages_dir, max_files_per_trigger=2)
    # complete mode: append only emits windows finalized by the last
    # watermark, so the tail 60 days would be withheld at stream end —
    # complete emits the whole aggregate, making batch equality exact
    got = run_available_now(
        streaming_cell_counts(stream, level=5, window="30 days",
                              watermark="60 days"),
        name, output_mode="complete").toPandas()

    # batch equivalent, written out longhand (same detect/encode/agg with
    # no watermark — watermark semantics only matter for late data)
    batch_pages = spark.read.parquet(pages_dir)
    from cartwright_spark.operators.detect import _COORD_RE
    from cartwright_spark.spatial.udfs import s2_cell
    pairs = F.regexp_extract_all(F.col("text"), F.lit(_COORD_RE), 0)
    coords = (batch_pages
              .select("warc_ts", F.explode(pairs).alias("pair"))
              .withColumn("lat", F.split("pair", ",\\s*").getItem(0)
                          .cast("double"))
              .withColumn("lon", F.split("pair", ",\\s*").getItem(1)
                          .cast("double"))
              .where(F.col("lat").between(-90, 90)
                     & F.col("lon").between(-180, 180))
              .withColumn("s2_cell", s2_cell(F.col("lat"), F.col("lon"), 5)))
    want = (coords.groupBy(F.window("warc_ts", "30 days").alias("w"),
                           "s2_cell")
            .agg(F.count("*").alias("n_points"))
            .select(F.col("w.start").alias("window_start"), "s2_cell",
                    "n_points")).toPandas()

    key = ["window_start", "s2_cell"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) > 0
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """The stateful streaming sessionizer (timeout-flushed) finds exactly
    the batch sessionization's sessions."""
    rng = np.random.default_rng(31)
    rows = []
    base = 1_600_000_000
    for uid in range(12):
        t = base + uid * 1000
        for _ in range(rng.integers(5, 25)):
            t += float(rng.choice([60, 120, 300, 5000, 9000],
                                  p=[.4, .25, .15, .1, .1]))
            rows.append((uid, t, float(rng.uniform(0, 10))))
    pdf = pd.DataFrame(rows, columns=["user_id", "secs", "value"])
    pdf["ts"] = pd.to_datetime(pdf["secs"], unit="s")
    d = str(tmp_path / "events_stream")
    ev = spark.createDataFrame(pdf[["user_id", "ts", "value"]])
    ev.repartition(4).write.mode("overwrite").parquet(d)

    stream = (spark.readStream.schema(ev.schema).parquet(d))
    name = f"sess_{uuid.uuid4().hex[:8]}"
    sess = sessionize_events(stream, gap_sec=1800.0, timeout_ms=2_000)
    q = (sess.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(processingTime="1 second").start())
    import time
    # first micro-batch ingests all files; the timeout then flushes the
    # open sessions on a subsequent (empty) batch
    deadline = time.time() + 60
    want = {(r["user_id"], round(r["session_start"], 3),
             round(r["session_end"], 3), r["n_events"],
             round(r["sum_value"], 3))
            for r in sessionize_batch(ev, gap_sec=1800.0).collect()}
    got = set()
    while time.time() < deadline:
        got = {(r["user_id"], round(r["session_start"], 3),
                round(r["session_end"], 3), r["n_events"],
                round(r["sum_value"], 3))
               for r in spark.table(name).collect()}
        if got == want:
            break
        time.sleep(2)
    q.stop()
    assert got == want
