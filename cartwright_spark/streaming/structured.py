"""Structured Streaming surface (SURVEY.md §2.9, north-star streaming).

Three shapes, all idiomatic Spark Structured Streaming:

* ``stream_pages`` — ``readStream`` over a parquet directory of pages
  (the Iceberg-lite table layout doubles as a file-stream source: new
  snapshot files are discovered per micro-batch).
* ``streaming_cell_counts`` — event-time windowed per-cell rollup with a
  watermark: the streaming analog of the batch S2 histogram. Late pages
  (older than the watermark) are dropped by the engine, counts per
  (window, cell) are emitted in append/update per the chosen sink mode.
* ``sessionize_events`` — ``applyInPandasWithState`` custom stateful
  operator: gap-based sessionization per user (the canonical "operator
  Spark lacks" case), state = open session aggregate, timeout closes idle
  sessions.

``run_available_now`` drains a stream to a memory sink with the
AvailableNow trigger — exactly-once over all data present at start, which
is both the test harness and the production backfill shape.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cartwright_spark.sources.corpus import PAGES_SCHEMA


def stream_pages(spark: SparkSession, path: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a pages parquet directory."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_cell_counts(pages: DataFrame, level: int = 6,
                          window: str = "7 days",
                          watermark: str = "14 days",
                          text_col: str = "text") -> DataFrame:
    """Event-time windowed per-S2-cell coordinate counts with a watermark.

    detect (regex, codegen) → encode (Arrow UDF on narrow lat/lon) →
    watermark on warc_ts → window+cell groupBy. State is bounded by the
    watermark horizon: at 10^12-document scale the per-key state is one
    count per (window, cell), and cells per window are bounded by the
    level-6 cell count, not the document count."""
    from cartwright_spark.operators.detect import _COORD_RE
    from cartwright_spark.spatial.udfs import s2_cell

    pairs = F.regexp_extract_all(F.col(text_col), F.lit(_COORD_RE), 0)
    coords = (pages
              .select("url", "warc_ts", F.explode(pairs).alias("pair"))
              .withColumn("lat", F.split("pair", ",\\s*").getItem(0)
                          .cast("double"))
              .withColumn("lon", F.split("pair", ",\\s*").getItem(1)
                          .cast("double"))
              .where(F.col("lat").between(-90, 90)
                     & F.col("lon").between(-180, 180)))
    cells = coords.withColumn(
        "s2_cell", s2_cell(F.col("lat"), F.col("lon"), level))
    return (cells.withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), "s2_cell")
            .agg(F.count("*").alias("n_points"))
            .select(F.col("w.start").alias("window_start"), "s2_cell",
                    "n_points"))


_SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.DoubleType()),
    T.StructField("session_end", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start", T.DoubleType()),
    T.StructField("last", T.DoubleType()),
    T.StructField("n", T.LongType()),
    T.StructField("s", T.DoubleType()),
])


def sessionize_events(events: DataFrame, gap_sec: float = 1800.0,
                      timeout_ms: int = 30_000) -> DataFrame:
    """Gap-based sessionization per user via applyInPandasWithState.

    events(user_id, ts, value) stream → closed sessions
    (user_id, session_start, session_end, n_events, sum_value). A session
    closes when a gap > gap_sec separates consecutive events, or when the
    processing-time timeout fires with an open session (end-of-stream
    flush under AvailableNow). State per user is one open-session
    aggregate — O(active users), not O(events)."""

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": uid, "session_start": start, "session_end": last,
                "n_events": n, "sum_value": s}])
            return
        secs = []
        vals = []
        for pdf in pdfs:
            secs.extend(pdf["secs"].tolist())
            vals.extend(pdf["value"].tolist())
        order = sorted(range(len(secs)), key=lambda i: secs[i])
        closed = []
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        for i in order:
            t, v = float(secs[i]), float(vals[i])
            if start is None:
                start, last, n, s = t, t, 1, v
            elif t - last > gap_sec:
                closed.append((uid, start, last, n, s))
                start, last, n, s = t, t, 1, v
            else:
                last = max(last, t)
                n += 1
                s += v
        state.update((start, last, n, s))
        state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(closed, columns=[
                "user_id", "session_start", "session_end", "n_events",
                "sum_value"])

    src = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").cast("double").alias("secs"),
        F.col("value").cast("double").alias("value"))
    return src.groupBy("user_id").applyInPandasWithState(
        fn, _SESSION_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.ProcessingTimeTimeout)


def run_available_now(stream_df: DataFrame, name: str,
                      output_mode: str = "append",
                      timeout_sec: int = 120) -> DataFrame:
    """Drain a streaming DataFrame with Trigger.AvailableNow into a memory
    sink and return the materialized result table."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    if not q.awaitTermination(timeout_sec):
        # timed out: the query is still running and the memory table is
        # partial — stop it and fail loudly rather than return half a drain
        q.stop()
        raise TimeoutError(
            f"streaming drain '{name}' did not finish in {timeout_sec}s")
    spark = stream_df.sparkSession
    return spark.table(name)


def sessionize_batch(events: DataFrame, gap_sec: float = 1800.0) -> DataFrame:
    """Batch oracle for sessionization: window lag over (user, ts) →
    session id by cumulative gap breaks → per-session aggregate. Used by
    tests to cross-check the stateful streaming operator, and useful on
    its own as the batch form."""
    from pyspark.sql import Window as W
    src = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").cast("double").alias("secs"),
        F.col("value").cast("double").alias("value"))
    w = W.partitionBy("user_id").orderBy("secs")
    brk = (F.col("secs") - F.lag("secs").over(w) > gap_sec).cast("int")
    sid = F.sum(F.coalesce(brk, F.lit(0))).over(
        W.partitionBy("user_id").orderBy("secs")
        .rowsBetween(W.unboundedPreceding, 0))
    return (src.withColumn("session_id", sid)
            .groupBy("user_id", "session_id")
            .agg(F.min("secs").alias("session_start"),
                 F.max("secs").alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .drop("session_id"))
