"""Temporal burst detection over an event stream.

Flags (key, time-bin) cells whose event count is a z-score outlier
against that key's own rate over its observed span — the classic
burst/anomaly primitive for web-event streams (trending topics, crawl
storms, hot hosts).

Reference scope note: jataware/cartwright classifies temporal COLUMNS
(cartwright/time_resolution.py); it has no event-rate analytics. This
operator is engine scope from the brief's webtext tier, the temporal
sibling of the spatial hot-spot stack (spatial/autocorr.py Gi*).

Statistic: for key k with observed bins spanning [min_bin, max_bin],
n_bins = max_bin - min_bin + 1 (EMPTY bins count — a key that fires
once an hour then 100× in one hour must burst even though only its
non-empty bins have rows). With s1 = sum of counts and s2 = sum of
squared counts (empty bins add 0 to both):

    mu  = s1 / n_bins
    var = s2 / n_bins - mu^2          (>= 0; clamped for fp rounding)
    z   = (c - mu) / sqrt(var)        (NULL when var == 0)

n_bins, s1, s2, c are EXACT BIGINTs; mu/var/z are doubles emitted by
ONE generator expression (`burst_sql`) evaluated identically by Spark
and any SQL oracle, so the z >= threshold gate cannot diverge between
engines.

Scale shape (the 100 TB audit):
  1. ONE corpus shuffle: groupBy (key, bin) with map-side partial
     aggregation — the only pass over the events table.
  2. Per-key moments are a second agg over the BIN table (|keys| x
     span/bin rows, corpus-independent), broadcast-joined back; the
     corpus is never re-shuffled. Hot keys are absorbed by the partial
     agg in (1); the moments join is a broadcast, so key skew never
     reaches an exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def burst_sql() -> str:
    """The z-score expression over columns (c, n_bins, s1, s2) —
    one generator, two engines."""
    mu = "(CAST(s1 AS DOUBLE) / CAST(n_bins AS DOUBLE))"
    var = f"(CAST(s2 AS DOUBLE) / CAST(n_bins AS DOUBLE) - {mu} * {mu})"
    return (f"(CAST(c AS DOUBLE) - {mu})"
            f" / nullif(sqrt(greatest({var}, CAST(0.0 AS DOUBLE))),"
            f" CAST(0.0 AS DOUBLE))")


def detect_bursts(events: DataFrame, ts_col: str, key_col: str,
                  bin_micros: int, z_thresh: float = 3.0) -> DataFrame:
    """-> (key, bin, c, z) for every non-empty (key, bin) whose count is
    a z-score >= z_thresh outlier for that key. `bin` is the integer
    epoch-microsecond bin index (unix_micros DIV bin_micros — matches
    DuckDB `epoch_us(ts) // bin_micros` for positive timestamps)."""
    bin_micros = int(bin_micros)
    if bin_micros <= 0:
        raise ValueError("detect_bursts: bin_micros must be positive")
    bins = (events
            .select(F.col(key_col).alias("key"),
                    F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
                           f" DIV {bin_micros}").alias("bin"))
            .groupBy("key", "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    moments = (bins.groupBy("key")
               .agg((F.max("bin") - F.min("bin") + F.lit(1))
                    .cast("bigint").alias("n_bins"),
                    F.sum("c").cast("bigint").alias("s1"),
                    F.sum(F.col("c") * F.col("c")).cast("bigint")
                    .alias("s2")))
    return (bins.join(F.broadcast(moments), "key")
            .withColumn("z", F.expr(burst_sql()))
            .where(F.col("z") >= F.lit(float(z_thresh)))
            .select("key", "bin", "c", "z"))
