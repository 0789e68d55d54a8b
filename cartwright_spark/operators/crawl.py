"""Crawl-frontier scheduling — per-host politeness waves.

A polite crawler never fetches two URLs from one host concurrently and
waits a per-host delay between fetches (the operational contract around
RFC 9309 robots rules — see operators/robots.py for the allow/deny
side). The frontier scheduler therefore works per host: canonical-URL
dedup, priority ranking, and a *wave* number — the URL's 1-based fetch
rank within its host — from which the fetch time offset follows as
``(wave - 1) * delay``.

Scale shape (10^12-URL frontier): hosts are mutually independent, so the
schedule parallelizes across hosts with no global coordination — one
dedup aggregate and one window, both shuffling on the SAME host key (one
exchange reused; the window runs on the dedup's partitioning). A hot
host producing a long wave tail is politeness SEMANTICS — those fetches
must serialize no matter the engine — not engine skew; the
``max_per_host`` budget cap is the standard crawl-ops bound on exactly
that tail, and it prunes inside the window stage (rank predicate), never
materializing the truncated rows downstream.

Reference parity: jataware/cartwright has no crawl layer; this serves
the Common-Crawl-style ingest tier of the north star alongside
robots_filter and url_normalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def crawl_frontier(urls: DataFrame, url_col: str = "url_norm",
                   host_col: str = "host",
                   priority_col: str = "priority",
                   delay_s: float = 1.0,
                   max_per_host: int | None = None) -> DataFrame:
    """urls(url, host, priority) -> (url, host, priority, wave,
    fetch_offset_s).

    Duplicate canonical URLs collapse to their max priority first (the
    frontier is a set); wave = row_number within host ordered by
    (priority desc, url asc) — the url tie-break keeps the schedule
    deterministic under equal priorities; fetch_offset_s = (wave - 1) *
    delay_s. max_per_host, if given, drops everything past that wave
    (per-host crawl budget).
    """
    # ONE host-keyed exchange: hash-partitioning on host satisfies both
    # the dedup's (host, url) clustering and the window's host partition,
    # so the aggregate and the ranking run back-to-back with no second
    # shuffle (the window stage needs full host co-location anyway, so
    # exchanging on the wider key first would only add a shuffle, not
    # spread the hot host)
    dedup = (urls.repartition(F.col(host_col))
             .groupBy(host_col, url_col)
             .agg(F.max(priority_col).alias("priority")))
    w = Window.partitionBy(host_col).orderBy(
        F.desc("priority"), F.asc(url_col))
    out = dedup.withColumn("wave", F.row_number().over(w))
    if max_per_host is not None:
        out = out.where(F.col("wave") <= max_per_host)
    return out.select(
        F.col(url_col).alias("url"), F.col(host_col).alias("host"),
        "priority", "wave",
        ((F.col("wave") - 1).cast("double") * F.lit(float(delay_s)))
        .alias("fetch_offset_s"))
