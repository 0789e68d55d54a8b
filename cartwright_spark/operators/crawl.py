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


def crawl_budget(host_counts: DataFrame, budget: int,
                 host_col: str = "host",
                 count_col: str = "n_pages") -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a global crawl
    budget across hosts, proportional to each host's page count — the
    standard way a recrawl scheduler turns "fetch N pages next cycle"
    into exact per-host quotas that sum to N, with no host rounded
    into starvation by pure floor division.

    Semantics (integer-exact, so the SQL oracle matches
    value-for-value):
      base_h  = floor(budget · c_h / C)        where C = Σ c_h
      rem_h   = (budget · c_h) mod C
      the (budget − Σ base) hosts with the largest remainders get +1
      (ties on remainder break by host ascending).
    Output: (host, n_pages, quota); Σ quota == budget exactly.

    Scale shape: C is a 1-row aggregate broadcast back; base/remainder
    are per-row arithmetic. The +1 ranking needs a global order over
    HOSTS (not pages) — hosts are ~10^5–10^8 when pages are 10^12, and
    the sort is rank-pruned per partition first (only rows that could
    win a +1 survive to the single-task window), the same bounded
    pattern as ranking.rrf_fuse. Products stay in int64: requires
    budget · max(c_h) < 2^63 (raise-checked)."""
    from pyspark.sql import Window

    counts = host_counts.select(F.col(host_col).alias("host"),
                                F.col(count_col).cast("long")
                                .alias("n_pages"))
    tot = counts.agg(
        F.sum("n_pages").alias("c_total"),
        F.max("n_pages").alias("c_max"),
        F.count(F.lit(1)).alias("n_hosts"))
    base = (counts.crossJoin(F.broadcast(tot))
            # products go through try_multiply so ANSI overflow can't
            # pre-empt the loud guard: NULL product -> when() falls to
            # otherwise -> raise_error. Guard lives in a FILTER so
            # column pruning can't drop it.
            .where(F.when(
                F.try_multiply(F.lit(int(budget)), F.col("c_max"))
                < F.lit(2 ** 62),
                F.lit(True))
                .otherwise(F.raise_error(F.lit(
                    "crawl_budget: budget * max(count) overflows int64"))))
            .select("host", "n_pages", "c_total", "n_hosts",
                    F.expr(f"try_multiply({budget}L, n_pages) div c_total")
                    .alias("base"),
                    (F.try_multiply(F.lit(int(budget)), F.col("n_pages"))
                     % F.col("c_total")).alias("rem")))
    # how many +1s to hand out = budget - sum(base), a broadcast scalar
    extra = base.agg((F.lit(int(budget)) - F.sum("base")).alias("k"))
    ranked = (base.crossJoin(F.broadcast(extra))
              .withColumn("__pos", F.spark_partition_id())
              .withColumn("__rn", F.row_number().over(
                  Window.partitionBy("__pos")
                  .orderBy(F.desc("rem"), F.asc("host"))))
              # a row ranked below k inside ANY partition can never be
              # in the global top-k remainders
              .where(F.col("__rn") <= F.col("k")))
    winners = (ranked.withColumn("__gr", F.row_number().over(
        Window.orderBy(F.desc("rem"), F.asc("host"))))
        .where(F.col("__gr") <= F.col("k"))
        .select("host", F.lit(1).alias("plus")))
    return (base.join(winners, "host", "left")
            .select("host", "n_pages",
                    (F.col("base") + F.coalesce(F.col("plus"), F.lit(0)))
                    .alias("quota")))


def resolve_redirects(redirects: DataFrame, src_col: str = "src",
                      dst_col: str = "dst",
                      max_hops: int = 32) -> DataFrame:
    """Redirect-chain resolution by pointer doubling: collapse every
    3xx chain in a crawl's (src_url -> dst_url) redirect map to its
    terminal URL, counting hops, in O(log max_hops) rounds instead of
    O(chain length).

    Semantics (what a fetcher following at most ``max_hops`` redirects
    would see — RFC 9110 §15.4 loop/limit guidance):
      * a URL with no outgoing redirect is TERMINAL;
      * src resolves to the first terminal reached within max_hops
        single steps -> (src, final_url, hops, resolved=true);
      * chains longer than max_hops and redirect LOOPS come back
        resolved=false with final_url='' and hops=0 — the crawler
        drops them, it never fetches a loop forever.
    Duplicate (src -> several dsts) rows collapse to min(dst) first so
    the walk is a deterministic function.

    Scale shape (10^12-edge redirect maps): the classic sequential walk
    is O(chain) dependent fetch rounds; here each round composes the
    jump table with itself — J(x) <- J(J(x).next), hops adding — so a
    pointer advances min(2^r, dist) steps after r rounds, and
    ceil(log2(max_hops))+1 rounds decide EVERY source (resolved ones
    reach their terminal; loops and over-long chains provably exceed
    the hop cap). Per round: ONE self equi-join on the current pointer
    (hash exchange on a URL key — near-uniform by construction) plus an
    eager localCheckpoint to keep the plan O(1) deep. Data volume per
    round is exactly one row per source — never the transitive closure.

    Reference parity: jataware/cartwright has no crawl layer; this
    serves the Common-Crawl ingest tier beside url_normalize (a crawl
    dedups on the POST-redirect canonical URL).
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    edges = (redirects
             .groupBy(F.col(src_col).alias("node"))
             .agg(F.min(dst_col).alias("nxt"))
             .withColumn("hops", F.lit(1).cast("long")))
    # rounds r with 2^r > max_hops: unresolved-but-live pointers carry
    # hops = 2^r > max_hops, so the final filter classifies them
    # correctly without a separate cycle detector
    rounds = 1
    while (1 << rounds) <= max_hops:
        rounds += 1
    j = edges.localCheckpoint(eager=True)
    hop_table = edges.select(F.col("node").alias("__via"),
                             F.col("nxt").alias("__via_nxt"),
                             F.col("hops").alias("__via_hops"))
    for _ in range(rounds):
        j = (j.join(hop_table, j["nxt"] == hop_table["__via"], "left")
             .select("node",
                     F.coalesce("__via_nxt", "nxt").alias("nxt"),
                     (F.col("hops") + F.coalesce(F.col("__via_hops"),
                                                 F.lit(0))).alias("hops"))
             .localCheckpoint(eager=True))
        hop_table = j.select(F.col("node").alias("__via"),
                             F.col("nxt").alias("__via_nxt"),
                             F.col("hops").alias("__via_hops"))
    # terminal test: the pointer target has no outgoing redirect
    srcs = edges.select(F.col("node").alias("__s")).distinct()
    out = (j.join(srcs, j["nxt"] == srcs["__s"], "left")
           .select(F.col("node").alias("src"),
                   F.when(F.col("__s").isNull()
                          & (F.col("hops") <= max_hops), F.col("nxt"))
                   .otherwise(F.lit("")).alias("final_url"),
                   F.when(F.col("__s").isNull()
                          & (F.col("hops") <= max_hops), F.col("hops"))
                   .otherwise(F.lit(0)).cast("long").alias("hops"),
                   (F.col("__s").isNull()
                    & (F.col("hops") <= max_hops)).alias("resolved")))
    return out
