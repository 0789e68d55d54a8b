"""Longest-prefix-match CIDR lookup — the IP -> geo/ASN enrichment
join every crawl pipeline runs on its server logs: each IPv4 (as a
uint32 in a BIGINT) matches the MOST SPECIFIC routing block that
covers it.

Classic distributed shape (the /33-way expansion trick): a block table
keyed by (prefix_len, prefix) is a BROADCAST dim; every IP explodes to
one candidate row per prefix length that actually occurs in the table
(passed as a literal list — lengths are metadata, never data), joins
on the exact integer prefix, and the winner is the max prefix length —
an argmax max(struct) aggregate, no window. All arithmetic is integer
division by powers of two (exact in any engine); never a range join,
never a cross product.

Reference scope note: jataware/cartwright has no network layer —
engine scope (crawl-log enrichment next to robots/urltools).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cidr_lookup(ips: DataFrame, blocks: DataFrame, plens: list,
                ip_col: str = "ip", plen_col: str = "plen",
                prefix_col: str = "prefix") -> DataFrame:
    """``ips``: rows with ``ip_col`` (uint32 in bigint). ``blocks``:
    (plen, prefix, block_id) — one row per CIDR block, ``prefix`` =
    ip >> (32 - plen). -> (ip, plen, block_id) for every matched ip,
    with ``plen`` the longest matching prefix. Duplicate
    (plen, prefix) block rows are deduped to the min block_id first so
    the match is deterministic."""
    if not plens:
        raise ValueError("plens must list at least one prefix length")
    if any(p < 0 or p > 32 for p in plens):
        raise ValueError("prefix lengths must be in [0, 32]")
    plens = sorted(set(int(p) for p in plens))

    dim = (blocks.select(F.col(plen_col).cast("int").alias("plen"),
                         F.col(prefix_col).cast("bigint")
                         .alias("prefix"),
                         F.col("block_id"))
           .groupBy("plen", "prefix")
           .agg(F.min("block_id").alias("block_id")))

    ip = F.col(ip_col).cast("bigint")
    cand = ips.select(
        ip.alias("ip"),
        F.explode(F.array(*[
            F.struct(F.lit(p).alias("plen"),
                     F.floor(ip / F.lit(float(1 << (32 - p))))
                     .cast("bigint").alias("prefix"))
            for p in plens])).alias("c")) \
        .select("ip", "c.plen", "c.prefix")

    hit = cand.join(F.broadcast(dim), ["plen", "prefix"])
    best = (hit.groupBy("ip")
            .agg(F.max(F.struct(F.col("plen"),
                                F.col("block_id"))).alias("b")))
    return best.select("ip", F.col("b.plen").alias("plen"),
                       F.col("b.block_id").alias("block_id"))
