"""Rendezvous (highest-random-weight) shard routing.

The standard way (Thaler & Ravishankar 1996; used by every distributed
cache/crawler tier) to assign keys to N shards so that adding or
removing a shard reassigns ONLY the keys whose argmax moved — ~1/N of
the keyspace — instead of rehashing everything the way `key mod N`
does. A 100 TB pipeline re-routing its crawl/output partitions on a
topology change cares about exactly that property: a shard count bump
must not invalidate the whole layout.

weight(key, shard) is a two-round multiplicative mix over a 31-bit
prime field, written as the SAME integer expression in Spark and the
DuckDB oracle (the winnow/CDC portable-hash discipline — no engine
hash builtins, no cross-engine divergence). All products stay exact in
int64: operands are reduced mod M (< 2^30) before multiplying by
constants < 2^31, so every intermediate is < 2^61.

Scale shape (the 100 TB audit): assignment is a PURE per-row projection
— an array of (weight, shard) structs and one array_max — no explode,
no join, no shuffle of any kind; Catalyst folds the per-shard constants.
N is a topology constant (tens to thousands), far below the struct-array
width where codegen would balk.

Reference scope note: jataware/cartwright is single-process and has no
placement layer; this is engine scope for the distributed-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 1_073_741_789          # largest prime < 2^30
A = 1_103_515_245          # glibc LCG multiplier — public constant
B = 12_345
C = 2_654_435_761 % M      # Knuth's 2^32 / phi, reduced into the field


def _weight(key_col, shard: int):
    """Two-round mixed weight, exact int64 arithmetic end to end."""
    k = F.pmod(key_col.cast("bigint"), F.lit(M))
    h1 = F.pmod(k * F.lit(A) + F.lit(shard) * F.lit(B) + F.lit(C),
                F.lit(M))
    return F.pmod(h1 * h1 + h1, F.lit(M))


def rendezvous_assign(df: DataFrame, key_col: str, n_shards: int,
                      out_col: str = "shard") -> DataFrame:
    """Append (``out_col``, ``out_col``_w): the HRW shard for each row's
    integer key and the winning weight. Ties (probability ~N/M per key)
    break toward the HIGHEST shard id in both engines."""
    if n_shards < 1:
        raise ValueError("rendezvous_assign: n_shards must be >= 1")
    pairs = F.array(*[
        F.struct(_weight(F.col(key_col), s).alias("w"),
                 F.lit(s).cast("int").alias("s"))
        for s in range(n_shards)])
    best = F.array_max(pairs)
    return (df.withColumn("__best", best)
            .withColumn(out_col, F.col("__best.s"))
            .withColumn(f"{out_col}_w", F.col("__best.w"))
            .drop("__best"))


def weight_sql(key_expr: str, shard_expr: str) -> str:
    """The identical weight as ANSI SQL — the oracle-side generator."""
    k = f"(({key_expr}) % {M} + {M}) % {M}"
    h1 = f"(({k}) * {A} + ({shard_expr}) * {B} + {C}) % {M}"
    return f"(({h1}) * ({h1}) + ({h1})) % {M}"
