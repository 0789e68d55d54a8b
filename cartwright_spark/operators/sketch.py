"""KMV (k-minimum-values) distinct-count sketch — deterministic,
mergeable cardinality estimation per group.

At 100 TB you don't count distinct URLs per domain exactly; you sketch.
KMV (Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM 2002 — public) keeps the k smallest hash values per group: if the
k-th smallest of D uniform hashes in [0, M) sits at h_k, then
D ≈ (k-1)·M/h_k. Unlike HyperLogLog the sketch is a plain sorted array —
exactly reproducible in ANSI SQL, which is what makes it oracle-checkable
here (the driver's DuckDB gate re-derives it bit-identically).

Hash: the first 8 hex chars of md5(value) as a BIGINT in [0, 2^32) —
portable across Spark (`conv(substring(md5(x),1,8),16,10)`) and DuckDB
(`('0x'||substr(md5(x),1,8))::BIGINT`), unlike xxhash64/crc32 which only
one engine exposes.

Scale shape: a distinct on (group, hash) (one shuffle with map-side
partial), then bottom-k as a TWO-STAGE ranked window — first within
(group, hash-salt) so a hot group's sort runs salt_buckets-way parallel
and each partition sorts only its slice, then a final window over
≤ salt_buckets·k rows per group. No collect_set (unbounded executor
memory on a hot group), no global sort.

Reference parity: no sketch layer in jataware/cartwright; engine scope
from the brief (per-domain corpus statistics at crawl scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_M = float(2 ** 32)


def hash32(col) -> "F.Column":
    """Portable 32-bit value hash as BIGINT in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10) \
            .cast("long")


def kmv_sketch(df: DataFrame, group_col: str, value_col: str,
               k: int = 64, salt_buckets: int = 16) -> DataFrame:
    """Per group: the bottom-k distinct 32-bit hashes of value_col, as
    rows (group, h, rn) with rn = 1-based rank. Mergeable: union two
    sketches and re-rank to get the sketch of the union."""
    vals = (df.select(F.col(group_col).alias("grp"),
                      hash32(F.col(value_col)).alias("h"))
            .distinct())
    w1 = Window.partitionBy("grp", "salt").orderBy("h")
    part = (vals.withColumn("salt", F.pmod("h", F.lit(salt_buckets)))
            .withColumn("rn", F.row_number().over(w1))
            .where(F.col("rn") <= k)
            .drop("salt", "rn"))
    w2 = Window.partitionBy("grp").orderBy("h")
    return (part.withColumn("rn", F.row_number().over(w2))
            .where(F.col("rn") <= k)
            .withColumnRenamed("grp", group_col))


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64, salt_buckets: int = 16) -> DataFrame:
    """(group, n_kept, kth_hash, est_distinct): KMV cardinality estimate
    per group. Exact (n_kept) when the group holds < k distinct hashes;
    (k-1)·2^32/h_k otherwise. est_distinct is a double; expected relative
    error ~ 1/sqrt(k-2) (≈13% at k=64)."""
    sk = kmv_sketch(df, group_col, value_col, k, salt_buckets)
    agg = sk.groupBy(group_col).agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth_hash"))
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")) \
           .otherwise(F.lit((k - 1) * _M) / F.col("kth_hash"))
    return agg.withColumn("est_distinct", est)


def cms_build(df: DataFrame, value_col: str, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005 —
    public) of a column's value frequencies: rows (row, bucket, cnt)
    with bucket = hash32(value ⊕ row-salt) mod width, cnt = how many
    input rows landed there.

    Deterministic (portable md5-derived hashes, same contract as KMV),
    MERGEABLE (union two sketches and re-aggregate — counts add), and
    bounded: the sketch is depth·width rows no matter the corpus, so
    per-day / per-shard sketches roll up without touching raw data.

    Scale shape: one explode (×depth, narrow) + one algebraic
    (row, bucket) count — map-side partial agg absorbs any hot value
    (the hot value IS one bucket per row; its count arrives
    pre-combined). No collect, no window, no sort."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (df.select(F.col(value_col).cast("string").alias("__v"))
            .select("__v", rows)
            .select("row",
                    (hash32(F.concat(F.col("__v"), F.lit("#cms"),
                                     F.col("row").cast("string")))
                     % width).alias("bucket"))
            .groupBy("row", "bucket")
            .agg(F.count("*").alias("cnt")))


def cms_estimate(sketch: DataFrame, candidates: DataFrame,
                 value_col: str, width: int = 1024) -> DataFrame:
    """Point-frequency estimates for candidate values against a
    cms_build sketch: est = min over the depth rows of the addressed
    bucket counts (biased high only — collisions add, never subtract).
    The sketch side is sketch-sized (depth·width) and broadcast; the
    candidate explosion is ×depth. Output: (value_col, est)."""
    depth = sketch.agg(F.max("row")).first()[0] + 1
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    addr = (candidates.select(F.col(value_col).cast("string")
                              .alias(value_col))
            .distinct()
            .select(value_col, rows)
            .select(value_col, "row",
                    (hash32(F.concat(F.col(value_col), F.lit("#cms"),
                                     F.col("row").cast("string")))
                     % width).alias("bucket")))
    return (addr.join(F.broadcast(sketch), ["row", "bucket"], "left")
            .groupBy(value_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est")))


def hll_sketch(df: DataFrame, group_col: str, value_col: str,
               p: int = 6) -> DataFrame:
    """HyperLogLog register table (Flajolet, Fusy, Gandouet, Meunier,
    AofA 2007 — public) per group: rows (group, reg, rho) with
    reg = hash32(value ⊕ "#hllidx") mod 2^p and rho = max over the
    register's values of (leading-zero count of hash32(value ⊕ "#hllrho")
    in a 32-bit window) + 1. Empty registers carry no row.

    rho is integer-exact in BOTH engines via binary-string length —
    rho = 33 − length(bin(h)) for h>0 (33 when h=0) — no float log2 at
    bit boundaries. Two independent 32-bit hashes replace the usual
    split of one 64-bit hash because a portable 64-bit value doesn't fit
    signed BIGINT arithmetic identically across Spark and DuckDB.

    Scale shape: ONE algebraic max-agg on (group, reg) — a hot value is
    a single register and arrives pre-combined by map-side partial agg;
    the sketch is ≤ 2^p rows per group no matter the corpus. MERGEABLE:
    union two sketches and re-max to sketch the union."""
    m = 1 << p
    h_idx = hash32(F.concat(F.col("__v"), F.lit("#hllidx")))
    h_rho = hash32(F.concat(F.col("__v"), F.lit("#hllrho")))
    rho = F.when(F.col("__h") == 0, F.lit(33)) \
           .otherwise(F.lit(33) - F.length(F.bin(F.col("__h"))))
    return (df.select(F.col(group_col).alias("grp"),
                      F.col(value_col).cast("string").alias("__v"))
            .select("grp", (h_idx % m).alias("reg"), h_rho.alias("__h"))
            .select("grp", "reg", rho.alias("rho"))
            .groupBy("grp", "reg")
            .agg(F.max("rho").alias("rho"))
            .withColumnRenamed("grp", group_col))


#: alpha_m bias constants from the HLL paper (m = 16 / 32 / 64; larger m
#: uses the asymptotic formula)
_HLL_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def hll_distinct(df: DataFrame, group_col: str, value_col: str,
                 p: int = 6) -> DataFrame:
    """(group, n_regs, est_distinct): HyperLogLog cardinality estimate
    per group, expected relative error ~ 1.04/sqrt(2^p) (≈13% at p=6).

    Estimator: raw = alpha·m²/S with S = Σ_regs 2^(−rho) (empty
    registers contribute 2^0 = 1, i.e. m − n_regs); small-range
    (linear-counting) correction m·ln(m/V) when raw ≤ 2.5m and V > 0
    empty registers remain. Every 2^(−rho) term is an exact power of
    two, so S is order-independent in IEEE doubles — safe under Spark's
    nondeterministic partial-agg order AND bit-reproducible in the
    DuckDB oracle. (The 32-bit large-range correction only matters near
    2^32 distinct and is intentionally omitted.)"""
    return hll_estimate_registers(hll_sketch(df, group_col, value_col, p),
                                  group_col, p)


def hll_estimate_registers(sk: DataFrame, group_col: str,
                           p: int = 6) -> DataFrame:
    """(group, n_regs, est_distinct) from an already-built (group, reg,
    rho) register table — the estimator half of hll_distinct, shared
    with HyperBall (functions/neighborhood.py), whose register tables
    come from iterated merges rather than a fresh sketch."""
    alpha = _HLL_ALPHA.get(p, 0.7213 / (1 + 1.079 / (1 << p)))
    m = 1 << p
    agg = sk.groupBy(group_col).agg(
        F.count("*").alias("n_regs"),
        # integer shift keeps each 2^-rho term an EXACT power of two
        # (F.shiftleft only takes a literal bit count, hence the expr)
        F.sum(F.lit(1.0) / F.expr("shiftleft(cast(1 as bigint), rho)"))
         .alias("__s_nonempty"))
    s = F.col("__s_nonempty") + (F.lit(m) - F.col("n_regs"))
    raw = F.lit(alpha * m * m) / s
    v = F.lit(m) - F.col("n_regs")
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)) \
           .otherwise(raw)
    return agg.select(group_col, "n_regs", est.alias("est_distinct"))


def kmv_set_estimate(a: DataFrame, b: DataFrame, value_col: str,
                     k: int = 64, salt_buckets: int = 16) -> DataFrame:
    """KMV set-operation estimates between two slices (Beyer et al.,
    "On synopses for distinct value estimation", SIGMOD'07): build each
    side's bottom-k sketch, merge to the union sketch (bottom-k of the
    hash union), then

        est_union        = (k-1) * 2^32 / h_k   (exact count if < k)
        jaccard          = |common hashes in the union sketch| / |sketch|
        est_intersection = jaccard * est_union

    -> ONE row (k, union_kept, n_common, est_union, jaccard,
    est_intersection).

    Scale shape: each side's sketch build is the salted two-stage ranked
    window from kmv_sketch (full-width distinct + bottom-k, no global
    sort on data); everything AFTER that operates on <= 2k rows —
    metadata scale by construction, so the final global window is free.
    The sketches are mergeable under union, which is the whole point:
    at 10^12 docs the per-partition sketches rendezvous in one tiny
    reduce, never the raw values."""
    sa = kmv_sketch(a.select(F.lit("_").alias("g"),
                             F.col(value_col).alias("v")), "g", "v",
                    k, salt_buckets).select("h")
    sb = kmv_sketch(b.select(F.lit("_").alias("g"),
                             F.col(value_col).alias("v")), "g", "v",
                    k, salt_buckets).select("h")
    tagged = (sa.select("h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
              .unionAll(sb.select("h", F.lit(0), F.lit(1)))
              .groupBy("h")
              .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    w = Window.orderBy("h")  # <= 2k rows: metadata-scale window
    un = (tagged.withColumn("rn", F.row_number().over(w))
          .where(F.col("rn") <= k))
    agg = un.agg(
        F.count("*").alias("union_kept"),
        F.max("h").alias("kth_hash"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long"))
        .alias("n_common"))
    est_u = (F.when(F.col("union_kept") < k,
                    F.col("union_kept").cast("double"))
             .otherwise(F.lit((k - 1) * _M)
                        / F.col("kth_hash").cast("double")))
    out = (agg.withColumn("est_union", est_u)
           .withColumn("jaccard", F.col("n_common").cast("double")
                       / F.col("union_kept").cast("double"))
           .withColumn("est_intersection",
                       F.col("jaccard") * F.col("est_union")))
    return out.select(F.lit(k).alias("k"), "union_kept", "n_common",
                      "est_union", F.col("jaccard").alias("jaccard"),
                      "est_intersection")


# ---------------------------------------------------------------------------
# guaranteed heavy hitters (Misra-Gries prefilter + exact recount)
# ---------------------------------------------------------------------------

def misra_gries_summary(df: DataFrame, value_col: str = "v",
                        k: int = 100) -> DataFrame:
    """Per-partition Misra-Gries candidate summary (Misra & Gries 1982;
    merge rule per Agarwal et al., "Mergeable summaries", PODS'12).

    One Arrow pass per partition keeps at most k counters: each batch's
    exact value_counts merges into the dict; when the dict exceeds k
    entries, the (k+1)-th largest count is subtracted from every counter
    and non-positive entries drop. Total undercount of any value within
    a partition is <= n_p/(k+1), so every value with partition frequency
    > n_p/(k+1) SURVIVES — a deterministic superset guarantee that holds
    under any partitioning (the output set may vary with partitioning,
    but `heavy_hitters_exact`'s recount makes the final answer
    partition-invariant).

    -> rows (v, n): candidate rows carry (value, NULL); one row per
    partition carries (NULL, n_p) so callers get the exact total from
    the same single scan.
    """
    import pandas as pd
    m = int(k)
    if m < 1:
        raise ValueError("misra_gries_summary: k must be >= 1")
    vtype = dict(df.dtypes)[value_col]

    def _mg(batches):
        counts: dict = {}
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            vc = pdf[value_col].value_counts()
            for val, c in vc.items():
                counts[val] = counts.get(val, 0) + int(c)
            if len(counts) > m:
                # batched MG trim: subtract the (m+1)-th largest count
                # from everyone; at least m+1 counters each lose >= s,
                # so the sum of trim amounts is <= n_p/(m+1)
                s = sorted(counts.values(), reverse=True)[m]
                counts = {v: c - s for v, c in counts.items() if c > s}
        out = pd.DataFrame({value_col: list(counts.keys()),
                            "n": [None] * len(counts)})
        tot = pd.DataFrame({value_col: [None], "n": [n_p]})
        yield pd.concat([out, tot], ignore_index=True)

    return df.select(value_col).mapInPandas(
        _mg, schema=f"{value_col} {vtype}, n bigint")


def heavy_hitters_exact(df: DataFrame, value_col: str = "v",
                        k: int = 100) -> DataFrame:
    """EXACT phi-heavy hitters: every value whose frequency satisfies
    freq * k > n (phi = 1/k), with its exact count — no approximation
    in the OUTPUT, only in the candidate prefilter.

    Scale shape (the 100 TB audit): the naive plan is a full-vocabulary
    groupBy — a shuffle whose width is the DOMAIN (every distinct token
    of a 10^12-doc corpus). Here scan 1 is map-only (mapInPandas keeps
    <= k counters per partition and emits <= k+1 rows — the classic
    mergeable-sketch contract: partitions rendezvous as candidates, not
    raw values); scan 2 recounts ONLY rows matching the broadcast
    candidate dim (<= n_partitions*k values), so its groupBy shuffle is
    candidate-bounded, and map-side partial aggregation absorbs the
    hot keys (heavy hitters are by definition the hottest keys — the
    partial agg is what keeps them from becoming reducer skew).
    The averaging argument makes the prefilter complete: freq > n/k
    means some partition has freq_p > n_p/k > n_p/(k+1), so the value
    is in that partition's summary.

    -> (value_col, freq, n_total), exact and partition-invariant.
    """
    vals = (df.select(F.col(value_col).alias("v"))
            .where(F.col("v").isNotNull()))
    summary = misra_gries_summary(vals, "v", k).localCheckpoint(eager=True)
    cands = summary.where(F.col("n").isNull()).select("v").distinct()
    total = summary.groupBy().agg(F.sum("n").alias("n_total"))
    counts = (vals.join(F.broadcast(cands), "v")
              .groupBy("v").agg(F.count(F.lit(1)).alias("freq")))
    return (counts.crossJoin(F.broadcast(total))
            .where(F.col("freq") * F.lit(int(k)) > F.col("n_total"))
            .select(F.col("v").alias(value_col), "freq", "n_total"))
