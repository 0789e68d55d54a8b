"""Training-data mixing primitives: deterministic stratified sampling and
sequence packing.

* :func:`hash_stratified_sample` — per-stratum (e.g. per-source/domain)
  sampling rates applied via a content hash instead of an RNG. At 100 TB
  the properties that matter are (a) NO state: any executor decides a
  row's fate from the row alone, so the sample is identical across
  retries, re-partitioning, and incremental re-runs (a Bernoulli RNG
  sample is none of those), and (b) pure codegen: an md5 prefix compared
  to a precomputed integer threshold, no shuffle at all.

* :func:`pack_sequences` — the concat-and-chunk packing step an LLM
  trainer runs downstream of curation: documents are laid out on one
  global token stream in doc-id order, which is then cut into fixed
  ``seq_len`` windows; each doc is assigned its starting pack and offset
  (docs may straddle pack boundaries — exactly how real pipelines pack).
  The core primitive is a GLOBAL prefix sum, which a naive
  ``Window.orderBy`` computes in ONE task; here it is the classic
  distributed two-pass scan, fully declarative: range-partition by id,
  per-partition cumsum (parallel windows), then a partition-totals
  prefix — a P-row window where P = #partitions (metadata-scale) —
  broadcast-joined back. No driver collect, no single-task data window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32


def det_hash_u32(col: Column, salt: str = "") -> Column:
    """Deterministic uniform 32-bit hash of a column (md5 prefix), exactly
    reproducible in any engine with md5 (DuckDB: ('0x' || substr(md5(x),
    1, 8))::BIGINT)."""
    return F.conv(F.substring(F.md5(F.concat(col.cast("string"),
                                             F.lit(salt))), 1, 8),
                  16, 10).cast("long")


def hash_stratified_sample(df: DataFrame, strata_col: str,
                           rates: dict[str, float], id_col: str,
                           salt: str = "",
                           default_rate: float = 0.0) -> DataFrame:
    """Keep each row iff hash(id) < rate(stratum) · 2³². Rates are
    converted to integer thresholds once on the driver, so the kept set
    is an exact, portable function of (id, salt, rates) — and a rate
    increase strictly grows the previous sample (nested samples for
    mixture re-weighting experiments)."""
    thresholds = {k: int(r * _HASH_SPACE) for k, r in rates.items()}
    thr = None
    for k in sorted(thresholds):  # deterministic chain order
        cond = F.col(strata_col) == k
        v = F.lit(thresholds[k])
        thr = F.when(cond, v) if thr is None else thr.when(cond, v)
    thr = (thr.otherwise(F.lit(int(default_rate * _HASH_SPACE)))
           if thr is not None
           else F.lit(int(default_rate * _HASH_SPACE)))
    return df.where(det_hash_u32(F.col(id_col), salt) < thr)


def stratum_cap_sample(df: DataFrame, strata_col: str, cap: int,
                       id_col: str, salt: str = "",
                       margin: float = 3.0) -> DataFrame:
    """Keep at most ``cap`` rows per stratum — the "domain cap" step of a
    crawl-mixing pipeline — deterministically: the kept rows are the
    ``cap`` smallest ``det_hash_u32(id)`` values per stratum (ties by
    id), so the result is a pure function of (ids, salt), stable across
    layout and retries, and equal to the naive one-window formulation.

    Scale shape: the naive form (``row_number() OVER (PARTITION BY
    stratum ORDER BY hash)``) sorts every row of the hottest stratum in
    ONE task — a 30%-of-corpus domain at 100 TB is a 30 TB single-task
    sort. This version never sorts the full stratum:

      1. per-stratum counts (one partial-agg shuffle, rows = |strata|);
      2. under-cap strata bypass everything — kept wholesale, no sort;
      3. over-cap strata are pre-filtered to hash < cap/count · 2³² ·
         ``margin`` (hash is uniform, so survivors ≈ cap·margin per
         stratum) and only survivors are ranked. Excluded rows all hash
         above every kept row, so the survivor ranking is exact.

    ``margin`` bounds the failure probability of the pre-filter (a
    stratum yielding < cap survivors): by Chernoff, P < exp(-cap·(margin
    − 1)²/(2·margin)) — at cap 1000 / margin 3, ~e⁻⁶⁶⁷ per stratum. The
    survivor count is validated anyway (one tiny agg) and a loud
    AssertionError beats a silent undersample."""
    h = det_hash_u32(F.col(id_col), salt)
    counts = (df.groupBy(strata_col)
              .agg(F.count("*").alias("__n_str"))
              .withColumn(
                  "__thr",
                  F.when(F.col("__n_str") <= cap,
                         F.lit(_HASH_SPACE)).otherwise(
                      F.least(
                          F.lit(_HASH_SPACE),
                          (F.lit(float(cap) * margin * _HASH_SPACE)
                           / F.col("__n_str")).cast("long") + 1))))
    tagged = (df.withColumn("__h", h)
              .join(F.broadcast(counts), strata_col)
              .where(F.col("__h") < F.col("__thr")))
    small = (tagged.where(F.col("__n_str") <= cap)
             .drop("__h", "__n_str", "__thr"))
    over = tagged.where(F.col("__n_str") > cap)
    wr = (W.partitionBy(strata_col)
          .orderBy(F.col("__h").asc(), F.col(id_col).asc()))
    ranked = (over.withColumn("__rk", F.row_number().over(wr))
              .where(F.col("__rk") <= cap)
              .drop("__h", "__n_str", "__thr", "__rk"))
    return small.unionByName(ranked)


def weighted_sample(df: DataFrame, weight_col: str, k: int, id_col: str,
                    group_col: str | None = None, salt: str = "",
                    salt_buckets: int = 16) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir" — public): each row gets key = ln(u)/w with u a
    deterministic hash-uniform in (0,1); the k largest keys are exactly
    a weight-proportional without-replacement draw. Deterministic in
    (ids, salt) like every sampler in this module — retries, layout
    changes and engine ports reproduce the identical sample (the DuckDB
    oracle re-derives it value-for-value). Rows with weight <= 0 or
    NULL are excluded (zero mass), matching the A-ES definition.

    Scale shape: the GLOBAL draw (group_col=None) compiles to
    TakeOrdered — per-partition partial top-k, no full sort, no wide
    shuffle. The PER-GROUP draw never sorts a hot group in one task:
    stage 1 ranks within (group, hash-salt-bucket) so a 30%-of-corpus
    group sorts salt_buckets-way parallel; stage 2 ranks the surviving
    <= salt_buckets*k rows per group (the kmv_distinct pattern — exact,
    because a group's true top-k all survive stage 1)."""
    u = ((det_hash_u32(F.col(id_col), salt).cast("double") + 0.5)
         / _HASH_SPACE)
    keyed = (df.where(F.col(weight_col).isNotNull()
                      & (F.col(weight_col) > 0))
             .withColumn("__key", F.log(u) / F.col(weight_col)))
    if group_col is None:
        return (keyed.orderBy(F.col("__key").desc(), F.col(id_col).asc())
                .limit(k).drop("__key"))
    b = det_hash_u32(F.col(id_col), salt + "#b") % salt_buckets
    w1 = (W.partitionBy(group_col, "__b")
          .orderBy(F.col("__key").desc(), F.col(id_col).asc()))
    w2 = (W.partitionBy(group_col)
          .orderBy(F.col("__key").desc(), F.col(id_col).asc()))
    return (keyed.withColumn("__b", b)
            .withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= k)
            .withColumn("__r2", F.row_number().over(w2))
            .where(F.col("__r2") <= k)
            .drop("__key", "__b", "__r1", "__r2"))


def validate_stratum_cap(df: DataFrame, out: DataFrame, strata_col: str,
                         cap: int) -> None:
    """Loud check that the pre-filter margin held: every stratum kept
    exactly min(cap, count) rows. One tiny aggregation per side."""
    want = {r[strata_col]: min(cap, r["n"]) for r in
            df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()}
    got = {r[strata_col]: r["n"] for r in
           out.groupBy(strata_col).agg(F.count("*").alias("n")).collect()}
    assert got == want, (
        f"stratum cap undersample — raise margin: {got} != {want}")


def pack_sequences(docs: DataFrame, token_col: str, seq_len: int,
                   id_col: str = "doc_id",
                   partitions: int | None = None) -> DataFrame:
    """doc → (pack_id, pack_offset, end_pack) on the global token stream
    ordered by ``id_col``.

    ``pack_id``/``pack_offset``: pack and offset where the doc starts
    (cum_before ÷/mod seq_len); ``end_pack``: pack where its last token
    lands (empty docs: the start pack). Equivalent single-pass SQL (the
    oracle): ``sum(tokens) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` — which is exactly the one-task plan
    this two-pass scan exists to avoid."""
    parts = partitions or docs.sparkSession.sparkContext.defaultParallelism
    d = (docs.select(id_col, F.col(token_col).cast("long").alias("__tok"))
         .repartitionByRange(parts, F.col(id_col))
         .withColumn("__pid", F.spark_partition_id()))
    # pass 1: cumsum within each range partition (parallel)
    wp = (W.partitionBy("__pid").orderBy(id_col)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    local = d.withColumn("__cum_in", F.sum("__tok").over(wp))
    # pass 2: exclusive prefix of per-partition totals. P rows total —
    # the single-task window is metadata-scale by construction.
    totals = d.groupBy("__pid").agg(F.sum("__tok").alias("__ptot"))
    wt = (W.orderBy("__pid")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    prefix = totals.withColumn(
        "__before", F.sum("__ptot").over(wt) - F.col("__ptot")) \
        .select("__pid", "__before")
    out = (local.join(F.broadcast(prefix), "__pid")
           .withColumn("__cum_before",
                       F.col("__before") + F.col("__cum_in") - F.col("__tok")))
    return (out.select(
        id_col,
        F.col("__tok").alias("n_tokens"),
        F.floor(F.col("__cum_before") / seq_len).alias("pack_id"),
        (F.col("__cum_before") % seq_len).alias("pack_offset"),
        F.floor((F.col("__cum_before")
                 + F.greatest(F.col("__tok") - 1, F.lit(0))) / seq_len)
        .alias("end_pack")))
