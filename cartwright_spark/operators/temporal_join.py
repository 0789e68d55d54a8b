"""As-of and range joins — two classic operators Spark's DataFrame API
lacks natively (the brief's canonical examples of "compose from existing
ops when semantics allow").

Both are implemented as compositions of built-in operators — no Python in
the plan:

* :func:`asof_join` uses the union+window trick: tag both sides, union,
  and carry the latest right-side payload forward with
  ``last(ignorenulls=True)`` over a (key, time)-ordered window. ONE
  shuffle keyed on the join key — versus the naive inequality-join
  formulation, which Catalyst can only run as a broadcast nested loop
  (O(|L|·|R|) and broadcast-bound). This is the standard distributed
  as-of strategy (same shape Flink's temporal join and kdb's aj take).
  Skew note: a hot key serializes into one task's sort; at 100 TB
  pre-bucket hot keys by coarse time (run the join per time-bucket with
  the previous bucket's tail unioned in) — the composition below is
  bucketing-agnostic, so that wrapper is pure orchestration.

* :func:`binned_range_join` joins points to intervals by exploding each
  interval onto a fixed integer bin grid (``sequence``), equi-joining on
  the point's single bin, then refining with the exact containment
  predicate. Each matching pair is produced exactly once (a point lives
  in exactly one bin), so no dedup pass. Shuffle volume is
  |points| + Σ span/bin_size — pick ``bin_size`` near the median interval
  span so replication stays O(1) per interval; AQE's skew split handles
  the residual hot bin. The naive formulation is again a nested-loop
  cartesian; this is the 1-D version of the S2-covering spatial join in
  spatial/pip.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              time_col: str, right_payload: list[str],
              tolerance_us: int | None = None,
              prefix: str = "r_",
              bucket_us: int | None = None) -> DataFrame:
    """Backward as-of left join: for each left row, attach the payload of
    the latest right row with the same key and ``right.time <= left.time``
    (within ``tolerance_us`` microseconds of the left time, if given).

    Ties: right rows sharing (key, time) are deterministically collapsed
    to the one with the greatest first payload column before the join
    (mirrors what a SQL oracle's arg-max does); a right row exactly at
    the left row's time DOES match (inclusive, kdb/pandas semantics).

    ``bucket_us`` is the hot-key skew split: with it, the sort window is
    partitioned on (key, time-bucket) instead of (key), so one hot key's
    rows spread over span/bucket_us partitions instead of serializing
    into one task's sort. Cross-bucket visibility is restored by a CARRY
    table: the latest right row per (key, bucket), carried forward over
    the per-key bucket sequence by a second window whose input is one
    row per non-empty (key, bucket) — bucket-grain, not row-grain, so it
    is orders of magnitude smaller than the data (pick ``bucket_us`` so
    a hot key has ≫ 1 and ≪ rows buckets). Results are identical to the
    unbucketed join for every input (property-tested)."""
    lt = F.col(time_col).cast("timestamp")
    l = left.withColumn("__is_left", F.lit(1))
    for c in right_payload:
        l = l.withColumn(prefix + c, F.lit(None).cast(right.schema[c].dataType))

    # deterministic tie-break: one right row per (key, time)
    tie = W.partitionBy(*key_cols, time_col).orderBy(
        F.col(right_payload[0]).desc())
    r = (right.withColumn("__rn", F.row_number().over(tie))
         .where(F.col("__rn") == 1).drop("__rn")
         .select(*key_cols, time_col,
                 *[F.col(c).alias(prefix + c) for c in right_payload])
         .withColumn("__is_left", F.lit(0)))
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = r.unionByName(l.select(*r.columns))
    part_cols = list(key_cols)
    if bucket_us is not None:
        u = u.withColumn(
            "__bkt", F.floor(F.unix_micros(F.col(time_col)
                                           .cast("timestamp"))
                             / F.lit(bucket_us)))
        part_cols.append("__bkt")
    # right rows sort before left rows at equal time ⇒ inclusive match
    wspec = (W.partitionBy(*part_cols)
             .orderBy(F.col(time_col).asc(), F.col("__is_left").asc())
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    carried = [F.last(prefix + c, ignorenulls=True).over(wspec)
               .alias(prefix + c) for c in right_payload]
    rtime = (F.last(F.when(F.col("__is_left") == 0, lt), ignorenulls=True)
             .over(wspec).alias("__rtime"))
    keep = [c for c in left.columns] + ([] if bucket_us is None
                                        else ["__bkt"])
    out = (u.select(*keep, *carried, rtime)
           .where(F.col("__is_left") == 1).drop("__is_left"))
    if bucket_us is not None:
        out = _asof_apply_carry(out, r, key_cols, time_col, right_payload,
                                prefix, bucket_us)
        # joins reorder columns (keys first) — restore the contract order
        out = out.select(*left.columns,
                         *[prefix + c for c in right_payload], "__rtime")
    if tolerance_us is not None:
        stale = (F.unix_micros(lt) - F.unix_micros(F.col("__rtime"))
                 > F.lit(tolerance_us))
        for c in right_payload:
            out = out.withColumn(
                prefix + c, F.when(stale, F.lit(None)).otherwise(
                    F.col(prefix + c)))
        out = out.withColumn(
            "__rtime", F.when(stale, F.lit(None)).otherwise(F.col("__rtime")))
    return out.withColumnRenamed("__rtime", prefix + time_col)


def _asof_apply_carry(out: DataFrame, r: DataFrame, key_cols: list[str],
                      time_col: str, right_payload: list[str],
                      prefix: str, bucket_us: int) -> DataFrame:
    """Fill cross-bucket as-of matches: for each (key, bucket) the latest
    right row of any strictly earlier bucket, carried forward over the
    per-key bucket sequence (one row per non-empty (key, bucket) — the
    carry window is bucket-grain, never row-grain)."""
    rts = F.col(time_col).cast("timestamp")
    rb = r.withColumn("__bkt",
                      F.floor(F.unix_micros(rts) / F.lit(bucket_us)))
    wlast = W.partitionBy(*key_cols, "__bkt").orderBy(rts.desc())
    last_rb = (rb.withColumn("__rn2", F.row_number().over(wlast))
               .where(F.col("__rn2") == 1)
               .select(*key_cols, "__bkt",
                       F.struct(rts.alias("__cts"),
                                *[F.col(prefix + c) for c in right_payload])
                       .alias("__cr")))
    grid = (out.select(*key_cols, "__bkt")
            .unionByName(last_rb.select(*key_cols, "__bkt")).distinct())
    wcarry = (W.partitionBy(*key_cols).orderBy("__bkt")
              .rowsBetween(W.unboundedPreceding, -1))
    carry = (grid.join(last_rb, [*key_cols, "__bkt"], "left")
             .withColumn("__carry",
                         F.last("__cr", ignorenulls=True).over(wcarry))
             .select(*key_cols, "__bkt", "__carry"))
    out = out.join(carry, [*key_cols, "__bkt"], "left")
    for c in right_payload:
        out = out.withColumn(
            prefix + c, F.coalesce(F.col(prefix + c),
                                   F.col("__carry")[prefix + c]))
    return (out.withColumn("__rtime",
                           F.coalesce(F.col("__rtime"),
                                      F.col("__carry")["__cts"]))
            .drop("__carry", "__bkt"))


def binned_range_join(points: DataFrame, intervals: DataFrame,
                      point_col: str, lo_col: str, hi_col: str,
                      bin_size: int) -> DataFrame:
    """Inner join point rows to interval rows where
    ``lo <= point <= hi`` (integer domain, bounds inclusive), via a
    fixed bin grid. Returns points' columns + intervals' columns."""
    p = points.withColumn("__bin",
                          F.floor(F.col(point_col) / F.lit(bin_size)))
    iv = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(F.col(lo_col) / F.lit(bin_size)),
                             F.floor(F.col(hi_col) / F.lit(bin_size)))))
    joined = p.join(iv, "__bin").where(
        (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col)))
    return joined.drop("__bin")


def binned_interval_join(left: DataFrame, right: DataFrame,
                         llo: str, lhi: str, rlo: str, rhi: str,
                         bin_size: int) -> DataFrame:
    """Inner join interval rows to interval rows where they OVERLAP
    (``llo <= rhi and rlo <= lhi``, integer domain, bounds inclusive).

    Both sides explode onto the bin grid; an overlapping pair shares
    every bin its intersection covers, so emitting on bin equality alone
    would duplicate it — the classic dedup is to claim the pair in
    exactly ONE bin: the one containing the overlap's START,
    ``max(llo, rlo)`` (both rows are guaranteed present there). Shuffle
    volume is Σ span/bin_size per side; no post-hoc distinct needed."""
    lb = left.withColumn(
        "__bin", F.explode(F.sequence(F.floor(F.col(llo) / F.lit(bin_size)),
                                      F.floor(F.col(lhi) / F.lit(bin_size)))))
    rb = right.withColumn(
        "__bin", F.explode(F.sequence(F.floor(F.col(rlo) / F.lit(bin_size)),
                                      F.floor(F.col(rhi) / F.lit(bin_size)))))
    joined = lb.join(rb, "__bin").where(
        (F.col(llo) <= F.col(rhi)) & (F.col(rlo) <= F.col(lhi))
        # claim in the overlap-start bin only — exactly-once emission
        & (F.floor(F.greatest(F.col(llo), F.col(rlo)) / F.lit(bin_size))
           == F.col("__bin")))
    return joined.drop("__bin")


def interval_coverage(intervals: DataFrame, group_cols: list[str],
                      lo_col: str, hi_col: str) -> DataFrame:
    """Union length of possibly-overlapping intervals per group — the
    classic sweep ("gaps and islands") expressed as pure window
    arithmetic, no UDF and no self-join.

    Semantics (inclusive-exclusive ``[lo, hi)`` in any numeric domain):
    sort each group's intervals by ``(lo, hi)``; a row STARTS a new
    island iff its ``lo`` exceeds the running max of every earlier
    ``hi``; islands are numbered with a cumulative sum of the start
    flags; each island contributes ``max(hi) - min(lo)``. Output one
    row per group: ``covered`` (sum of island extents), ``n_islands``,
    ``n_intervals``.

    Scale shape: ONE shuffle keyed on the group columns; both windows
    and the island rollup reuse that partitioning (Catalyst collapses
    them into a single sort + two window passes). A pathological hot
    group serializes into one task's sort — the same caveat as
    :func:`asof_join`; pre-split hot groups on a coarse ``lo`` range
    and union the boundary islands if one group approaches task-memory
    scale. Naive alternative is an O(n²) self-join per group.

    Ties: rows sharing ``lo`` cannot start an island after the first
    (any earlier row's ``hi >= lo``), so the result is deterministic
    under any tie order.
    """
    order = W.partitionBy(*group_cols).orderBy(lo_col, hi_col)
    prev_max_hi = F.max(hi_col).over(
        order.rowsBetween(W.unboundedPreceding, -1))
    flagged = intervals.withColumn(
        "__start",
        F.when(prev_max_hi.isNull() | (F.col(lo_col) > prev_max_hi), 1)
        .otherwise(0))
    islands = flagged.withColumn(
        "__island",
        F.sum("__start").over(order.rowsBetween(W.unboundedPreceding, 0)))
    per_island = (islands.groupBy(*group_cols, "__island")
                  .agg((F.max(hi_col) - F.min(lo_col)).alias("__extent"),
                       F.count(F.lit(1)).alias("__n")))
    return (per_island.groupBy(*group_cols)
            .agg(F.sum("__extent").alias("covered"),
                 F.count(F.lit(1)).alias("n_islands"),
                 F.sum("__n").alias("n_intervals")))
