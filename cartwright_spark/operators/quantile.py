"""Exact quantiles at scale — k-th order statistic WITHOUT a global sort.

A 100 TB column's median cannot be `orderBy(col).offset(k)`: that is a
full-data total sort (one range shuffle of everything). The classic
distributed-selection alternative (Blum et al.-style bisection adapted
to aggregation engines; public folklore, e.g. the "histogram quantile"
in Dremel/BigQuery papers) refines a value range with bounded rounds of
ALGEBRAIC aggregation:

  round: bucket the rows of the current range into B equal-width cells
  (one map-side-combinable groupBy → ≤B rows to the driver, plus each
  cell's count/min/max), locate the cell holding the k-th value, recurse
  into [cell.min, cell.max] with k rebased.

Each round the candidate set shrinks ~B× (or the cell collapses to a
single value — min==max — which answers immediately, so a mega-duplicate
value cannot stall the loop). The driver only ever sees ≤B aggregate
rows per round: this is a bounded driver CONTROL loop over
metadata-scale results, not a driver data path. Rows outside the range
are cut by an ordinary pushed-down filter, so later rounds scan less.

Exact semantics: value at 0-based sorted index floor(q·(n−1)) — the
discrete lower quantile, mirrored 1:1 by the SQL
``row_number() = 1 + floor(q·(n−1))`` oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_order_stat(df: DataFrame, value_col: str, k: int,
                     buckets: int = 4096, max_rounds: int = 12) -> float:
    """Exact value at 0-based sorted index ``k`` of ``value_col``
    (nulls excluded), via bounded histogram-refinement rounds."""
    src = df.select(F.col(value_col).cast("double").alias("v")) \
            .where(F.col("v").isNotNull())
    row = src.agg(F.min("v").alias("lo"), F.max("v").alias("hi"),
                  F.count("*").alias("n")).first()
    lo, hi, n = row["lo"], row["hi"], row["n"]
    if n == 0:
        raise ValueError("exact_order_stat over an empty column")
    if not 0 <= k < n:
        raise ValueError(f"k={k} out of range for n={n}")
    for _ in range(max_rounds):
        if lo == hi:
            return lo
        width = (hi - lo) / buckets
        if width <= 0 or not math.isfinite(width):
            return lo    # range below double resolution: all equal-ish
        cells = (src.where((F.col("v") >= lo) & (F.col("v") <= hi))
                 .select(F.least(
                     F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
                     F.lit(buckets - 1)).alias("cell"), "v")
                 .groupBy("cell")
                 .agg(F.count("*").alias("cnt"), F.min("v").alias("mn"),
                      F.max("v").alias("mx"))
                 .orderBy("cell").collect())
        acc = 0
        for c in cells:
            if acc + c["cnt"] > k:
                if c["mn"] == c["mx"]:
                    return c["mn"]
                lo, hi, k = c["mn"], c["mx"], k - acc
                break
            acc += c["cnt"]
        else:   # pragma: no cover - accounting failure would be a bug
            raise AssertionError("k-th cell not found")
    raise ValueError(
        f"not converged after {max_rounds} rounds (range [{lo}, {hi}]) — "
        f"raise max_rounds or buckets")


def exact_quantiles(df: DataFrame, value_col: str, qs: list[float],
                    buckets: int = 4096,
                    max_rounds: int = 12) -> DataFrame:
    """(q, k, value) — exact discrete quantiles of ``value_col`` (the
    value at sorted index floor(q·(n−1))), one bounded selection per q.
    The result is assembled from driver scalars (metadata scale), like
    the resolution medians."""
    spark = df.sparkSession
    src = df.select(F.col(value_col).cast("double").alias("v")) \
            .where(F.col("v").isNotNull())
    # one narrow cache-shaped checkpoint: every selection re-scans the
    # single projected column instead of the caller's full plan
    src = src.localCheckpoint(eager=True)
    n = src.count()
    rows = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        k = int(math.floor(q * (n - 1)))
        v = exact_order_stat(src, "v", k, buckets, max_rounds)
        rows.append((float(q), k, float(v)))
    return spark.createDataFrame(rows, "q double, k long, value double")


def grouped_exact_quantile(df: DataFrame, group_col: str, value_col: str,
                           q: float, hot_threshold: int = 100_000,
                           buckets: int = 4096, max_rounds: int = 12,
                           max_hot_groups: int = 1024) -> DataFrame:
    """(group, n, k, value) — exact per-group discrete quantile (value at
    sorted index floor(q·(n−1)) within each group).

    Two paths, split by group size — the same design language as
    stratum_cap (never sort the hot stratum):

    - groups with n ≤ ``hot_threshold``: an ordinary per-group
      row_number window. Each such group sorts ONLY its own ≤threshold
      rows inside its partition — bounded task input no matter how many
      small groups there are (millions of domains is the normal case).
    - hot groups (n > threshold — by pigeonhole at most
      total/threshold of them): histogram-refinement selection run
      simultaneously for all hot groups, one filtered (group, cell)
      algebraic agg per round with the per-group [lo, hi) ranges shipped
      as a broadcast literal table. The driver holds O(hot_groups · B)
      aggregate rows per round — metadata scale because hot groups are
      few BY DEFINITION; ``max_hot_groups`` guards the contract loudly.

    No path ever globally sorts a hot group's rows.
    """
    from pyspark.sql import Window

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile {q} outside [0, 1]")
    spark = df.sparkSession
    src = df.select(F.col(group_col).alias("grp"),
                    F.col(value_col).cast("double").alias("v")) \
            .where(F.col("v").isNotNull()) \
            .localCheckpoint(eager=True)
    base = src.groupBy("grp").agg(
        F.count("*").alias("n"), F.min("v").alias("lo"),
        F.max("v").alias("hi"))
    kcol = F.floor(F.lit(q) * (F.col("n") - 1)).cast("long")
    base = base.withColumn("k", kcol).localCheckpoint(eager=True)

    # --- small groups: bounded per-group window sort ---------------------
    small = base.where(F.col("n") <= hot_threshold).select("grp", "n", "k")
    w = Window.partitionBy("grp").orderBy(F.asc("v"))
    # NO broadcast hint: with millions of small groups (the normal
    # per-domain case) the (grp, n, k) table is itself large — a plain
    # equi-join lets AQE broadcast only when it actually fits
    small_out = (src.join(small, "grp")
                 .withColumn("rn", F.row_number().over(w))
                 .where(F.col("rn") == F.col("k") + 1)
                 .select("grp", "n", "k", F.col("v").alias("value")))

    # --- hot groups: simultaneous histogram refinement --------------------
    hot_rows = base.where(F.col("n") > hot_threshold).collect()
    if len(hot_rows) > max_hot_groups:
        raise ValueError(
            f"{len(hot_rows)} groups exceed hot_threshold="
            f"{hot_threshold} (> max_hot_groups={max_hot_groups}) — "
            f"raise the threshold or the guard")
    state = {r["grp"]: {"lo": r["lo"], "hi": r["hi"], "k": r["k"],
                        "n": r["n"]} for r in hot_rows}
    resolved: dict = {}
    for _ in range(max_rounds):
        pend = {g: s for g, s in state.items() if g not in resolved}
        for g, s in list(pend.items()):
            if s["lo"] == s["hi"]:
                resolved[g] = s
                del pend[g]
        if not pend:
            break
        from pyspark.sql.types import DoubleType, StructField, StructType
        rschema = StructType([
            StructField("grp", base.schema["grp"].dataType),
            StructField("rlo", DoubleType()),
            StructField("rhi", DoubleType()),
            StructField("w", DoubleType())])
        ranges = spark.createDataFrame(
            [(g, s["lo"], s["hi"],
              max((s["hi"] - s["lo"]) / buckets, 5e-324))
             for g, s in pend.items()], rschema)
        cells = (src.join(F.broadcast(ranges), "grp")
                 .where((F.col("v") >= F.col("rlo"))
                        & (F.col("v") <= F.col("rhi")))
                 .select("grp", F.least(
                     F.floor((F.col("v") - F.col("rlo")) / F.col("w")),
                     F.lit(buckets - 1)).alias("cell"), "v")
                 .groupBy("grp", "cell")
                 .agg(F.count("*").alias("cnt"), F.min("v").alias("mn"),
                      F.max("v").alias("mx"))
                 .collect())
        per_group: dict = {}
        for c in cells:
            per_group.setdefault(c["grp"], []).append(c)
        for g, cs in per_group.items():
            cs.sort(key=lambda c: c["cell"])
            k, acc = pend[g]["k"], 0
            for c in cs:
                if acc + c["cnt"] > k:
                    if c["mn"] == c["mx"]:
                        resolved[g] = {"lo": c["mn"], "hi": c["mn"],
                                       "k": 0, "n": pend[g]["n"]}
                    else:
                        state[g] = {"lo": c["mn"], "hi": c["mx"],
                                    "k": k - acc, "n": pend[g]["n"]}
                    break
                acc += c["cnt"]
    still = [g for g in state if g not in resolved
             and state[g]["lo"] != state[g]["hi"]]
    if still:
        raise ValueError(
            f"hot groups {still[:5]} not converged after {max_rounds} "
            f"rounds — raise max_rounds or buckets")
    for g, s in state.items():
        if g not in resolved:
            resolved[g] = s
    hot_vals = [(g, state[g]["n"],
                 int(math.floor(q * (state[g]["n"] - 1))),
                 float(resolved[g]["lo"])) for g in state]
    if hot_vals:
        hot_out = spark.createDataFrame(
            hot_vals, small_out.schema)
        return small_out.unionByName(hot_out)
    return small_out
