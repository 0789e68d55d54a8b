"""Ordered event-funnel analysis (the ClickHouse ``windowFunnel``
semantic): per user, how many of an ordered step list completed, each
step STRICTLY after the previous step's match and (optionally) within a
conversion window anchored at step 1.

Without a window, greedy earliest-match is optimal (standard exchange
argument: if any assignment of events to steps completes m steps, so
does the one taking the earliest feasible event per step — replacing a
chosen event with an earlier feasible one never invalidates later
choices), so the per-user result is uniquely defined by mins. WITH a
window the funnel is anchored at the user's FIRST step-1 event —
single-anchor semantics, deterministic and oracle-friendly; a later
step-1 event is never retried as an anchor (the max-over-anchors
variant would need one chain evaluation per step-1 event).

Reference scope note: jataware/cartwright has no event analytics; this
is engine scope for the web-events side of the corpus (events table).

Scale shape (the 100 TB audit):
  1. ONE user-key shuffle. The whole funnel is a single groupBy(user):
     t1 = min(ts | step1) plus one collected candidate-ts array per
     later step (events of other types are dropped BEFORE the shuffle
     by an IN pre-filter that pushes to the scan).
  2. The sequential dependency (t_k depends on t_{k-1}) runs over the
     per-user arrays with array_min(filter(...)) — per-user work is
     O(own events), no cross-user data movement, no second shuffle, no
     Python. Catalyst HOFs run interpreted, but on per-user arrays of
     step-matching events only (web-scale: tens, not millions).
  3. Hot users (bots with 10^6 events) bound the array size; the
     pre-filter to step types caps it at the user's step-type event
     count. For adversarial hot keys, cap candidates upstream (e.g.
     events.limit per user via sampling) — the funnel only ever needs
     the earliest few matches per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_funnel(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  window_sec: int | None = None) -> DataFrame:
    """-> one row per user with at least one step-type event (other
    event types are pre-filtered before the shuffle; a user with none
    of the step types has an all-NULL funnel row by definition — it is
    not emitted): (user, steps_completed,
    t1..tk). t_i is the greedy earliest completion time of step i
    (NULL once the chain breaks); ``steps_completed`` counts non-NULL
    milestones. With ``window_sec``, steps 2..k must land in
    (t_{i-1}, t1 + window_sec]."""
    if len(steps) < 2:
        raise ValueError("window_funnel: need at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("window_funnel: steps must be distinct")
    if window_sec is not None and window_sec <= 0:
        raise ValueError("window_funnel: window_sec must be positive")

    e = (events.select(F.col(user_col).alias("user"),
                       F.col(ts_col).alias("ts"),
                       F.col(type_col).alias("et"))
         .where(F.col("et").isin(list(steps))))

    aggs = [F.min(F.when(F.col("et") == steps[0], F.col("ts")))
            .alias("t1")]
    for i, s in enumerate(steps[1:], start=2):
        aggs.append(
            F.collect_list(
                F.when(F.col("et") == s, F.col("ts"))).alias(f"__c{i}"))
    out = e.groupBy("user").agg(*aggs)
    for i in range(2, len(steps) + 1):
        prev = F.col(f"t{i - 1}")
        cond = "x > t{p}".format(p=i - 1)
        if window_sec is not None:
            cond += f" AND x <= t1 + INTERVAL {int(window_sec)} SECONDS"
        out = out.withColumn(
            f"t{i}",
            F.when(prev.isNotNull(),
                   F.array_min(F.expr(
                       f"filter(__c{i}, x -> {cond})"))))
    completed = sum(
        (F.col(f"t{i}").isNotNull().cast("int")
         for i in range(1, len(steps) + 1)),
        F.lit(0))
    return (out.withColumn("steps_completed",
                           completed.cast("bigint"))
            .select("user", "steps_completed",
                    *[f"t{i}" for i in range(1, len(steps) + 1)]))


def markov_transitions(events: DataFrame, key_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       state_col: str = "event_type",
                       min_count: int = 1) -> DataFrame:
    """First-order Markov transition model over per-key event streams
    (the "next-page" / clickstream-path model): for every ordered
    adjacent pair of events within a key, count (src, dst) transitions
    and estimate p(dst | src) = n / n_src.
    -> (src, dst, n, n_src, p), one row per observed transition with
    n >= ``min_count``.

    Ordering is the TOTAL order (ts, id) — the id tiebreak makes the
    adjacency relation identical across engines and partitionings when
    timestamps collide (same convention as trajectory sessionization).

    Scale shape (the 100 TB audit):
      1. ONE key-partitioned window (lead) is the only corpus-sized
         exchange; the projection to (key, ts, id, state) prunes the
         scan to four columns.
      2. The (src, dst) groupBy aggregates straight down to at most
         |states|^2 rows with map-side partials — the model itself is
         metadata-sized, so the n_src row-count normalizer runs as a
         window over the aggregated matrix, never over events.
      3. p is a single integer-ratio expression (n / n_src) — the same
         float in both engines, no float accumulation anywhere.
    """
    if min_count < 1:
        raise ValueError("markov_transitions: min_count must be >= 1")
    from pyspark.sql import Window
    w = (Window.partitionBy("k")
         .orderBy(F.col("ts").asc(), F.col("i").asc()))
    pairs = (events.select(F.col(key_col).alias("k"),
                           F.col(ts_col).alias("ts"),
                           F.col(id_col).alias("i"),
                           F.col(state_col).alias("src"))
             .withColumn("dst", F.lead("src").over(w))
             .where(F.col("dst").isNotNull()))
    mat = (pairs.groupBy("src", "dst")
           .agg(F.count(F.lit(1)).alias("n")))
    norm = Window.partitionBy("src")
    return (mat.withColumn("n_src", F.sum("n").over(norm))
            .where(F.col("n") >= min_count)
            .select("src", "dst", "n", "n_src",
                    (F.col("n").cast("double") / F.col("n_src"))
                    .alias("p")))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     bucket_sec: int = 604_800) -> DataFrame:
    """Cohort retention triangle — the standard web-analytics rollup:
    users are cohorted by their FIRST-seen time bucket (default weekly,
    ``bucket_sec`` = 604800), and each later active bucket counts them
    once. -> (cohort, week_offset, n_users): n_users distinct users
    from cohort ``cohort`` active ``week_offset`` buckets later
    (offset-0 row = cohort size). Bucketing is pure integer epoch division — no engine
    week-truncation semantics (ISO vs locale) to diverge on.

    Scale shape (the 100 TB audit): ONE user-key shuffle computes each
    user's cohort (algebraic min, map-side partials); the (user,
    cohort, offset) distinct is the second and last corpus-sized
    exchange (map-side dedup absorbs per-user event skew — a 10^6-event
    bot contributes its buckets once, not 10^6 times); the final rollup
    aggregates to a triangle of |buckets|^2/2 rows — metadata-sized.
    The min-join is a broadcast when the user dimension fits, but the
    plan works unchanged when it does not (plain equi-join on user).
    """
    if bucket_sec < 1:
        raise ValueError("cohort_retention: bucket_sec must be >= 1")
    e = events.select(
        F.col(user_col).alias("u"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_sec))
        .cast("bigint").alias("b"))
    first = e.groupBy("u").agg(F.min("b").alias("cohort"))
    active = (e.join(first, "u")
              .select("u", "cohort", (F.col("b") - F.col("cohort"))
                      .alias("week_offset"))
              .distinct())
    return (active.groupBy("cohort", "week_offset")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users")))
