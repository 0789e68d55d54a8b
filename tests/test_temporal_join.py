"""As-of + binned range join: semantics and plan shape."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from cartwright_spark.operators.temporal_join import (
    asof_join,
    binned_range_join,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 8],
        "ts": [_ts("2024-01-01T10:00:00"), _ts("2024-01-01T12:00:00"),
               _ts("2024-01-01T09:00:00"), _ts("2024-01-01T10:00:00")],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "user_id": [7, 7, 9],
        "ts": [_ts("2024-01-01T09:30:00"), _ts("2024-01-01T11:00:00"),
               _ts("2024-01-01T08:00:00")],
        "event_id": [101, 102, 103],
        "value": [1.0, 2.0, 3.0],
    }))
    out = {r["event_id"]: r.asDict()
           for r in asof_join(left, right, ["user_id"], "ts",
                              ["event_id", "value"]).collect()}
    assert out[1]["r_event_id"] == 101          # latest at-or-before 10:00
    assert out[2]["r_event_id"] == 102          # 11:00 beats 09:30
    assert out[3]["r_event_id"] is None         # nothing before 09:00
    assert out[4]["r_event_id"] is None         # user 8 has no right rows
    assert out[2]["r_value"] == 2.0


def test_asof_inclusive_tie_and_dedup(spark):
    """A right row exactly at the left time matches; duplicate right
    (key, ts) rows deterministically collapse to the max first-payload."""
    t = _ts("2024-06-01T00:00:00")
    left = spark.createDataFrame(pd.DataFrame(
        {"event_id": [1], "user_id": [5], "ts": [t]}))
    right = spark.createDataFrame(pd.DataFrame({
        "user_id": [5, 5], "ts": [t, t],
        "event_id": [201, 202], "value": [1.0, 2.0]}))
    row = asof_join(left, right, ["user_id"], "ts",
                    ["event_id", "value"]).collect()[0]
    assert row["r_event_id"] == 202 and row["r_value"] == 2.0


def test_asof_tolerance(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "event_id": [1, 2], "user_id": [3, 3],
        "ts": [_ts("2024-01-01T10:00:00"), _ts("2024-01-01T20:00:00")]}))
    right = spark.createDataFrame(pd.DataFrame({
        "user_id": [3], "ts": [_ts("2024-01-01T09:00:00")],
        "event_id": [301], "value": [9.0]}))
    out = {r["event_id"]: r.asDict()
           for r in asof_join(left, right, ["user_id"], "ts",
                              ["event_id", "value"],
                              tolerance_us=2 * 3600 * 1_000_000).collect()}
    assert out[1]["r_event_id"] == 301          # 1h old: inside tolerance
    assert out[2]["r_event_id"] is None         # 11h old: nulled out
    assert out[2]["r_ts"] is None


def test_asof_plan_has_no_nested_loop(spark):
    """The whole point: one shuffle on the key, no BroadcastNestedLoop /
    CartesianProduct that the naive inequality join would produce."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 10).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"))
    right = spark.range(50).select(
        (F.col("id") % 10).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        F.col("id").alias("event_id"), F.lit(1.0).alias("value"))
    plan = asof_join(left, right, ["user_id"], "ts",
                     ["event_id"])._jdf.queryExecution().executedPlan() \
        .toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Window" in plan


def test_binned_range_join_exactly_once(spark):
    """Bounds inclusive on both ends; an interval spanning many bins still
    yields each matching pair exactly once (point has one bin)."""
    pts = spark.createDataFrame(pd.DataFrame(
        {"pid": [1, 2, 3, 4], "x": [5, 16, 31, 100]}))
    iv = spark.createDataFrame(pd.DataFrame(
        {"iid": ["a", "b"], "lo": [5, 30], "hi": [31, 31]}))
    rows = sorted((r["pid"], r["iid"]) for r in binned_range_join(
        pts, iv, "x", "lo", "hi", bin_size=4).collect())
    # a: [5,31] spans bins 1..7 and catches 5,16,31; b: [30,31] catches 31
    assert rows == [(1, "a"), (2, "a"), (3, "a"), (3, "b")]


def test_binned_range_join_matches_naive(spark):
    """Randomized cross-check vs the naive inequality join."""
    pts = spark.range(300).select(
        F.col("id").alias("pid"), ((F.col("id") * 37) % 500).alias("x"))
    iv = spark.range(40).select(
        F.col("id").alias("iid"), ((F.col("id") * 61) % 450).alias("lo"),
        (((F.col("id") * 61) % 450) + (F.col("id") % 55)).alias("hi"))
    got = sorted((r["pid"], r["iid"]) for r in binned_range_join(
        pts, iv, "x", "lo", "hi", bin_size=13).collect())
    want = sorted((r["pid"], r["iid"]) for r in pts.join(
        iv, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .collect())
    assert got == want and len(got) > 50


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check vs pandas.merge_asof (backward, inclusive
    - the exact published semantics this operator re-expresses as a
    distributed union+window plan). Right (key, ts) pairs are unique so
    both sides' tie rules are moot."""
    import numpy as np

    rng = np.random.default_rng(42)
    base = dt.datetime(2024, 1, 1)
    lrows = pd.DataFrame({
        "event_id": np.arange(200),
        "user_id": rng.integers(0, 8, 200),
        "ts": [base + dt.timedelta(seconds=int(s))
               for s in rng.integers(0, 10_000, 200)],
    })
    rrows = pd.DataFrame({
        "user_id": rng.integers(0, 8, 120),
        "ts": [base + dt.timedelta(seconds=int(s))
               for s in rng.integers(0, 10_000, 120)],
        "event_id": np.arange(1000, 1120),
        "value": rng.random(120),
    }).drop_duplicates(["user_id", "ts"])

    got = (asof_join(spark.createDataFrame(lrows),
                     spark.createDataFrame(rrows),
                     ["user_id"], "ts", ["event_id"])
           .select("event_id", "r_event_id").toPandas()
           .set_index("event_id")["r_event_id"].to_dict())
    want_df = pd.merge_asof(
        lrows.sort_values("ts"), rrows.sort_values("ts"),
        on="ts", by="user_id", suffixes=("", "_r"))
    want = want_df.set_index("event_id")["event_id_r"].to_dict()
    assert len(got) == 200
    for eid, rid in want.items():
        g = got[eid]  # toPandas renders the nullable long as NaN
        if pd.isna(rid):
            assert g is None or pd.isna(g), (eid, g, rid)
        else:
            assert g == rid, (eid, g, rid)


def test_binned_interval_join_matches_naive(spark):
    """Exactly-once emission (overlap-start-bin claim) cross-checked
    against the naive inequality join, with spans from 0 (point
    intervals) to multi-bin."""
    from cartwright_spark.operators.temporal_join import (
        binned_interval_join,
    )

    a = spark.range(80).select(
        F.col("id").alias("aid"), ((F.col("id") * 53) % 400).alias("a_lo"),
        (((F.col("id") * 53) % 400) + (F.col("id") % 47)).alias("a_hi"))
    b = spark.range(60).select(
        F.col("id").alias("bid"), ((F.col("id") * 71) % 380).alias("b_lo"),
        (((F.col("id") * 71) % 380) + (F.col("id") % 31)).alias("b_hi"))
    got = sorted((r["aid"], r["bid"]) for r in binned_interval_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_size=16).collect())
    want = sorted((r["aid"], r["bid"]) for r in a.join(
        b, (F.col("a_lo") <= F.col("b_hi"))
        & (F.col("b_lo") <= F.col("a_hi"))).collect())
    assert got == want and len(got) > 100
    assert len(got) == len(set(got))        # exactly once — no dupes


def test_asof_bucketed_equals_unbucketed(spark):
    """bucket_us (hot-key skew split) must be result-identical to the
    plain join at several bucket widths — including buckets with lefts
    but no rights (carry across empty buckets) and right rows exactly on
    bucket boundaries."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = dt.datetime(2024, 1, 1)
    lrows = pd.DataFrame({
        "event_id": np.arange(400),
        "user_id": np.concatenate([np.zeros(300, int),      # hot key
                                   rng.integers(1, 6, 100)]),
        "ts": [base + dt.timedelta(seconds=int(s))
               for s in rng.integers(0, 100_000, 400)],
    })
    rrows = pd.DataFrame({
        "user_id": np.concatenate([np.zeros(60, int),
                                   rng.integers(1, 6, 40)]),
        # multiples of 1000s: exactly on 1000s-bucket boundaries
        "ts": [base + dt.timedelta(seconds=int(s) * 1000)
               for s in rng.integers(0, 100, 100)],
        "event_id": np.arange(5000, 5100),
        "value": rng.random(100),
    })
    L = spark.createDataFrame(lrows)
    R = spark.createDataFrame(rrows)
    want = sorted(map(tuple, asof_join(
        L, R, ["user_id"], "ts", ["event_id", "value"]).collect()))
    for bucket_s in (1_000, 7_777, 1_000_000):
        got = sorted(map(tuple, asof_join(
            L, R, ["user_id"], "ts", ["event_id", "value"],
            bucket_us=bucket_s * 1_000_000).collect()))
        assert got == want, f"bucket_us={bucket_s}s diverges"


def test_asof_bucketed_with_tolerance(spark):
    L = spark.createDataFrame(pd.DataFrame({
        "event_id": [1, 2], "user_id": [3, 3],
        "ts": [_ts("2024-01-01T10:00:00"), _ts("2024-01-02T20:00:00")]}))
    R = spark.createDataFrame(pd.DataFrame({
        "user_id": [3], "ts": [_ts("2024-01-01T09:00:00")],
        "event_id": [301], "value": [9.0]}))
    out = {r["event_id"]: r.asDict() for r in asof_join(
        L, R, ["user_id"], "ts", ["event_id", "value"],
        tolerance_us=2 * 3600 * 1_000_000,
        bucket_us=3600 * 1_000_000).collect()}
    assert out[1]["r_event_id"] == 301
    assert out[2]["r_event_id"] is None      # carried but then too stale


def test_asof_bucketed_window_is_bucket_partitioned(spark):
    """Plan gate: with bucket_us the data-scale sort window is keyed on
    (key, __bkt), so a hot key cannot serialize into one task."""
    L = spark.range(1000).select(
        F.lit(1).alias("user_id"), F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"))
    R = spark.range(100).select(
        F.lit(1).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 600).alias("ts"),
        F.col("id").alias("event_id"), F.lit(1.0).alias("value"))
    plan = asof_join(L, R, ["user_id"], "ts", ["event_id"],
                     bucket_us=3600 * 1_000_000) \
        ._jdf.queryExecution().executedPlan().toString()
    spec_lines = [l for l in plan.splitlines()
                  if "windowspecdefinition" in l]
    # the row-grain carry window spec mentions __bkt as a partition key
    assert any("__bkt" in l and "__is_left" in l for l in spec_lines), plan


# ---------------------------------------------------------------------------
# Trajectory segmentation (operators/trajectory.py)
# ---------------------------------------------------------------------------

def _traj(spark, rows):
    import pandas as pd
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                      "lat", "lon"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_trajectory_sessions_hand_case(spark):
    """One user: wander (no break), a 20-degree jump (spatial break),
    then a long silence (temporal break) -> 3 sessions with exact
    centroids and micro-second bounds."""
    from cartwright_spark.operators.trajectory import trajectory_sessions

    rows = [
        (1, 7, "2024-01-01 00:00:00", 10.0, 20.0),
        (2, 7, "2024-01-01 01:00:00", 10.5, 20.5),   # small wander
        (3, 7, "2024-01-01 02:00:00", 30.5, 20.5),   # 20 deg jump
        (4, 7, "2024-01-20 02:00:00", 30.5, 21.0),   # 19-day silence
    ]
    out = trajectory_sessions(_traj(spark, rows), gap_deg=10.0,
                              gap_s=604800).toPandas()
    out = out.sort_values("session_id").reset_index(drop=True)
    assert list(out["session_id"]) == [1, 2, 3]
    assert list(out["n_points"]) == [2, 1, 1]
    assert out.loc[0, "clat"] == 10.25 and out.loc[0, "clon"] == 20.25
    assert out.loc[1, "clat"] == 30.5
    assert (out.loc[0, "t_end_us"] - out.loc[0, "t_start_us"]
            == 3600 * 1_000_000)


def test_trajectory_sessions_tie_break_and_users(spark):
    """Equal timestamps order by event_id; users are independent."""
    from cartwright_spark.operators.trajectory import trajectory_sessions

    rows = [
        (2, 1, "2024-01-01", 0.0, 50.0),   # same ts: event 1 precedes 2
        (1, 1, "2024-01-01", 0.0, 0.0),    # so the 50-deg gap breaks at 2
        (9, 2, "2024-01-01", 5.0, 5.0),
    ]
    out = trajectory_sessions(_traj(spark, rows), gap_deg=10.0,
                              gap_s=604800).toPandas()
    u1 = out[out.user_id == 1].sort_values("session_id")
    assert list(u1["n_points"]) == [1, 1] and len(out[out.user_id == 2]) == 1


def test_trajectory_sessions_single_shuffle(spark):
    """The session rollup must reuse the window's user_id hash
    partitioning: exactly ONE hashpartitioning exchange in the plan."""
    from cartwright_spark.operators.trajectory import trajectory_sessions

    rows = [(i, i % 3, "2024-01-01", float(i % 5), 0.0)
            for i in range(1, 31)]
    plan = trajectory_sessions(_traj(spark, rows))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_od_matrix_hand_case(spark):
    """User 7 visits cells A -> A -> B -> A (4 sessions): transitions
    A->A, A->B, B->A, one each. Sessions forced apart by time gaps."""
    from cartwright_spark.operators.trajectory import (od_matrix,
                                                       trajectory_sessions)

    rows = [
        (1, 7, "2024-01-01", 5.0, 5.0),     # session 1, cell (9, 18)
        (2, 7, "2024-02-01", 5.5, 5.5),     # session 2, same cell
        (3, 7, "2024-03-01", 5.0, 55.0),    # session 3, cell (9, 23)
        (4, 7, "2024-04-01", 5.0, 5.0),     # session 4, back to (9, 18)
    ]
    sess = trajectory_sessions(_traj(spark, rows), gap_deg=10.0,
                               gap_s=604800)
    out = od_matrix(sess, cell_deg=10.0).collect()
    got = {(r["o_row"], r["o_col"], r["d_row"], r["d_col"]): r["n_trips"]
           for r in out}
    assert got == {(9, 18, 9, 18): 1, (9, 18, 9, 23): 1,
                   (9, 23, 9, 18): 1}


def _moves_df(spark, rows):
    """rows = [(user, seconds, px, py)] -> events frame."""
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s),
          int(x), int(y), i)
         for i, (u, s, x, y) in enumerate(rows)],
        "user_id string, ts timestamp, px long, py long, event_id long")


def test_heading_octants_compass_sweep(spark):
    """All 8 axis/diagonal directions land in their sector; the 45-,
    135-, 225-, 315-degree diagonals belong to the HIGHER sector
    (half-open [k*45, (k+1)*45))."""
    from cartwright_spark.operators.trajectory import heading_octants
    path = [(0, 0), (5, 0),    # E    -> 0
            (8, 3),            # NE   -> 1 (45 boundary)
            (8, 9),            # N    -> 2
            (5, 12),           # NW   -> 3 (135 boundary)
            (-1, 12),          # W    -> 4
            (-4, 9),           # SW   -> 5 (225 boundary)
            (-4, 3),           # S    -> 6
            (1, -2)]           # SE   -> 7 (315 boundary)
    rows = [("u", i, x, y) for i, (x, y) in enumerate(path)]
    out = {r.octant: r for r in
           heading_octants(_moves_df(spark, rows)).collect()}
    assert sorted(out) == [0, 1, 2, 3, 4, 5, 6, 7]
    assert all(out[k].n_moves == 1 for k in out)
    # l1 lengths: E 5, NE 6, N 6, NW 6, W 6, SW 6, S 6, SE 10
    assert out[0].l1_total == 5 and out[7].l1_total == 10


def test_heading_octants_zero_move_and_counts(spark):
    from cartwright_spark.operators.trajectory import heading_octants
    rows = [("a", 0, 0, 0), ("a", 1, 3, 1),   # oct 0
            ("a", 2, 3, 1),                   # zero move: dropped
            ("a", 3, 6, 2),                   # oct 0 again
            ("b", 0, 0, 0)]                   # single event: no move
    out = heading_octants(_moves_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user, r.octant, r.n_moves, r.l1_total) == ("a", 0, 2, 8)


def test_heading_octants_single_exchange(spark):
    """The (user, octant) rollup reuses the window's user hash
    partitioning — exactly one exchange in the plan."""
    from cartwright_spark.operators.trajectory import heading_octants
    rows = [("u%d" % (i % 3), i, (i * 7) % 50, (i * 11) % 50)
            for i in range(60)]
    plan = heading_octants(_moves_df(spark, rows).repartition(6)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def _brute_union_len(ivs):
    """Union length of [lo, hi) intervals, brute force."""
    pts = sorted(ivs)
    merged = []
    for lo, hi in pts:
        if merged and lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return sum(hi - lo for lo, hi in merged), len(merged)


def test_interval_coverage_matches_brute_force(spark):
    from cartwright_spark.operators.temporal_join import interval_coverage
    import random
    rng = random.Random(42)
    rows = []
    truth = {}
    for g in ["a", "b", "c"]:
        ivs = []
        for _ in range(200):
            lo = rng.randrange(0, 1000)
            hi = lo + rng.randrange(1, 40)
            ivs.append((lo, hi))
            rows.append((g, lo, hi))
        truth[g] = _brute_union_len(ivs)
    df = spark.createDataFrame(rows, ["g", "lo", "hi"]).repartition(8)
    out = {r["g"]: (r["covered"], r["n_islands"], r["n_intervals"])
           for r in interval_coverage(df, ["g"], "lo", "hi").collect()}
    for g in ["a", "b", "c"]:
        cov, isl = truth[g]
        assert out[g] == (cov, isl, 200), (g, out[g], truth[g])


def test_interval_coverage_edge_cases(spark):
    from cartwright_spark.operators.temporal_join import interval_coverage
    # touching intervals merge ([0,5) + [5,9) -> one island, len 9);
    # nested intervals collapse; a lone point-interval counts.
    rows = [("t", 0, 5), ("t", 5, 9),
            ("n", 0, 100), ("n", 10, 20), ("n", 90, 120),
            ("p", 7, 8)]
    out = {r["g"]: (r["covered"], r["n_islands"])
           for r in interval_coverage(
               spark.createDataFrame(rows, ["g", "lo", "hi"]),
               ["g"], "lo", "hi").collect()}
    assert out["t"] == (9, 1)
    assert out["n"] == (120, 1)
    assert out["p"] == (1, 1)


def test_interval_coverage_single_shuffle(spark):
    from cartwright_spark.operators.temporal_join import interval_coverage
    df = spark.createDataFrame([("a", 0, 5)], ["g", "lo", "hi"])
    plan = interval_coverage(df, ["g"], "lo", "hi")._jdf \
        .queryExecution().executedPlan().toString()
    # one exchange for the group key; the island rollup and final agg
    # reuse it (partial aggs run map-side)
    assert plan.count("Exchange hashpartitioning") <= 1, plan
