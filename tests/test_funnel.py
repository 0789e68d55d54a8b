"""window_funnel: hand-computed chains, window expiry, strictness,
single-anchor semantics."""

import datetime as dt

import pytest

from cartwright_spark.operators.funnel import window_funnel


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _run(spark, rows, steps=("view", "click", "purchase"),
         window_sec=None):
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = window_funnel(df, list(steps), window_sec=window_sec)
    return {r.user: r for r in out.collect()}


def test_full_and_partial_chains(spark):
    rows = [
        # u1 completes all 3 in order
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2: purchase BEFORE click -> chain stops at 2
        (2, _ts(0), "view"), (2, _ts(2), "click"), (2, _ts(1), "purchase"),
        # u3: click only -> 0 steps (no anchor view)
        (3, _ts(0), "click"),
        # u4: view only
        (4, _ts(0), "view"),
    ]
    got = _run(spark, rows)
    assert got[1].steps_completed == 3
    assert (got[1].t1, got[1].t2, got[1].t3) == (_ts(0), _ts(1), _ts(2))
    assert got[2].steps_completed == 2 and got[2].t3 is None
    assert got[3].steps_completed == 0 and got[3].t1 is None
    assert got[4].steps_completed == 1


def test_strictly_after_not_equal(spark):
    # same-timestamp click does NOT chain (strict >)
    rows = [(1, _ts(0), "view"), (1, _ts(0), "click"),
            (1, _ts(5), "click"), (1, _ts(6), "purchase")]
    got = _run(spark, rows)
    assert got[1].t2 == _ts(5) and got[1].steps_completed == 3


def test_window_expiry_and_single_anchor(spark):
    # anchor = FIRST view at t=0; window 120s. The click at 3min is
    # outside [0, 2min] even though the 2nd view at 2.5min would have
    # caught it — single-anchor semantics.
    rows = [(1, _ts(0), "view"), (1, _ts(2, 30), "view"),
            (1, _ts(3), "click"), (1, _ts(3, 30), "purchase")]
    got = _run(spark, rows, window_sec=120)
    assert got[1].steps_completed == 1 and got[1].t2 is None
    # window inclusive at the boundary: click exactly at t1+120s counts
    rows2 = [(2, _ts(0), "view"), (2, _ts(2), "click"),
             (2, _ts(10), "purchase")]
    got2 = _run(spark, rows2, window_sec=120)
    assert got2[2].steps_completed == 2  # purchase outside window
    assert got2[2].t2 == _ts(2)


def test_greedy_earliest_per_step(spark):
    # two clicks after view: the EARLIEST one is the milestone
    rows = [(1, _ts(0), "view"), (1, _ts(4), "click"), (1, _ts(2), "click"),
            (1, _ts(3), "purchase")]
    got = _run(spark, rows)
    # greedy t2 = 2min, purchase at 3min > t2 -> completes
    assert got[1].t2 == _ts(2) and got[1].steps_completed == 3


def test_guards(spark):
    import pyspark.sql.functions as F  # noqa: F401
    df_rows = [(1, _ts(0), "view")]
    with pytest.raises(ValueError):
        _run(spark, df_rows, steps=("view",))
    with pytest.raises(ValueError):
        _run(spark, df_rows, steps=("view", "view"))
    with pytest.raises(ValueError):
        _run(spark, df_rows, window_sec=0)


# ------------------------------------------------- markov transitions

def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")


def test_markov_basic_counts(spark):
    import datetime as dt
    from cartwright_spark.operators.funnel import markov_transitions
    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, t0 + dt.timedelta(seconds=i), i, s)
            for i, s in enumerate("a b a b c".split())]
    rows += [(2, t0 + dt.timedelta(seconds=i), 100 + i, s)
             for i, s in enumerate("a b".split())]
    out = {(r.src, r.dst): (r.n, r.n_src, r.p)
           for r in markov_transitions(_mk_events(spark, rows)).collect()}
    # user1: a->b, b->a, a->b, b->c ; user2: a->b
    assert out[("a", "b")] == (3, 3, 1.0)
    assert out[("b", "a")] == (1, 2, 0.5)
    assert out[("b", "c")] == (1, 2, 0.5)
    assert len(out) == 3


def test_markov_ts_tie_broken_by_id(spark):
    import datetime as dt
    from cartwright_spark.operators.funnel import markov_transitions
    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, t0, 2, "b"), (1, t0, 1, "a"), (1, t0, 3, "c")]
    out = {(r.src, r.dst) for r in
           markov_transitions(_mk_events(spark, rows)).collect()}
    assert out == {("a", "b"), ("b", "c")}


def test_markov_no_cross_user_adjacency(spark):
    import datetime as dt
    from cartwright_spark.operators.funnel import markov_transitions
    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, t0, 1, "a"), (2, t0 + dt.timedelta(seconds=1), 2, "b")]
    assert markov_transitions(_mk_events(spark, rows)).count() == 0


def test_markov_min_count_and_validation(spark):
    import datetime as dt
    import pytest
    from cartwright_spark.operators.funnel import markov_transitions
    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, t0 + dt.timedelta(seconds=i), i, s)
            for i, s in enumerate("a b a b a c".split())]
    df = _mk_events(spark, rows)
    out = {(r.src, r.dst): r.n
           for r in markov_transitions(df, min_count=2).collect()}
    assert out == {("a", "b"): 2, ("b", "a"): 2}
    with pytest.raises(ValueError, match="min_count"):
        markov_transitions(df, min_count=0)


def test_markov_rows_probabilities_sum_to_one(spark):
    import datetime as dt
    from cartwright_spark.operators.funnel import markov_transitions
    t0 = dt.datetime(2026, 1, 1)
    rows = [(u, t0 + dt.timedelta(seconds=i), u * 1000 + i,
             "abcd"[(u * 7 + i * i) % 4])
            for u in range(5) for i in range(40)]
    out = markov_transitions(_mk_events(spark, rows)).collect()
    from collections import defaultdict
    per_src = defaultdict(float)
    for r in out:
        per_src[r.src] += r.p
    for v in per_src.values():
        assert abs(v - 1.0) < 1e-12


# --------------------------------------------------- cohort retention

def test_cohort_retention_triangle(spark):
    import datetime as dt
    from cartwright_spark.operators.funnel import cohort_retention
    t0 = dt.datetime(2026, 1, 5)          # arbitrary anchor
    wk = dt.timedelta(seconds=604800)
    rows = []
    # u1: weeks 0,1,3 ; u2: weeks 0,1 ; u3: week 1 only
    for u, weeks in ((1, (0, 1, 3)), (2, (0, 1)), (3, (1,))):
        for w in weeks:
            rows.append((u, t0 + w * wk, len(rows), "e", 0.0, ""))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string, value double, props string")
    out = {(r.cohort, r.week_offset): r.n_users
           for r in cohort_retention(ev).collect()}
    c0 = min(k[0] for k in out)
    assert out[(c0, 0)] == 2           # u1, u2
    assert out[(c0, 1)] == 2
    assert out[(c0, 3)] == 1           # u1 only
    assert out[(c0 + 1, 0)] == 1       # u3's cohort
    assert (c0, 2) not in out


def test_cohort_retention_dedups_within_bucket(spark):
    import datetime as dt
    from cartwright_spark.operators.funnel import cohort_retention
    t0 = dt.datetime(2026, 1, 5)
    rows = [(1, t0 + dt.timedelta(hours=h), h, "e", 0.0, "")
            for h in range(10)]   # many events, one week
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string, value double, props string")
    out = cohort_retention(ev).collect()
    assert len(out) == 1 and out[0].n_users == 1


def test_cohort_retention_validation(spark):
    import pytest
    from cartwright_spark.operators.funnel import cohort_retention
    ev = spark.createDataFrame([], "user_id long, ts timestamp")
    with pytest.raises(ValueError, match="bucket_sec"):
        cohort_retention(ev, bucket_sec=0)
