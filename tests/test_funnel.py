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
