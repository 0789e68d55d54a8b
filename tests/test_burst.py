"""Temporal burst detection (operators/burst.py)."""

import datetime as dt
import math

import pytest

from cartwright_spark.operators.burst import burst_sql, detect_bursts

HOUR = 3_600_000_000
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _ev(spark, rows):
    """rows: (key, hour_index) — one event per row at that hour."""
    data = [(k, EPOCH + dt.timedelta(hours=h)) for k, h in rows]
    return spark.createDataFrame(data, "event_type string, ts timestamp")


def _z(counts_by_bin, span, c):
    s1 = sum(counts_by_bin)
    s2 = sum(x * x for x in counts_by_bin)
    mu = s1 / span
    var = s2 / span - mu * mu
    return (c - mu) / math.sqrt(var)


def test_burst_hand_case(spark):
    """Background of 1/hour for 9 hours + a 20-event spike: the spike
    bin (and only it) crosses z=3, with the exact z value."""
    rows = [("a", h) for h in range(9)] + [("a", 9)] * 20
    out = detect_bursts(_ev(spark, rows), "ts", "event_type",
                        HOUR, z_thresh=3.0).collect()
    assert len(out) == 1
    r = out[0]
    want = _z([1] * 9 + [20], 10, 20)
    assert r.key == "a" and r.c == 20
    assert abs(r.z - want) < 1e-12 and want > 3.0


def test_burst_empty_bins_lower_the_mean(spark):
    """A key firing in hour 0 and hour 9 only: the 8 silent hours are
    part of the span, so n_bins=10 — the spike's z uses mu=1.1, not the
    non-empty-bin mean. Excluding empty bins would give z≈0.7 and no
    detection at 2.5."""
    rows = [("b", 0)] + [("b", 9)] * 10
    out = detect_bursts(_ev(spark, rows), "ts", "event_type",
                        HOUR, z_thresh=2.5).collect()
    assert len(out) == 1
    assert abs(out[0].z - _z([1, 10], 10, 10)) < 1e-12


def test_burst_constant_rate_never_bursts(spark):
    """Uniform rate -> var=0 -> z NULL -> no rows (not a div-by-zero)."""
    rows = [("c", h) for h in range(12)]
    assert detect_bursts(_ev(spark, rows), "ts", "event_type",
                         HOUR, z_thresh=0.0).count() == 0


def test_burst_keys_are_independent(spark):
    """A hot key must not drag a quiet key over the line: same corpus,
    per-key moments."""
    rows = ([("hot", 9)] * 50 + [("hot", h) for h in range(9)]
            + [("quiet", h) for h in range(10)])
    out = detect_bursts(_ev(spark, rows), "ts", "event_type",
                        HOUR, z_thresh=3.0).collect()
    assert [(r.key, r.c) for r in out] == [("hot", 50)]


def test_burst_guard(spark):
    with pytest.raises(ValueError):
        detect_bursts(_ev(spark, [("a", 0)]), "ts", "event_type", 0)


def test_burst_sql_is_engine_portable():
    """The generator runs verbatim in DuckDB on exact integer moments
    and matches the Python-float formula."""
    import duckdb
    got = duckdb.sql(
        f"SELECT {burst_sql()} AS z FROM (SELECT CAST(20 AS BIGINT) c,"
        " CAST(10 AS BIGINT) n_bins, CAST(29 AS BIGINT) s1,"
        " CAST(409 AS BIGINT) s2)").fetchone()[0]
    assert abs(got - _z([1] * 9 + [20], 10, 20)) < 1e-15
