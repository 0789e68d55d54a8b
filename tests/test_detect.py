"""Entity detection over page text (operators/detect.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cartwright_spark.operators.detect import (
    detect_cities,
    detect_coordinates,
    detect_dates,
    detect_iso3,
)


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (1, "Report from Paris, France (FRA) on 2021-03-04. "
            "Station at 48.856600, 2.352200 recorded 12.3."),
        (2, "Filed in New York (USA) 03/15/2020; grid 40.712800, -74.006000 "
            "and out-of-range pair 95.000000, 10.000000."),
        (3, "No entities here, just prose about engines and rivers."),
        (4, "Tokyo update 2019/12/31 at 35.689500, 139.691700 (JPN)."),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))


def test_detect_coordinates(pages):
    got = {(r["url"], r["lat"], r["lon"])
           for r in detect_coordinates(pages).collect()}
    assert (1, 48.8566, 2.3522) in got
    assert (2, 40.7128, -74.006) in got
    assert (4, 35.6895, 139.6917) in got
    # out-of-range lat 95 filtered (latlong validator semantics)
    assert not any(u == 2 and la == 95.0 for u, la, _ in got)
    assert not any(u == 3 for u, _, _ in got)


def test_detect_iso3(pages, spark):
    got = {(r["url"], r["iso3"]) for r in detect_iso3(pages, spark).collect()}
    assert {(1, "FRA"), (2, "USA"), (4, "JPN")} <= got


def test_detect_cities(pages, spark):
    got = {(r["url"], r["city"]) for r in detect_cities(pages, spark).collect()}
    assert (1, "Paris") in got
    assert (2, "New York") in got
    assert (4, "Tokyo") in got


def test_detect_dates(pages):
    got = {(r["url"], r["format"], r["raw"])
           for r in detect_dates(pages).collect()}
    assert (1, "%Y-%m-%d", "2021-03-04") in got
    assert (2, "%m/%d/%Y", "03/15/2020") in got
    assert (4, "%Y/%m/%d", "2019/12/31") in got


def test_detect_date_format_coverage(spark):
    """Every detectable taxonomy format is found in free text containing
    its own strftime rendering (46 of the reference's 47; only free-text
    unix_time is excluded, documented in detect.py)."""
    import datetime as dt

    from cartwright_spark.operators.detect import (
        DETECTABLE_DATE_FORMATS,
        detect_dates,
    )
    assert len(DETECTABLE_DATE_FORMATS) >= 40
    base = dt.datetime(2021, 3, 4, 12, 34, 56)
    rows = [(i, f"record filed on {base.strftime(fmt)} by the bureau")
            for i, fmt in enumerate(DETECTABLE_DATE_FORMATS)]
    pages = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))
    got = {(r["url"], r["format"])
           for r in detect_dates(pages, exclude=()).collect()}
    missing = [fmt for i, fmt in enumerate(DETECTABLE_DATE_FORMATS)
               if (i, fmt) not in got]
    assert not missing, missing


def test_detect_date_unpadded_days(spark):
    """strftime zero-pads %d, so the coverage test above can't catch a
    fixed-width 'dd' parse pattern silently dropping single-digit days
    (ADVICE r2 high). Probe every \\d{1,2}-day family with an unpadded
    day and assert detection survives try_to_timestamp."""
    from cartwright_spark.operators.detect import detect_dates

    probes = [
        ("5 January 2021", "%d %B %Y"),
        ("5 January 21", "%d %B %y"),
        ("7 Mar 2021", "%d %b %Y"),
        ("January 5, 2021", "%B %d, %Y"),
        ("Thu, 4 Mar 2021", "%a, %d %b %Y"),
        ("Thursday, March 4, 2021", "%A, %B %d, %Y"),
        ("Thursday, March 4, 2021, 12:34:56", "%A, %B %d, %Y, %H:%M:%S"),
        # padded days must keep parsing under the variable-width pattern
        ("05 January 2021", "%d %B %Y"),
        ("March 05, 2021", "%B %d, %Y"),
    ]
    rows = [(i, f"filed on {raw} by the bureau")
            for i, (raw, _) in enumerate(probes)]
    pages = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))
    got = {(r["url"], r["format"], r["raw"])
           for r in detect_dates(pages, exclude=()).collect()}
    missing = [(i, raw, fmt) for i, (raw, fmt) in enumerate(probes)
               if (i, fmt, raw) not in got]
    assert not missing, missing


def test_detect_all_parity_with_standalone_detectors(spark, pages):
    """detect_all's coord/iso3/date rows equal the union of the standalone
    detectors on the same corpus (ADVICE r1: the fused single-scan claim
    must be locked by an actual parity test)."""
    from collections import Counter

    from cartwright_spark.operators.detect import (
        detect_all,
        detect_cities,
        detect_coordinates,
        detect_dates,
        detect_iso3,
    )
    allrows = detect_all(pages, spark).collect()
    got = {
        "coord": Counter((r["url"], r["lat"], r["lon"]) for r in allrows
                         if r["kind"] == "coord"),
        "iso3": Counter((r["url"], r["value"]) for r in allrows
                        if r["kind"] == "iso3"),
        "date": Counter((r["url"], r["format"], r["value"]) for r in allrows
                        if r["kind"] == "date"),
        "city": Counter((r["url"], r["value"]) for r in allrows
                        if r["kind"] == "city"),
    }
    want = {
        "coord": Counter((r["url"], r["lat"], r["lon"])
                         for r in detect_coordinates(pages).collect()),
        "iso3": Counter((r["url"], r["iso3"])
                        for r in detect_iso3(pages, spark).collect()),
        "date": Counter((r["url"], r["format"], r["raw"])
                        for r in detect_dates(pages).collect()),
        "city": Counter((r["url"], r["city"])
                        for r in detect_cities(pages, spark).collect()),
    }
    assert got == want
