"""Crawl-frontier politeness scheduling (operators/crawl.py)."""

from pyspark.sql import functions as F

from cartwright_spark.operators.crawl import crawl_frontier


def _frontier(spark):
    rows = [
        # host a: dup url with two priorities (keeps max), a tie pair
        ("https://a.com/1", "a.com", 5),
        ("https://a.com/1", "a.com", 9),
        ("https://a.com/2", "a.com", 9),
        ("https://a.com/3", "a.com", 1),
        # host b: single url
        ("https://b.com/x", "b.com", 7),
    ]
    return spark.createDataFrame(
        rows, "url_norm string, host string, priority long")


def test_waves_dedup_and_tiebreak(spark):
    out = {r.url: r for r in crawl_frontier(_frontier(spark)).collect()}
    # dedup kept max priority; ties break on url asc -> /1 before /2
    assert out["https://a.com/1"].priority == 9
    assert out["https://a.com/1"].wave == 1
    assert out["https://a.com/2"].wave == 2
    assert out["https://a.com/3"].wave == 3
    assert out["https://b.com/x"].wave == 1  # hosts independent
    assert out["https://a.com/3"].fetch_offset_s == 2.0  # (3-1)*1.0


def test_max_per_host_budget(spark):
    out = crawl_frontier(_frontier(spark), max_per_host=2)
    urls = {r.url for r in out.collect()}
    assert "https://a.com/3" not in urls
    assert len(urls) == 3


def test_single_host_exchange_reused(spark):
    """The dedup aggregate and the window must share ONE host-keyed
    shuffle: no extra Exchange between HashAggregate and Window."""
    plan = crawl_frontier(_frontier(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
