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


def test_crawl_budget_exact_hamilton(spark):
    """Hand-checked largest-remainder apportionment: quotas sum to the
    budget, floors respected, +1s go to the largest remainders with
    host-ascending ties."""
    from cartwright_spark.operators.crawl import crawl_budget
    counts = spark.createDataFrame(
        [("a", 7), ("b", 7), ("c", 3), ("d", 3)], ["host", "n_pages"])
    # budget 10, C=20: shares 3.5, 3.5, 1.5, 1.5 -> base 3,3,1,1 (sum 8),
    # remainders all equal (10) -> +1 to 'a' and 'b' by host order
    out = {r["host"]: r["quota"]
           for r in crawl_budget(counts, budget=10).collect()}
    assert out == {"a": 4, "b": 4, "c": 1, "d": 1}


def test_crawl_budget_sums_and_proportionality(spark):
    from cartwright_spark.operators.crawl import crawl_budget
    import random
    rng = random.Random(11)
    counts = [(f"h{i:03d}", rng.randrange(1, 5000)) for i in range(200)]
    df = spark.createDataFrame(counts, ["host", "n_pages"]).repartition(16)
    rows = crawl_budget(df, budget=12345).collect()
    total_pages = sum(c for _, c in counts)
    assert sum(r["quota"] for r in rows) == 12345
    for r in rows:
        exact = 12345 * dict(counts)[r["host"]] / total_pages
        assert exact - 1 < r["quota"] < exact + 1  # Hamilton stays within 1


def test_crawl_budget_overflow_guard(spark):
    from cartwright_spark.operators.crawl import crawl_budget
    import pytest
    df = spark.createDataFrame([("a", 2 ** 40)], ["host", "n_pages"])
    with pytest.raises(Exception, match="overflows int64"):
        crawl_budget(df, budget=2 ** 40).collect()


def _resolve(spark, edges, **kw):
    from cartwright_spark.operators.crawl import resolve_redirects
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.src: r for r in resolve_redirects(df, **kw).collect()}


def test_redirects_chain_exact_hops(spark):
    # a -> b -> c -> T : every prefix resolves to T with exact hops
    out = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "T")])
    assert (out["a"].final_url, out["a"].hops, out["a"].resolved) == ("T", 3, True)
    assert (out["b"].final_url, out["b"].hops) == ("T", 2)
    assert (out["c"].final_url, out["c"].hops) == ("T", 1)


def test_redirects_hop_cap_and_boundary(spark):
    # chain of length 5 under max_hops=4: head fails, tail resolves;
    # the node exactly AT the cap resolves
    edges = [(f"n{i}", f"n{i+1}") for i in range(5)]  # n0..n4 -> n5 terminal
    out = _resolve(spark, edges, max_hops=4)
    assert out["n0"].resolved is False and out["n0"].final_url == "" and out["n0"].hops == 0
    assert (out["n1"].final_url, out["n1"].hops, out["n1"].resolved) == ("n5", 4, True)
    assert (out["n4"].hops, out["n4"].resolved) == (1, True)


def test_redirects_loops_unresolved(spark):
    # 2-cycle, self-loop, and a chain feeding into a cycle: all unresolved
    out = _resolve(spark, [("p", "q"), ("q", "p"), ("s", "s"), ("x", "p")])
    for k in ("p", "q", "s", "x"):
        assert out[k].resolved is False and out[k].hops == 0


def test_redirects_duplicate_src_min_dst(spark):
    # duplicate src rows collapse to min(dst) before the walk
    out = _resolve(spark, [("a", "zzz"), ("a", "b"), ("b", "T")])
    assert (out["a"].final_url, out["a"].hops) == ("T", 2)
    assert out["a"].resolved is True


def test_redirects_max_hops_validation(spark):
    import pytest
    from cartwright_spark.operators.crawl import resolve_redirects
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError, match="max_hops"):
        resolve_redirects(df, max_hops=0)
