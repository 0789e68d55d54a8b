"""URL canonicalization + registered-domain extraction
(operators/urltools.py): value checks per variant, idempotence, and the
map-only / no-UDF plan gate."""

import pytest
from pyspark.sql import functions as F

from cartwright_spark.operators.urltools import normalize_urls


def _norm(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i: long, url: string")
    return {r["url"]: (r["url_norm"], r["host"], r["registered_domain"])
            for r in normalize_urls(df).collect()}


def test_default_port_www_tracking_fragment(spark):
    got = _norm(spark, [
        "HTTP://WWW.Sub.Example.COM:80/Alpha/9?utm_source=f&id=3&ref=Home#Frag",
    ])
    norm, host, reg = next(iter(got.values()))
    assert norm == "http://sub.example.com/Alpha/9?id=3&ref=Home"
    assert host == "sub.example.com"
    assert reg == "example.com"


def test_public_suffix_and_all_tracking_query(spark):
    got = _norm(spark, ["https://news.acme.co.uk:443/Briefing?gclid=777"])
    norm, host, reg = next(iter(got.values()))
    assert norm == "https://news.acme.co.uk/Briefing"
    assert host == "news.acme.co.uk"
    assert reg == "acme.co.uk"


def test_nondefault_port_kept_and_empty_path(spark):
    got = _norm(spark, ["http://acme.net:8080?b=2&utm_medium=x&a=1"])
    norm, host, reg = next(iter(got.values()))
    assert norm == "http://acme.net:8080/?b=2&a=1"
    assert host == "acme.net"
    assert reg == "acme.net"


def test_path_case_preserved_and_dotless_host(spark):
    got = _norm(spark, ["HtTpS://localhost/MiXeD/CaSe/5",
                        "https://intranet:9999/x"])
    norm, host, reg = got["HtTpS://localhost/MiXeD/CaSe/5"]
    assert norm == "https://localhost/MiXeD/CaSe/5"
    assert host == "localhost" and reg == "localhost"
    _, host2, reg2 = got["https://intranet:9999/x"]
    assert host2 == "intranet" and reg2 == "intranet"


def test_port_443_only_stripped_for_https(spark):
    got = _norm(spark, ["http://a.example.org:443/x",
                        "https://a.example.org:80/x"])
    assert got["http://a.example.org:443/x"][0] == "http://a.example.org:443/x"
    assert got["https://a.example.org:80/x"][0] == "https://a.example.org:80/x"


def test_tracking_param_in_middle_and_multiple(spark):
    got = _norm(spark, [
        "http://e.com/p?a=1&utm_a=x&b=2&fbclid=z&c=3",
        "http://e.com/p?utm_a=x&utm_b=y",
    ])
    assert got["http://e.com/p?a=1&utm_a=x&b=2&fbclid=z&c=3"][0] == \
        "http://e.com/p?a=1&b=2&c=3"
    assert got["http://e.com/p?utm_a=x&utm_b=y"][0] == "http://e.com/p"


def test_idempotent(spark):
    urls = ["HTTP://WWW.Sub.Example.COM:80/A/9?utm_source=f&id=3#z",
            "https://news.acme.co.uk:443/B?gclid=7",
            "http://acme.net:8080?b=2&utm_medium=x&a=1"]
    first = {v[0] for v in _norm(spark, urls).values()}
    again = _norm(spark, sorted(first))
    for u in first:
        assert again[u][0] == u


def test_map_only_no_udf_plan(spark):
    """The whole op must stay a narrow codegen'd projection: no shuffle,
    no Python/Arrow eval in the plan."""
    df = spark.range(100).select(
        F.concat(F.lit("http://www.h"), F.col("id"), F.lit(".com/p?a=1"))
        .alias("url"))
    plan = normalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


# ------------------------------------------------------------ link graph

def test_extract_links_explodes_and_drops_linkless(spark):
    from cartwright_spark.operators.urltools import extract_links
    df = spark.createDataFrame(
        [(1, '<a href="http://a.com/x">1</a><a href="http://b.com/y">2</a>'),
         (2, "<p>no links here</p>")],
        "i: long, html: string")
    got = [(r["i"], r["link"]) for r in extract_links(df).collect()]
    assert sorted(got) == [(1, "http://a.com/x"), (1, "http://b.com/y")]


def test_host_edges_weights_and_self_link_drop(spark):
    from cartwright_spark.operators.urltools import host_edges
    pages = spark.createDataFrame(
        [("https://s.com/1",
          '<a href="http://www.t.com:80/a">x</a>'
          '<a href="http://t.com/b">y</a>'
          '<a href="https://s.com/self">z</a>'),
         ("https://s.com/2", '<a href="http://u.org/c">w</a>')],
        "url: string, html: string")
    got = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in host_edges(pages).collect()}
    # www./:80 and the bare form canonicalize to the same host → weight 2;
    # the self-link (s.com → s.com) is dropped
    assert got == {("s.com", "t.com"): 2, ("s.com", "u.org"): 1}


def test_host_edges_single_shuffle_plan(spark):
    from cartwright_spark.operators.urltools import host_edges
    pages = spark.range(100).select(
        F.concat(F.lit("https://h"), F.col("id") % 5, F.lit(".com/p"))
        .alias("url"),
        F.concat(F.lit('<a href="https://h'), (F.col("id") + 1) % 5,
                 F.lit('.com/x">l</a>')).alias("html"))
    plan = host_edges(pages)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # only the (src,dst) count agg
    assert "Python" not in plan


# ---------------------------------------------------- property fuzzing

def test_normalize_idempotent_fuzz(spark):
    """Property: normalize(normalize(u)) == normalize(u) over generated
    URLs covering scheme case, www/ports, weird-but-legal path/query
    chars, tracking params in any position, and fragments. Seeded
    generator, one Spark round-trip for the whole batch."""
    import random
    rng = random.Random(20260817)

    def txt(alpha, lo, hi):
        return "".join(rng.choice(alpha) for _ in range(rng.randint(lo, hi)))

    def url():
        scheme = rng.choice(["http", "HTTP", "https", "HtTpS"])
        www = rng.choice(["", "www.", "WWW."])
        labels = [txt("abcdefghijklmnopqrstuvwxyz0123456789", 1, 8)
                  for _ in range(rng.randint(1, 3))]
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = "/".join(txt("abcdefghijklmnopqrstuvwxyzABCDE09._~%-", 0, 6)
                        for _ in range(rng.randint(0, 3)))
        params = [(rng.choice(["a", "b", "id", "q2", "utm_source",
                               "utm_x", "gclid", "fbclid"]),
                   txt("abcZ09", 0, 4))
                  for _ in range(rng.randint(0, 4))]
        qs = "&".join(f"{k}={v}" for k, v in params)
        frag = rng.choice(["", "#f", "#Frag/2?x=1"])
        u = f"{scheme}://{www}{'.'.join(labels)}{port}"
        if path:
            u += "/" + path
        if qs:
            u += "?" + qs
        return u + frag

    batch = [url() for _ in range(300)]
    once = sorted({v[0] for v in _norm(spark, batch).values()})
    twice = _norm(spark, once)
    for u in once:
        assert twice[u][0] == u, f"not idempotent: {u!r} -> {twice[u][0]!r}"
        # invariants: no fragment, no tracking params, lowercase scheme+host
        assert "#" not in u
        assert "utm_" not in u.split("?")[-1] or "?" not in u
        sch, rest = u.split("://", 1)
        assert sch == sch.lower()
        assert not rest.split("/")[0].startswith("www.")


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309)
# ---------------------------------------------------------------------------

def test_parse_robots_groups_and_merging():
    from cartwright_spark.operators.robots import parse_robots
    txt = ("# politeness\n"
           "User-agent: crawler\nDisallow: /a/\nAllow: /a/ok\n\n"
           "User-agent: *\nDisallow: /\n\n"
           "User-agent: other\nUser-agent: crawler\nDisallow: /b\n")
    # specific group beats *, same-agent groups merge, case-insensitive
    assert parse_robots(txt, "Crawler") == [
        (False, "/a/"), (True, "/a/ok"), (False, "/b")]
    assert parse_robots(txt, "nobody") == [(False, "/")]
    # empty Disallow is a no-op rule (allow everything)
    assert parse_robots("User-agent: *\nDisallow:\n", "x") == []


def test_robots_decisions_longest_match_wildcards_default(spark):
    import pandas as pd
    from cartwright_spark.operators.robots import robots_decisions
    urls = spark.createDataFrame(pd.DataFrame({
        "host": ["a", "a", "a", "a", "b", "c"],
        "path": ["/priv/x", "/priv/pub/x", "/other", "/tmp/f.php",
                 "/anything", "/nohost"]}))
    robots = spark.createDataFrame(pd.DataFrame({
        "host": ["a", "b"],
        "robots_txt": [
            "User-agent: bot\nDisallow: /priv/\nAllow: /priv/pub\n"
            "Disallow: /*.php$\n",
            "User-agent: bot\nDisallow:\n"]}))
    out = robots_decisions(urls, robots, agent="bot").toPandas() \
        .set_index("path")
    assert out.loc["/priv/x", "allowed"] == False          # noqa: E712
    assert out.loc["/priv/pub/x", "allowed"] == True       # noqa: E712
    assert out.loc["/other", "allowed"] == True            # host rule miss
    assert out.loc["/tmp/f.php", "allowed"] == False       # wildcard + $
    assert out.loc["/anything", "allowed"] == True         # empty disallow
    assert out.loc["/nohost", "allowed"] == True           # no robots row
    assert len(out) == 6                                   # nothing lost


def test_robots_tie_allow_wins(spark):
    import pandas as pd
    from cartwright_spark.operators.robots import robots_decisions
    urls = spark.createDataFrame(pd.DataFrame(
        {"host": ["a"], "path": ["/dir/page"]}))
    robots = spark.createDataFrame(pd.DataFrame({
        "host": ["a"],
        "robots_txt": ["User-agent: *\nDisallow: /dir/\nAllow: /dir/\n"]}))
    out = robots_decisions(urls, robots, agent="bot").toPandas()
    assert bool(out["allowed"][0]) is True   # equal length → Allow wins


def test_parse_robots_most_specific_agent_wins():
    from cartwright_spark.operators.robots import parse_robots
    txt = ("User-agent: googlebot\nDisallow: /a\n\n"
           "User-agent: googlebot-news\nDisallow: /b\n\n"
           "User-agent: *\nDisallow: /c\n")
    assert parse_robots(txt, "googlebot-news") == [(False, "/b")]
    assert parse_robots(txt, "googlebot-image") == [(False, "/a")]
    assert parse_robots(txt, "googlebot") == [(False, "/a")]
    assert parse_robots(txt, "bingbot") == [(False, "/c")]


def test_anchor_text_index_pins_terms(spark):
    from cartwright_spark.operators.urltools import anchor_text_index
    pages = spark.createDataFrame(
        [("https://a.com/1",
          '<html><a href="http://www.X.com:80/p" id="z"> <b>Big</b> '
          'Maps &amp; the data </a>'
          '<a href="https://news.y.co.uk/q">maps GUIDE</a></html>'),
         ("https://b.com/2",
          '<html><a href="http://x.com/other">maps</a>'
          '<p>no second link</p></html>'),
         ("https://c.com/3", "<html>no links at all</html>")],
        "url string, html string")
    rows = {(r.dst_host, r.term): (r.n_pages, r.n_anchors)
            for r in anchor_text_index(pages).collect()}
    # host canonicalized (lowercase, www+port stripped); nested tag and
    # entity cleaned; stopword 'the' dropped; terms lowercased
    assert rows[("x.com", "big")] == (1, 1)
    assert rows[("x.com", "maps")] == (2, 2)   # both a.com and b.com link
    assert rows[("x.com", "data")] == (1, 1)
    assert rows[("news.y.co.uk", "maps")] == (1, 1)
    assert rows[("news.y.co.uk", "guide")] == (1, 1)
    assert ("x.com", "the") not in rows
    assert not [k for k in rows if k[0] == "c.com"]  # linkless page gone


# --------------------------------------------------- path templates

def test_path_templates_segment_rules(spark):
    from cartwright_spark.operators.urltools import path_templates
    rows = [("h", "/article/123/comments"),
            ("h", "/article/9/comments"),
            ("h", "/user/deadbeef01/profile"),
            ("h", "/user/a1b2c3d4-e5f6/profile"),
            ("h", "/static/css/main"),
            ("h", "/item/p42"),          # letters mixed in: verbatim
            ("h", "/short/ab12/x")]      # hex-ish but < 8 chars: verbatim
    df = spark.createDataFrame(rows, "host string, path string")
    out = {r.template: (r.n_urls, r.n_paths, r.example_path)
           for r in path_templates(df).collect()}
    assert out["/article/{n}/comments"] == (2, 2, "/article/123/comments")
    assert out["/user/{id}/profile"][0] == 2
    assert out["/static/css/main"] == (1, 1, "/static/css/main")
    assert out["/item/p42"][0] == 1
    assert out["/short/ab12/x"][0] == 1


def test_path_templates_counts_repeat_urls(spark):
    from cartwright_spark.operators.urltools import path_templates
    rows = [("h", "/a/1")] * 3 + [("h", "/a/2")]
    df = spark.createDataFrame(rows, "host string, path string")
    r = path_templates(df).collect()[0]
    assert (r.template, r.n_urls, r.n_paths) == ("/a/{n}", 4, 2)
    assert r.example_path == "/a/1"


def test_path_templates_hosts_separate(spark):
    from cartwright_spark.operators.urltools import path_templates
    rows = [("a.com", "/x/1"), ("b.com", "/x/2")]
    df = spark.createDataFrame(rows, "host string, path string")
    out = {(r.host, r.template) for r in path_templates(df).collect()}
    assert out == {("a.com", "/x/{n}"), ("b.com", "/x/{n}")}
