"""robots.txt evaluation at corpus scale (RFC 9309 — public spec).

Every real crawl-curation pipeline needs a politeness filter: given the
per-host robots.txt bodies (a host-sized dim — millions of rows against
trillions of pages) and the crawler's user-agent, decide fetchability
per URL. Semantics per RFC 9309:

- group selection: the group with the LONGEST ``User-agent`` token the
  crawler's product token starts with wins (most-specific-agent rule);
  same-token groups merge; the ``*`` groups are the fallback.
- rule matching: a rule matches when its path pattern matches the URL
  path; ``*`` is a wildcard, a trailing ``$`` anchors the end; the
  LONGEST matching pattern wins, Allow beating Disallow on ties. No
  matching rule ⇒ allowed.

The parser is from-scratch stdlib Python and runs on the RULES DIM only
(per host, at parse time) — never per page. Decisions are a broadcast
hash join host→rules plus a codegen prefix test for the plain-prefix
rules (the overwhelming majority in the wild); only rules that actually
contain ``*``/``$`` fall back to a JVM regexp test (still no Python in
the per-page path). The longest-match pick is one per-URL max_by — no
window sort.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(txt: str, agent: str) -> list[tuple[bool, str]]:
    """[(allow, pattern), ...] — the merged rule set of the groups
    selected for ``agent``: the LONGEST group token that the agent's
    product token starts with wins (the RFC 9309 / de-facto "most
    specific user agent" rule — group ``googlebot`` matches agent
    ``googlebot-news`` but loses to a ``googlebot-news`` group);
    same-token groups merge; the ``*`` groups are the fallback."""
    agent = agent.lower()
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    last_was_ua = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_ua:
                current = []
            current.append(val.lower())
            for ua in (val.lower(),):
                groups.setdefault(ua, [])
            last_was_ua = True
            continue
        last_was_ua = False
        if key in ("allow", "disallow"):
            if not val and key == "disallow":
                continue    # empty Disallow = allow everything (no rule)
            for ua in current:
                groups.setdefault(ua, []).append((key == "allow", val))
    matches = [ua for ua in groups
               if ua != "*" and (agent == ua or agent.startswith(ua))]
    if matches:
        return groups[max(matches, key=len)]
    return groups.get("*", [])


def _pattern_to_java_regex(pattern: str) -> str:
    """robots path pattern → anchored Java regex (* wildcard, $ end)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p).replace("\\*", "DUMMY") for p in [body]]
    rx = parts[0].replace("*", ".*").replace("DUMMY", ".*")
    return "^" + rx + ("$" if anchored else ".*$")


def robots_rules_df(robots: DataFrame, agent: str,
                    host_col: str = "host",
                    txt_col: str = "robots_txt") -> DataFrame:
    """Parse a (host, robots_txt) dim into per-rule rows
    (host, allow, pattern, plen, is_plain, rx) via one Arrow pass over
    the DIM (host-sized, not page-sized)."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            rows = []
            for host, txt in zip(pdf[host_col], pdf[txt_col]):
                for allow, pat in parse_robots(txt or "", agent):
                    plain = "*" not in pat and not pat.endswith("$")
                    rows.append((host, allow, pat, len(pat), plain,
                                 None if plain
                                 else _pattern_to_java_regex(pat)))
            yield pd.DataFrame(rows, columns=[
                host_col, "allow", "pattern", "plen", "is_plain", "rx"])

    return robots.mapInPandas(
        fn, f"{host_col} string, allow boolean, pattern string, "
            f"plen long, is_plain boolean, rx string")


def robots_decisions(urls: DataFrame, robots: DataFrame, agent: str,
                     host_col: str = "host",
                     path_col: str = "path") -> DataFrame:
    """urls(host, path, ...) × robots(host, robots_txt) →
    urls + (allowed, rule_len): RFC 9309 longest-match decision per URL.
    The rules dim is broadcast; the per-page path is pure JVM.

    NOTE: the longest-match pick groups by ALL of ``urls``' columns, so
    duplicate url rows collapse to one output row — pass a unique id
    column if input multiplicity must survive."""
    rules = robots_rules_df(robots, agent, host_col=host_col)
    hit = F.when(F.col("is_plain"),
                 F.col(path_col).startswith(F.col("pattern"))) \
        .otherwise(F.expr(f"rlike({path_col}, rx)"))
    cand = urls.join(F.broadcast(rules), host_col, "left")
    # longest match wins; Allow beats Disallow at equal length — encode
    # as one orderable struct and take the max per URL (no window sort).
    # Non-matching and missing rules collapse to a (-1, allow) sentinel,
    # so every URL survives with the RFC default (allowed) even when its
    # host HAS rules but none match.
    key = F.when(F.col("pattern").isNotNull() & hit,
                 F.struct(F.col("plen").alias("plen"),
                          F.col("allow").cast("int").alias("allow"))) \
        .otherwise(F.struct(F.lit(-1).cast("long").alias("plen"),
                            F.lit(1).alias("allow")))
    out_cols = [c for c in urls.columns]
    agg = (cand.groupBy(*out_cols)
           .agg(F.max(key).alias("win")))
    return agg.select(
        *out_cols,
        (F.col("win.allow") == 1).alias("allowed"),
        F.when(F.col("win.plen") >= 0, F.col("win.plen"))
         .otherwise(F.lit(0)).alias("rule_len"))
