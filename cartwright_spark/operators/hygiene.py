"""Data-hygiene operators a training-data pipeline runs before any text
reaches a trainer: PII redaction and benchmark decontamination.

Both are pure JVM column programs (regexp / gram equi-join) — no Python
in the plan, no driver data path.

* :func:`redact_pii` — regex redaction of emails / IPv4s / long digit
  runs, plus per-class match counts. Patterns deliberately avoid
  lookaround so the exact same pattern runs under Java regex (Spark) and
  RE2 (DuckDB oracle, common crawl tooling).

* :func:`contamination_check` — the n-gram decontamination join (the
  GPT-3/Gopher appendix method): a document is contaminated if any of
  its word n-grams exactly matches a probe n-gram drawn from an eval
  benchmark. Docs explode to n-grams (lead window, same shape as
  textstats.fingerprint); probes are a SMALL table — broadcast
  equi-join on the gram string, count hits per doc. At 100 TB the doc
  side stays embarrassingly parallel; the probe side is the benchmark
  suite (thousands of rows), always broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

#: portable (Java regex ∩ RE2) PII patterns — no lookaround, no \b
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"(\d{1,3}\.){3}\d{1,3}",
    "digit_run": r"\d{9,}",          # SSNs, CC numbers, phone digits
}


def redact_pii(df: DataFrame, text_col: str = "text",
               repl: str = "<PII>") -> DataFrame:
    """Adds ``redacted`` (all PII classes replaced, applied in the fixed
    PII_PATTERNS order) and an integer ``n_<class>`` match count per
    class (counted on the ORIGINAL text, so counts are order-stable)."""
    out = df
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)))
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn("redacted", red)


def contamination_check(docs: DataFrame, probes: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        probe_col: str = "probe", n: int = 13) -> DataFrame:
    """Per doc: how many of its word ``n``-grams hit the probe set.

    Normalization on both sides: lowercase, split on whitespace, join
    with single spaces (a probe with ≠ n words can never match and is
    normalized-then-kept verbatim). Returns (id, n_hits,
    n_distinct_probes_hit) for CONTAMINATED docs only — the common case
    (clean doc) never leaves the map side of the join."""
    words = F.filter(F.split(F.lower(F.col(text_col)), "\\s+"),
                     lambda w: w != "")
    rows = (docs.withColumn("__ws", words)
            .select(id_col, F.size("__ws").alias("__n"),
                    F.posexplode("__ws").alias("pos", "w")))
    wspec = W.partitionBy(id_col).orderBy("pos")
    leads = [F.col("w")] + [F.lead("w", i).over(wspec)
                            for i in range(1, n)]
    gram = F.when(F.col("pos") + n <= F.col("__n"),
                  F.concat_ws(" ", *leads))
    grams = (rows.withColumn("__g", gram)
             .where(F.col("__g").isNotNull())
             .select(id_col, "__g"))
    p = probes.select(
        F.concat_ws(" ", F.filter(
            F.split(F.lower(F.col(probe_col)), "\\s+"),
            lambda w: w != "")).alias("__g")).distinct()
    return (grams.join(F.broadcast(p), "__g")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hits"),
                 F.countDistinct("__g").alias("n_probes_hit")))


def remove_boilerplate_lines(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             min_doc_freq: int = 10) -> DataFrame:
    """CCNet-style boilerplate line removal: drop every line whose
    normalized form (trim + lower) appears in >= ``min_doc_freq``
    DISTINCT documents — cookie banners, nav bars, footers. ->
    (id, clean_text, n_lines, n_removed) with surviving lines rejoined
    IN ORIGINAL ORDER.

    CCNet (Wenzek et al. 2020) dedupes lines by hash across shards;
    here the line-df table is exact (distinct (line, doc) then count —
    one deduped shuffle with map-side combine).

    Scale shape (the 100 TB audit):
      1. Line df is counted on DISTINCT (norm, doc) so in-page repeats
         (a nav repeated per page section) can't inflate df past the
         true page count.
      2. The flagged-line dim (df >= threshold) is VASTLY smaller than
         the line table — boilerplate is by definition repeated — and
         usually broadcastable; we join lines->flags on the line's
         xxhash64 (8-byte keys lead the lookup) AND the normalized
         string itself, so a 64-bit collision with a flagged line can
         never delete an innocent line: the hash is the cheap key, the
         norm equality is the exactness guarantee.
      3. Rejoin is one groupBy(id) with sort_array over (pos, line)
         structs — a single corpus shuffle; no window, no Python.
      4. Removal is flag-based (left join + filter inside the
         aggregate), so n_lines/n_removed come from the SAME pass as
         the rebuild — the corpus is read once.
    """
    if min_doc_freq < 2:
        raise ValueError("remove_boilerplate_lines: min_doc_freq must be >= 2")

    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(text_col, "\n")).alias("pos", "line"),
    ).withColumn("norm", F.lower(F.trim("line"))) \
     .withColumn("h", F.xxhash64("norm"))

    flagged = (lines.select("h", "norm", "id").distinct()
               .groupBy("h", "norm").agg(F.count("*").alias("line_df"))
               .where(F.col("line_df") >= min_doc_freq)
               .select("h", "norm", F.lit(True).alias("is_boiler")))

    tagged = (lines.join(F.broadcast(flagged), ["h", "norm"], "left")
              .withColumn("is_boiler",
                          F.coalesce("is_boiler", F.lit(False))))

    kept_struct = F.when(~F.col("is_boiler"),
                         F.struct("pos", "line"))
    return (tagged.groupBy("id")
            .agg(F.count("*").cast("bigint").alias("n_lines"),
                 F.sum(F.col("is_boiler").cast("long"))
                 .cast("bigint").alias("n_removed"),
                 F.concat_ws(
                     "\n",
                     F.transform(
                         F.sort_array(F.collect_list(kept_struct)),
                         lambda s: s.line)).alias("clean_text"))
            .select("id", "clean_text", "n_lines", "n_removed"))
