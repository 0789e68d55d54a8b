"""PII redaction + n-gram decontamination."""

import pandas as pd
from pyspark.sql import functions as F

from cartwright_spark.operators.hygiene import (
    contamination_check,
    redact_pii,
)


def test_redact_pii_classes_and_counts(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "mail me at a.b+x@test.org or c@d.io thanks",
            "server 192.168.001.250 logged 123456789012 events",
            "clean text with no secrets at all",
        ]}))
    rows = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_ipv4"] == 0
    assert "a.b+x@test.org" not in rows[1]["redacted"]
    assert rows[1]["redacted"].count("<PII>") == 2
    assert rows[2]["n_ipv4"] == 1 and rows[2]["n_digit_run"] == 1
    assert "192.168" not in rows[2]["redacted"]
    assert rows[3]["n_email"] == rows[3]["n_ipv4"] == \
        rows[3]["n_digit_run"] == 0
    assert rows[3]["redacted"] == rows[3]["text"]


def test_contamination_hits_and_misses(spark):
    probe_text = "the quick brown fox jumps over the lazy dog again and again ok"
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # contains the probe verbatim (13 words) mid-document
            "prefix words " + probe_text + " suffix words",
            # shares only a 12-word prefix of the probe — no 13-gram hit
            "the quick brown fox jumps over the lazy dog again and again",
            "completely unrelated content here",
        ]}))
    probes = spark.createDataFrame(pd.DataFrame({"probe": [probe_text]}))
    rows = {r["doc_id"]: r.asDict()
            for r in contamination_check(docs, probes).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_hits"] == 1 and rows[1]["n_probes_hit"] == 1


def test_contamination_counts_multiplicity(spark):
    probe = " ".join(f"w{i}" for i in range(13))
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [9],
        "text": [probe + " filler " + probe]}))   # probe appears twice
    probes = spark.createDataFrame(pd.DataFrame({"probe": [probe]}))
    row = contamination_check(docs, probes).collect()[0]
    assert row["n_hits"] == 2 and row["n_probes_hit"] == 1


def test_contamination_join_is_broadcast(spark):
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1], "text": ["some words " * 20]}))
    probes = spark.createDataFrame(pd.DataFrame(
        {"probe": [" ".join(f"p{i}" for i in range(13))]}))
    plan = contamination_check(docs, probes) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --- remove_boilerplate_lines (CCNet line dedup) -----------------------


def test_boilerplate_removed_and_order_preserved(spark):
    from cartwright_spark.operators.hygiene import remove_boilerplate_lines
    docs = spark.createDataFrame(
        [(i, f"unique head {i}\nFOOTER\nbody {i}\n  footer \ntail {i}")
         for i in range(5)] + [(99, "FOOTER\nFooter")],
        ["doc_id", "text"])
    out = {r.id: r for r in
           remove_boilerplate_lines(docs, min_doc_freq=4).collect()}
    for i in range(5):
        # both footer variants normalize to 'footer' (df=6 >= 4): gone;
        # survivors keep original order and original (unnormalized) text
        assert out[i].clean_text == f"unique head {i}\nbody {i}\ntail {i}"
        assert (out[i].n_lines, out[i].n_removed) == (5, 2)
    assert out[99].clean_text == ""          # all lines boilerplate
    assert (out[99].n_lines, out[99].n_removed) == (2, 2)


def test_boilerplate_df_is_distinct_docs(spark):
    # one doc repeating a line 10x must not push it over the threshold
    from cartwright_spark.operators.hygiene import remove_boilerplate_lines
    spammy = "\n".join(["repeat me"] * 10)
    docs = spark.createDataFrame(
        [(1, spammy), (2, "repeat me\nkeep"), (3, "a\nb")],
        ["doc_id", "text"])
    out = {r.id: r for r in
           remove_boilerplate_lines(docs, min_doc_freq=3).collect()}
    assert out[1].n_removed == 0 and out[2].n_removed == 0


def test_boilerplate_guard(spark):
    from cartwright_spark.operators.hygiene import remove_boilerplate_lines
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    import pytest as _pt
    with _pt.raises(ValueError):
        remove_boilerplate_lines(docs, min_doc_freq=1)
