"""Deterministic stratified sampling + sequence packing."""

import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cartwright_spark.operators.sampling import (
    hash_stratified_sample,
    pack_sequences,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string"))
        .alias("source"))


def test_stratified_rates_and_determinism(spark):
    df = _docs(spark)
    rates = {"src0": 0.8, "src1": 0.5, "src2": 0.1, "src3": 0.0}
    kept = hash_stratified_sample(df, "source", rates, "doc_id", salt="s")
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts.get("src3", 0) == 0
    for src, rate in (("src0", 0.8), ("src1", 0.5), ("src2", 0.1)):
        got = counts.get(src, 0) / 500
        assert abs(got - rate) < 0.08, (src, got)
    # identical across physical layout: the decision is row-local
    re = hash_stratified_sample(df.repartition(17), "source", rates,
                                "doc_id", salt="s")
    assert sorted(r["doc_id"] for r in re.collect()) == \
        sorted(r["doc_id"] for r in kept.collect())


def test_stratified_samples_nest(spark):
    """Raising a rate strictly grows the sample (threshold semantics) —
    the property that makes mixture re-weighting reproducible."""
    df = _docs(spark)
    small = {r["doc_id"] for r in hash_stratified_sample(
        df, "source", {"src0": 0.2}, "doc_id").collect()}
    big = {r["doc_id"] for r in hash_stratified_sample(
        df, "source", {"src0": 0.6}, "doc_id").collect()}
    assert small and small < big


def test_pack_sequences_matches_global_cumsum(spark):
    """The distributed two-pass scan must equal the naive single-task
    global-window formulation exactly, including docs straddling pack
    boundaries and zero-token docs."""
    pdf = pd.DataFrame({
        "doc_id": range(500),
        "toks": [(i * 37) % 700 for i in range(500)],
    })
    pdf.loc[3, "toks"] = 0          # empty doc
    pdf.loc[7, "toks"] = 9000       # spans >2 packs
    df = spark.createDataFrame(pdf).repartition(13)

    got = pack_sequences(df, "toks", 1024, "doc_id", partitions=8)
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    naive = (df.withColumn("cb", F.coalesce(F.sum("toks").over(w), F.lit(0)))
             .select("doc_id", F.col("toks").cast("long").alias("n_tokens"),
                     F.floor(F.col("cb") / 1024).alias("pack_id"),
                     (F.col("cb") % 1024).alias("pack_offset"),
                     F.floor((F.col("cb")
                              + F.greatest(F.col("toks") - 1, F.lit(0)))
                             / 1024).alias("end_pack")))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, naive.collect()))
    rows = {r["doc_id"]: r for r in got.collect()}
    assert rows[7]["end_pack"] > rows[7]["pack_id"]        # straddles
    assert rows[3]["n_tokens"] == 0


def test_pack_sequences_data_window_is_partitioned(spark):
    """Plan gate: the data-scale window must be keyed on the range
    partition id; only the P-row totals window may be global."""
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 300).alias("toks"))
    plan = pack_sequences(df, "toks", 512, "doc_id", partitions=8) \
        ._jdf.queryExecution().executedPlan().toString()
    windows = [l for l in plan.splitlines() if "Window" in l and
               "windowspecdefinition" in l]
    partitioned = [l for l in windows if "__pid" in l.split("], [")[0] or
                   "[__pid" in l]
    assert windows, plan
    # the cumsum-over-rows window carries __pid as its partition spec
    assert any("__pid" in l for l in windows), plan


def test_stratum_cap_equals_naive_on_skewed_data(spark):
    """2-phase cap sample ≡ the naive one-window form on a zipfian
    layout (one stratum with 5k rows, one with 3 — exercises both the
    under-cap bypass and the pre-filtered rank)."""
    from cartwright_spark.operators.sampling import (
        det_hash_u32,
        stratum_cap_sample,
        validate_stratum_cap,
    )

    df = spark.range(5003).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 5000, "hot").otherwise("cold").alias("src"))
    out = stratum_cap_sample(df, "src", 100, "doc_id", salt="t")
    naive = (df.withColumn("__h", det_hash_u32(F.col("doc_id"), "t"))
             .withColumn("rk", F.row_number().over(
                 W.partitionBy("src").orderBy("__h", "doc_id")))
             .where(F.col("rk") <= 100).select("doc_id", "src"))
    assert sorted(map(tuple, out.select("doc_id", "src").collect())) == \
        sorted(map(tuple, naive.collect()))
    validate_stratum_cap(df, out, "src", 100)
    by = {r["src"]: r["n"] for r in
          out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert by == {"hot": 100, "cold": 3}


def test_stratum_cap_layout_invariant(spark):
    from cartwright_spark.operators.sampling import stratum_cap_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"))
    a = stratum_cap_sample(df, "src", 50, "doc_id")
    b = stratum_cap_sample(df.repartition(23), "src", 50, "doc_id")
    assert sorted(r["doc_id"] for r in a.collect()) == \
        sorted(r["doc_id"] for r in b.collect())


# -------------------------------------------------------- weighted A-ES

def _aes_naive(rows, k, salt="", by_group=False):
    """Reference Efraimidis-Spirakis draw with the same hash uniforms."""
    import hashlib
    import math

    def key(doc_id, w):
        h = int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8], 16)
        return math.log((h + 0.5) / 2 ** 32) / w

    rows = [(i, g, w) for i, g, w in rows if w is not None and w > 0]
    if by_group:
        out = set()
        for grp in {g for _, g, _ in rows}:
            sub = sorted((r for r in rows if r[1] == grp),
                         key=lambda r: (-key(r[0], r[2]), r[0]))
            out |= {r[0] for r in sub[:k]}
        return out
    return {r[0] for r in sorted(rows, key=lambda r: (-key(r[0], r[2]),
                                                      r[0]))[:k]}


def _wdocs(spark, n=3000):
    rows = [(i, f"g{i % 5}",
             None if i % 97 == 0 else (0 if i % 31 == 0 else (i % 50) + 1))
            for i in range(n)]
    return rows, spark.createDataFrame(
        rows, "doc_id: long, source: string, w: int")


def test_weighted_sample_grouped_equals_naive(spark):
    from cartwright_spark.operators.sampling import weighted_sample
    rows, df = _wdocs(spark)
    got = {r["doc_id"] for r in
           weighted_sample(df, "w", 15, "doc_id", group_col="source",
                           salt="t1").collect()}
    assert got == _aes_naive(rows, 15, salt="t1", by_group=True)
    assert len(got) == 5 * 15


def test_weighted_sample_global_equals_naive_and_takeordered(spark):
    from cartwright_spark.operators.sampling import weighted_sample
    rows, df = _wdocs(spark)
    samp = weighted_sample(df, "w", 40, "doc_id", salt="t2")
    got = {r["doc_id"] for r in samp.collect()}
    assert got == _aes_naive(rows, 40, salt="t2")
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan  # partial top-k, never a full sort


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from cartwright_spark.operators.sampling import weighted_sample
    rows, df = _wdocs(spark, 400)
    bad = {i for i, _, w in rows if w is None or w <= 0}
    got = {r["doc_id"] for r in
           weighted_sample(df, "w", 400, "doc_id",
                           group_col="source").collect()}
    assert not (got & bad)


def test_weighted_sample_leans_toward_heavy_weights(spark):
    from cartwright_spark.operators.sampling import weighted_sample
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, F.lit(100)).otherwise(F.lit(1))
        .alias("w"))
    got = [r["doc_id"] for r in
           weighted_sample(df, "w", 100, "doc_id", salt="t3").collect()]
    heavy = sum(1 for i in got if i < 1000)
    assert heavy > 85  # 100:1 odds; uniform draw would give ~50


# ------------------------------------------------------------- skyline

def _sky(spark, rows):
    return spark.createDataFrame(
        [("g", i, int(x), int(y)) for i, (x, y) in enumerate(rows)],
        "grp string, id long, x long, y long")


def test_pareto_front_hand_case(spark):
    """Staircase front survives; interior and weakly-dominated points
    drop."""
    from cartwright_spark.operators.skyline import pareto_front
    rows = [(10, 1), (8, 5), (5, 8), (1, 10),   # the front
            (7, 4),                              # dominated by (8,5)
            (8, 4),                              # dominated by (8,5) (tie x)
            (5, 5),                              # dominated by (8,5)/(5,8)
            (1, 1)]                              # dominated by everything
    out = sorted((r.x, r.y) for r in
                 pareto_front(_sky(spark, rows)).collect())
    assert out == [(1, 10), (5, 8), (8, 5), (10, 1)]


def test_pareto_front_duplicates_keep_one(spark):
    from cartwright_spark.operators.skyline import pareto_front
    rows = [(5, 5), (5, 5), (3, 7)]
    out = pareto_front(_sky(spark, rows)).collect()
    assert sorted((r.x, r.y) for r in out) == [(3, 7), (5, 5)]
    # deterministic survivor: the lowest id among the duplicates
    assert {r.id for r in out} == {0, 2}


def test_pareto_front_brute_parity_groups(spark):
    """400 deterministic points in 3 groups vs the O(n^2) dominance
    definition."""
    from cartwright_spark.operators.skyline import pareto_front
    import numpy as np
    k = np.arange(400)
    g = (k % 3).astype(str)
    x = (k * 37 % 53).astype(int)
    y = (k * 61 % 47).astype(int)
    df = spark.createDataFrame(
        [(str(gi), int(i), int(xi), int(yi))
         for i, (gi, xi, yi) in enumerate(zip(g, x, y))],
        "grp string, id long, x long, y long")
    got = {(r.grp, r.x, r.y) for r in pareto_front(df).collect()}
    want = set()
    seen = set()
    for grp in "012":
        m = g == grp
        pts = list(zip(x[m], y[m]))
        for (xi, yi) in pts:
            dominated = any((xj >= xi and yj >= yi and (xj > xi or yj > yi))
                            for xj, yj in pts)
            if not dominated and (grp, xi, yi) not in seen:
                want.add((grp, xi, yi))
                seen.add((grp, xi, yi))
    assert got == want
