"""HBOS — histogram-based outlier scores (Goldstein & Dengel 2012):
per-feature equal-width histogram densities, outlier score

    hbos(x) = sum_j ln( N / c_{j, bin_j(x)} )

Rare bins inflate the score; the independence assumption makes it
embarrassingly decomposable — which is exactly why it is the
anomaly screen that actually runs at corpus scale (vs. isolation
forests' random state or kNN's pair explosion).

Scale shape: min/max per feature ride in as ONE broadcast row; the k
per-feature bin histograms come from ONE melted pass (explode to
(feature, bin), a single algebraic groupBy producing <= k*B rows);
scores attach via k BROADCAST joins on the tiny per-feature count
dims, so duplicate input rows flow through untouched (no row-key
groupBy — lineitem carries duplicate point ids at every SF) and the
corpus is scanned twice total (stats+counts, then scoring).

Float determinism: the bin index and ln(N/c) are written in the exact
expression shape the oracle replays ((x-mn)/(mx-mn)*B then floor;
ln of the quotient, not ln-difference), so IEEE doubles agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hbos_scores(df: DataFrame, feature_cols: list,
                bins: int = 16) -> DataFrame:
    """-> ``df`` plus an ``hbos`` double column. Constant features
    (min == max) collapse to one bin and contribute exactly ln(1) = 0."""
    if not feature_cols:
        raise ValueError("feature_cols must name at least one column")
    if bins < 2 or bins > 100_000:
        raise ValueError("bins must be in [2, 1e5]")
    k = len(feature_cols)

    aggs = []
    for j, c in enumerate(feature_cols):
        aggs += [F.min(F.col(c).cast("double")).alias(f"__mn{j}"),
                 F.max(F.col(c).cast("double")).alias(f"__mx{j}")]
    stats = df.agg(*aggs)

    binned = df.crossJoin(F.broadcast(stats))
    for j, c in enumerate(feature_cols):
        x = F.col(c).cast("double")
        mn, mx = F.col(f"__mn{j}"), F.col(f"__mx{j}")
        b = F.when(mx == mn, F.lit(0)).otherwise(
            F.least(F.floor((x - mn) / (mx - mn) * F.lit(int(bins))),
                    F.lit(int(bins) - 1))).cast("int")
        binned = binned.withColumn(f"__bin{j}", b)

    melted = (binned.select(F.explode(F.array(*[
        F.struct(F.lit(j).alias("feat"),
                 F.col(f"__bin{j}").alias("bin"))
        for j in range(k)])).alias("fb"))
        .select("fb.feat", "fb.bin"))
    counts = (melted.groupBy("feat", "bin")
              .agg(F.count(F.lit(1)).alias("c")))
    tot = (counts.where(F.col("feat") == 0)
           .agg(F.sum("c").alias("__n_total")))

    out = binned.crossJoin(F.broadcast(tot))
    for j in range(k):
        cj = (counts.where(F.col("feat") == j)
              .select(F.col("bin").alias(f"__bin{j}"),
                      F.col("c").alias(f"__cnt{j}")))
        out = out.join(F.broadcast(cj), f"__bin{j}")

    score = None
    for j in range(k):
        term = F.log(F.col("__n_total").cast("double")
                     / F.col(f"__cnt{j}"))
        score = term if score is None else score + term
    drop = ([f"__bin{j}" for j in range(k)]
            + [f"__cnt{j}" for j in range(k)]
            + [f"__mn{j}" for j in range(k)]
            + [f"__mx{j}" for j in range(k)] + ["__n_total"])
    return out.withColumn("hbos", score).drop(*drop)
