"""Dominant embedding direction by distributed power iteration.

The first spectral question a training-data curator asks of an
embedding table: "is there one direction that dominates the corpus?"
(an uncentered top principal component / leading right singular
vector). A high variance ratio on the leading direction flags a
degenerate embedding space — anisotropy, a stuck encoder, or a corpus
collapsed onto one topic — the standard pre-flight before ANN indexing
or cosine dedup (both degrade badly in anisotropic spaces).

Power iteration on A = sum_i x_i x_i^T without ever materializing A
(d x d never exists; only matvecs):

    dot_i = x_i . v          (one corpus pass, groupBy id)
    s_j   = sum_i x_ij dot_i (one corpus pass, groupBy dim)
    v     = s / ||s||        (d numbers — driver-side, metadata scale)

Scale shape (the 100 TB audit): the exploded (id, dim, x) table is
checkpointed ONCE and reused by every iteration; each iteration is two
algebraic groupBys over it (map-side partials — no skew exposure: keys
are ids and the d dimension indices). The vector v is d floats,
broadcast each round; d*iters driver numbers total. No UDFs, no
windows, no d x d anything.

Determinism across engines: both engines run the IDENTICAL recipe
(double-cast inputs, same normalization expression); float-sum
association differs at ~1e-15 relative, and power iteration is
contractive toward the dominant eigenvector, so divergence cannot
amplify — well inside the 6-dp compare (the pagerank/HITS posture).

Reference scope note: jataware/cartwright has no embedding layer;
engine scope for the similarity-search axis beside
operators/simsearch.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dominant_direction(emb: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       iters: int = 8) -> DataFrame:
    """-> d rows (dim, loading, eigval, var_total, var_ratio):
    the unit leading direction, its Rayleigh-quotient estimate
    eigval = ||A v|| after ``iters`` rounds, the total uncentered
    variance sum_i |x_i|^2, and their ratio (fraction of variance on
    the leading direction, 1/d <= ratio <= 1)."""
    if iters < 1:
        raise ValueError("dominant_direction: iters must be >= 1")
    spark = emb.sparkSession
    rows = (emb.select(F.col(id_col).alias("id"),
                       F.posexplode(F.col(vec_col)).alias("j", "x0"))
            .select("id", "j", F.col("x0").cast("double").alias("x"))
            .localCheckpoint(eager=True))
    d = rows.agg(F.max("j")).first()[0]
    if d is None:
        raise ValueError("dominant_direction: no vectors")
    d = int(d) + 1

    v = [1.0 / math.sqrt(d)] * d
    norm = None
    for _ in range(iters):
        vdf = spark.createDataFrame(
            [(j, v[j]) for j in range(d)], "j int, v double")
        dots = (rows.join(F.broadcast(vdf), "j")
                .groupBy("id")
                .agg(F.sum(F.col("x") * F.col("v")).alias("dot")))
        s_rows = (rows.join(dots, "id")
                  .groupBy("j")
                  .agg(F.sum(F.col("x") * F.col("dot")).alias("s"))
                  .collect())
        s = [0.0] * d
        for r in s_rows:
            s[r["j"]] = r["s"]
        norm = math.sqrt(sum(si * si for si in s))
        if norm == 0.0:
            raise ValueError("dominant_direction: zero matvec — "
                             "degenerate (all-zero) embeddings")
        v = [si / norm for si in s]

    var_total = rows.agg(
        F.sum(F.col("x") * F.col("x")).alias("t")).first()["t"]
    return spark.createDataFrame(
        [(j, v[j], norm, var_total, norm / var_total) for j in range(d)],
        "dim int, loading double, eigval double, var_total double, "
        "var_ratio double")
