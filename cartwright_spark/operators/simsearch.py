"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set, score
every corpus vector with pure zip_with/aggregate expressions, take top-k per
query with a window. Scale path: random-hyperplane LSH bucketing (IVF-style
candidate pruning) — queries only score vectors in matching buckets, with
multi-probe to keep recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "qid", qvec_col: str = "qvec") -> DataFrame:
    """(qid, neighbor_id, rank, cosine) — exact top-k. The query side is
    broadcast; scoring is a single scan of the corpus (no shuffle besides
    the final per-query top-k)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col(qvec_col).cast("array<double>").alias("qv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "neighbor_id",
        (_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))))
        .alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def cosine_threshold_pairs(emb: DataFrame, threshold: float,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine ≥ threshold → (id_a, id_b), id_a < id_b.

    The naive formulation (self-join + F.aggregate dot product) evaluates
    an interpreted 64-dim fold per candidate pair — measured 45 s for
    5k vectors at sf0.1. Here the whole vector set is collected once
    (embedding dims are driver-scale: n×d floats), broadcast as a numpy
    matrix, and each partition computes a vectorized block×all matmul in
    mapInPandas — no shuffle, no join, numpy throughout. At corpus scales
    where the matrix no longer broadcasts, the LSH-blocked
    `embedding_near_dups` is the scale path."""
    import pandas as pd
    from pyspark.sql import types as T

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sc = emb.sparkSession.sparkContext
    b = sc.broadcast((ids, Vn))

    schema = T.StructType([T.StructField("id_a", T.LongType()),
                           T.StructField("id_b", T.LongType())])

    def fn(batches):
        all_ids, all_vn = b.value
        for pdf in batches:
            bid = pdf[id_col].to_numpy(np.int64)
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            S = M @ all_vn.T                       # (batch, n)
            hit = (S >= threshold) & (bid[:, None] < all_ids[None, :])
            r, c = np.nonzero(hit)
            yield pd.DataFrame({"id_a": bid[r], "id_b": all_ids[c]})

    return emb.select(id_col, vec_col).mapInPandas(fn, schema)


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      qid_col: str = "qid", qvec_col: str = "qvec",
                      n_planes: int = 6, seed: int = 7,
                      multiprobe: int = 1,
                      dim: int | None = None) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets prune candidates; each
    query probes its own bucket plus all buckets within Hamming distance
    `multiprobe` (explode), then exact cosine on the survivors."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        return pd.Series((signs @ (1 << np.arange(n_planes))).astype(np.int32))

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    c = c.withColumn("bucket", bucket(F.col("v")))
    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col(qvec_col).cast("array<double>").alias("qv"))
    q = q.withColumn("qbucket", bucket(F.col("qv")))

    # multiprobe: enumerate bucket ids within hamming distance `multiprobe`
    # of the query's own bucket (xor with every ≤multiprobe-bit mask). The
    # probe fan-out is a query-side explode — the corpus is scanned once and
    # each query row joins C(n_planes,≤m) buckets, still a bucket-pruned
    # equi-join, no cross product.
    from itertools import combinations
    masks = [0]
    for m in range(1, multiprobe + 1):
        masks += [sum(1 << i for i in c)
                  for c in combinations(range(n_planes), m)]
    probes = [F.col("qbucket").bitwiseXOR(F.lit(mk)) for mk in masks]
    q = q.withColumn("bucket", F.explode(F.array(*probes)))

    scored = c.join(F.broadcast(q), "bucket").select(
        "qid", "neighbor_id",
        (_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))))
        .alias("cosine"),
    ).dropDuplicates(["qid", "neighbor_id"])
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
