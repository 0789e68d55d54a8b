"""Dynamic time warping distance for trace pairs — the alignment-aware
similarity the trajectory tier (trajectory_sessions, stay_points,
hausdorff_pairs) needs when two traces sample the same path at
different speeds: hausdorff ignores ordering, euclidean ignores
phase shift; DTW is the standard elastic measure (Sakoe & Chiba 1978).

This is the honest Pandas-kernel tier: the DP recurrence

    D(i,j) = |a_i - b_j| + min(D(i-1,j), D(i,j-1), D(i-1,j-1))

is inherently sequential per pair, inexpressible in joins/windows — the
documented (b)-case from the brief (mapInPandas where built-ins can't
express the semantics). y is INTEGER-quantized by the caller, so the
whole DP is int64-exact and the oracle (the DP unrolled over
anti-diagonals into generated CTEs) matches bit-for-bit.

Scale shape: each trace is gathered ONCE into a sorted array (one
groupBy); arrays attach to the pair list via two equi-joins; the DP
runs per pair inside mapInPandas over NARROW array columns — pairs
parallelize embarrassingly, no shuffle inside the kernel. The guard is
per-pair DP AREA (n*m), not count: ``max_cells`` raises loudly before
a quadratic blowup, the same output-capping discipline as kNN's
fallback guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dtw_int(a, b) -> int:
    """int64-exact DTW with D(0,0)=0 and infinite borders."""
    import numpy as np
    n, m = len(a), len(b)
    inf = np.iinfo(np.int64).max // 4
    b_arr = np.asarray(b, dtype=np.int64)
    prev = np.full(m + 1, inf, dtype=np.int64)
    prev[0] = 0
    for i in range(1, n + 1):
        cur = np.full(m + 1, inf, dtype=np.int64)
        cost = np.abs(int(a[i - 1]) - b_arr)
        for j in range(1, m + 1):
            p = prev[j]
            if prev[j - 1] < p:
                p = prev[j - 1]
            if cur[j - 1] < p:
                p = cur[j - 1]
            cur[j] = cost[j - 1] + p
        prev = cur
    return int(prev[m])


def dtw_pairs(traces: DataFrame, pairs: DataFrame,
              id_col: str = "trace_id", pos_col: str = "pos",
              y_col: str = "y", a_col: str = "a_id",
              b_col: str = "b_id",
              max_cells: int = 4_000_000) -> DataFrame:
    """-> (a_id, b_id, n, m, dtw) for every row of ``pairs``.
    ``traces`` holds (trace_id, pos, y:int); y must be integer-valued
    (quantize upstream) for the exactness contract."""
    if max_cells < 4:
        raise ValueError("max_cells must be >= 4")
    seqs = (traces.groupBy(F.col(id_col).alias("t"))
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col(pos_col).alias("p"),
                             F.col(y_col).cast("bigint").alias("y")))),
                lambda s: s["y"]).alias("seq")))
    j = (pairs.select(F.col(a_col).alias("a_id"),
                      F.col(b_col).alias("b_id"))
         .join(seqs.select(F.col("t").alias("a_id"),
                           F.col("seq").alias("seq_a")), "a_id")
         .join(seqs.select(F.col("t").alias("b_id"),
                           F.col("seq").alias("seq_b")), "b_id")
         .withColumn("__area", F.size("seq_a") * F.size("seq_b"))
         .withColumn("__guard",
                     F.when(F.col("__area") > F.lit(int(max_cells)),
                            F.raise_error(F.concat(
                                F.lit("dtw_pairs: DP area "),
                                F.col("__area").cast("string"),
                                F.lit(" exceeds max_cells"))))
                     .otherwise(F.lit(0))))

    schema = ("a_id long, b_id long, n int, m int, dtw long"
              if dict(j.dtypes)["a_id"] == "bigint"
              else "a_id string, b_id string, n int, m int, dtw long")

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                a, b = list(r.seq_a), list(r.seq_b)
                out.append((r.a_id, r.b_id, len(a), len(b),
                            _dtw_int(a, b)))
            yield pd.DataFrame(out, columns=["a_id", "b_id", "n", "m",
                                             "dtw"])

    return (j.select("a_id", "b_id", "seq_a", "seq_b", "__guard")
            .mapInPandas(kernel, schema))
