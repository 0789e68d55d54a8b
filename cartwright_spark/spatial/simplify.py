"""Douglas–Peucker trajectory simplification, distributed.

Semantics (classic DP): per trajectory, recursively keep the interior
point farthest from the chord (s, e) if its perpendicular distance
exceeds eps, and recurse on both halves. EXACT integer arithmetic: the
comparison dist > eps is evaluated as cross^2 > eps2 * len2 (both
int64; degenerate zero-length chords fall back to point distance^2 >
eps2), and the farthest-point tie-break is (max cross^2, then min seq)
— fully deterministic, no floats anywhere.

Distributed shape (the 100 TB audit):
  1. At every round the active intervals TILE each trajectory — every
     interior point belongs to exactly one interval, carried as row
     state (ss, es + chord coords). No range join ever happens.
  2. A round = ONE groupBy (interval) argmax (max(struct) — map-side
     combinable) + ONE equi-join of the split decisions back onto the
     points. Points in non-splitting intervals leave the loop (their
     interval is within eps — they are simplified away), so the active
     set SHRINKS every round.
  3. Rounds = DP recursion depth, capped by ``max_depth``; on cap the
     remaining active points are KEPT (conservative: never simplify
     without proof). Per-round localCheckpoint truncates the iterative
     lineage (the pagerank/BFS pattern).
  4. Reference scope: cartwright has no polyline ops; this is engine
     scope (GPS-trace thinning before map matching / trajectory
     sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def douglas_peucker(pts: DataFrame, tid_col: str = "tid",
                    seq_col: str = "seq", x_col: str = "x",
                    y_col: str = "y", eps2: int = 100,
                    max_depth: int = 12) -> DataFrame:
    """-> (tid, seq, x, y): the kept vertices. Integer coords/seq;
    ``eps2`` = eps squared (exact integer comparisons)."""
    eps2 = int(eps2)
    if eps2 < 0 or max_depth < 1:
        raise ValueError("douglas_peucker: eps2 >= 0, max_depth >= 1")

    p = pts.select(F.col(tid_col).alias("tid"),
                   F.col(seq_col).cast("bigint").alias("seq"),
                   F.col(x_col).cast("bigint").alias("x"),
                   F.col(y_col).cast("bigint").alias("y"))
    ends = (p.groupBy("tid")
            .agg(F.min_by(F.struct("x", "y"), "seq").alias("s0"),
                 F.max_by(F.struct("x", "y"), "seq").alias("e0"),
                 F.min("seq").alias("ss"), F.max("seq").alias("es"))
            .select("tid", "ss", "es",
                    F.col("s0.x").alias("sx"), F.col("s0.y").alias("sy"),
                    F.col("e0.x").alias("ex"), F.col("e0.y").alias("ey")))

    kept = p.join(ends, "tid") \
        .where((F.col("seq") == F.col("ss"))
               | (F.col("seq") == F.col("es"))) \
        .select("tid", "seq", "x", "y")
    active = (p.join(ends, "tid")
              .where((F.col("seq") > F.col("ss"))
                     & (F.col("seq") < F.col("es")))
              .localCheckpoint(eager=True))

    def _metric_thr(df):
        dx, dy = F.col("ex") - F.col("sx"), F.col("ey") - F.col("sy")
        len2 = dx * dx + dy * dy
        cross = (dx * (F.col("y") - F.col("sy"))
                 - dy * (F.col("x") - F.col("sx")))
        pdx, pdy = F.col("x") - F.col("sx"), F.col("y") - F.col("sy")
        metric = F.when(len2 == 0, pdx * pdx + pdy * pdy) \
            .otherwise(cross * cross)
        thr = F.when(len2 == 0, F.lit(eps2)).otherwise(F.lit(eps2) * len2)
        return df.withColumn("metric", metric).withColumn("thr", thr)

    for _ in range(max_depth):
        if active.isEmpty():
            break
        scored = _metric_thr(active)
        best = (scored.groupBy("tid", "ss", "es")
                .agg(F.max(F.struct(F.col("metric"),
                                    (-F.col("seq")).alias("negseq"),
                                    F.col("seq"), F.col("x"),
                                    F.col("y"), F.col("thr")))
                     .alias("b"))
                .where(F.col("b.metric") > F.col("b.thr"))
                .select("tid", "ss", "es",
                        F.col("b.seq").alias("mseq"),
                        F.col("b.x").alias("mx"),
                        F.col("b.y").alias("my")))
        kept = kept.unionByName(
            best.select("tid", F.col("mseq").alias("seq"),
                        F.col("mx").alias("x"), F.col("my").alias("y")))
        active = (active.join(best, ["tid", "ss", "es"])
                  .where(F.col("seq") != F.col("mseq"))
                  .select("tid", "seq", "x", "y",
                          F.when(F.col("seq") > F.col("mseq"),
                                 F.col("mseq")).otherwise(F.col("ss"))
                          .alias("ss"),
                          F.when(F.col("seq") < F.col("mseq"),
                                 F.col("mseq")).otherwise(F.col("es"))
                          .alias("es"),
                          F.when(F.col("seq") > F.col("mseq"),
                                 F.col("mx")).otherwise(F.col("sx"))
                          .alias("sx"),
                          F.when(F.col("seq") > F.col("mseq"),
                                 F.col("my")).otherwise(F.col("sy"))
                          .alias("sy"),
                          F.when(F.col("seq") < F.col("mseq"),
                                 F.col("mx")).otherwise(F.col("ex"))
                          .alias("ex"),
                          F.when(F.col("seq") < F.col("mseq"),
                                 F.col("my")).otherwise(F.col("ey"))
                          .alias("ey"))
                  .localCheckpoint(eager=True))

    # depth cap: keep what remains unproven (never over-simplify)
    return kept.unionByName(active.select("tid", "seq", "x", "y"))
