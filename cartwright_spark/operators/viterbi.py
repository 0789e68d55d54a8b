"""Viterbi decoding over integer-scored HMMs — the sequence-labeling
primitive (session intent tagging, bot/human run segmentation, crawl
state inference) that completes the DP tier next to dtw_pairs: DTW
aligns two sequences, Viterbi labels one against a model.

Scores live in the MAX-PLUS integer semiring (log-domain weights
pre-quantized to int64 by the caller), so the whole recurrence

    v_1(s)   = init(s) + emit(s, o_1)
    v_t(s)   = max_{s'} ( v_{t-1}(s') + trans(s', s) ) + emit(s, o_t)

is exact — no float probabilities, no underflow, and the oracle (the
recurrence unrolled per time step into generated CTEs) matches
bit-for-bit. Ties break toward the LARGER previous state at every
step and the larger final state, the same deterministic rule the SQL
max(struct(score, state, path)) comparison implements.

Model weights are FUNCTIONS (s', s) -> int and (s, o) -> int supplied
by the caller and evaluated inside the kernel; the contract query uses
closed-form modular arithmetic both engines replay.

Scale shape: one groupBy gathers each sequence's observations into a
sorted array; the DP runs per sequence inside mapInPandas over narrow
columns — sequences parallelize embarrassingly, state-count x length
work per row, no shuffle inside the kernel (the dtw_pairs shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def viterbi_decode(obs: DataFrame, n_states: int,
                   init_w, trans_w, emit_w,
                   seq_col: str = "seq_id", t_col: str = "t",
                   obs_col: str = "obs",
                   max_len: int = 100_000) -> DataFrame:
    """-> (seq_id, best_state, score, path) per sequence; ``path`` is
    '>'-joined state ids along the argmax trajectory. ``init_w(s)``,
    ``trans_w(s_prev, s)``, ``emit_w(s, o)`` must return ints."""
    if n_states < 2 or n_states > 4096:
        raise ValueError("n_states must be in [2, 4096]")
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    seqs = (obs.groupBy(F.col(seq_col).alias("sid"))
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col(t_col).alias("t"),
                             F.col(obs_col).cast("bigint").alias("o")))),
                lambda s: s["o"]).alias("os")))

    id_type = dict(seqs.dtypes)["sid"]
    schema = (f"seq_id {id_type}, best_state int, score long, "
              "path string")
    S = int(n_states)

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                o = list(r.os)
                if len(o) > max_len:
                    raise ValueError(
                        f"viterbi_decode: sequence {r.sid} has "
                        f"{len(o)} > max_len observations")
                if not o:
                    continue
                # v[s], path[s]; ties at every step -> larger s_prev
                v = [init_w(s) + emit_w(s, o[0]) for s in range(S)]
                path = [str(s) for s in range(S)]
                for t in range(1, len(o)):
                    nv, npath = [], []
                    for s in range(S):
                        best, bp = None, None
                        for sp in range(S):
                            c = v[sp] + trans_w(sp, s)
                            if best is None or c > best or \
                                    (c == best and sp > bp):
                                best, bp = c, sp
                        nv.append(best + emit_w(s, o[t]))
                        npath.append(path[bp] + ">" + str(s))
                    v, path = nv, npath
                bs = max(range(S), key=lambda s: (v[s], s))
                out.append((r.sid, bs, v[bs], path[bs]))
            yield pd.DataFrame(out, columns=["seq_id", "best_state",
                                             "score", "path"])

    return seqs.mapInPandas(kernel, schema)
