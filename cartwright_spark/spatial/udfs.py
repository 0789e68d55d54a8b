"""Arrow-batched UDF wrappers around the spatial kernels."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from cartwright_spark.spatial import s2 as _s2


def s2_cell_udf(level: int):
    @pandas_udf("long")
    def f(lat: pd.Series, lon: pd.Series) -> pd.Series:
        import numpy as np
        cid = _s2.latlng_to_cell(lat.to_numpy(np.float64), lon.to_numpy(np.float64), level)
        return pd.Series(cid.astype(np.int64))  # two's-complement long; order-preserving per face
    return f


def s2_cell(lat: Column, lon: Column, level: int) -> Column:
    return s2_cell_udf(level)(lat, lon)


def with_s2_cell(df, lat_col: str, lon_col: str, level: int,
                 out_col: str = "s2_cell"):
    """All-JVM S2 encode, staged through named intermediate columns.

    Same math as `s2_cell_expr` (parity-tested against spatial/s2.py),
    but each multi-referenced intermediate (xyz, face, u/v, i/j, the 8
    Hilbert-walk states) is materialized as a column in its own
    projection. Catalyst's CollapseProject inlines only cheap or
    once-referenced producers, so the logical tree stays LINEAR — the
    pure-Column form duplicates the i/j/face subtrees into every walk
    step and balloons to ~150k nodes (measured ~16 s of analysis per
    query). This is the hot-path form: whole-stage codegen end to end,
    zero Python workers, ~sub-second analysis.

    Measured trade-off vs the numpy pandas UDF (3M rows, local[1..32]):
    the UDF's vectorized trig is ~1 µs/row faster in steady state, but
    costs Python-worker pools (cold start, memory) and an Arrow boundary
    that splits codegen. Rule used in this engine: bulk re-encode jobs
    over millions of rows with warm workers use `s2_cell`; latency-
    sensitive or fused paths (pipeline stages, PIP, rollups) use this.

    The staged (name, Column) plan is memoized per (gateway, cols,
    level): building the walk tree costs ~7k py4j round-trips ≈ 1 s of
    driver latency (measured via cProfile on q_j6_pip_boxes); the
    Columns reference column NAMES only, so one build serves every
    DataFrame."""
    stages, temps = _s2_stage_plan(lat_col, lon_col, level, out_col)
    for name, c in stages:
        df = df.withColumn(name, c)
    return df.drop(*temps)


_S2_STAGE_MEMO: dict = {}


def _s2_stage_plan(lat_col: str, lon_col: str, level: int, out_col: str):
    from pyspark import SparkContext
    sc = SparkContext._active_spark_context
    key = (id(sc._gateway) if sc is not None else None,
           lat_col, lon_col, level, out_col)
    hit = _S2_STAGE_MEMO.get(key)
    if hit is not None:
        return hit
    from pyspark.sql import functions as F

    stages: list = []

    lat, lon = F.col(lat_col), F.col(lon_col)
    phi, theta = F.radians(lat), F.radians(lon)
    cosphi = F.cos(phi)
    stages.append(("__s2x", F.cos(theta) * cosphi))
    stages.append(("__s2y", F.sin(theta) * cosphi))
    stages.append(("__s2z", F.sin(phi)))
    x, y, z = F.col("__s2x"), F.col("__s2y"), F.col("__s2z")
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    stages.append((
        "__s2f0",
        F.when(ax >= ay, F.when(ax >= az, F.lit(0)).otherwise(F.lit(2)))
        .otherwise(F.when(ay >= az, F.lit(1)).otherwise(F.lit(2)))))
    f0 = F.col("__s2f0")
    major = F.when(f0 == 0, x).when(f0 == 1, y).otherwise(z)
    stages.append(("__s2f", F.when(major < 0, f0 + 3).otherwise(f0)))
    face = F.col("__s2f")
    stages.append((
        "__s2u",
        F.when(face == 0, y / x).when(face == 1, -x / y)
        .when(face == 2, -x / z).when(face == 3, z / x)
        .when(face == 4, z / y).otherwise(-y / z)))
    stages.append((
        "__s2v",
        F.when(face == 0, z / x).when(face == 1, z / y)
        .when(face == 2, -y / z).when(face == 3, y / x)
        .when(face == 4, -x / y).otherwise(-x / z)))

    def st(w):
        return F.when(w >= 0, 0.5 * F.sqrt(1 + 3 * w)) \
            .otherwise(1 - 0.5 * F.sqrt(1 - 3 * w))

    def ij(s):
        raw = (s * F.lit(float(1 << 30))).cast("long")
        return F.greatest(F.lit(0).cast("long"),
                          F.least(F.lit((1 << 30) - 1).cast("long"), raw))

    stages.append(("__s2i", ij(st(F.col("__s2u")))))
    stages.append(("__s2j", ij(st(F.col("__s2v")))))
    i, j = F.col("__s2i"), F.col("__s2j")

    # element_at on an array<int> literal is O(1); in this STAGED form the
    # 1024-literal array appears once per walk step (8 copies — fine),
    # unlike the pure-Column form where it multiplied with the chain. The
    # substr-on-string encoding tried first was O(position) byte scanning
    # per probe (UTF8String counts codepoints) — 5× slower at 600k rows.
    lut = F.lit([int(t) for t in _s2._lookup_pos.tolist()])
    stages.append(("__s2bits8", face.cast("long").bitwiseAND(F.lit(1))))
    temps = ["__s2x", "__s2y", "__s2z", "__s2f0", "__s2f", "__s2u", "__s2v",
             "__s2i", "__s2j", "__s2bits8"]
    # the parent mask keeps only position bits ≥ 2*(30-level); the Hilbert
    # walk flows high chunk → low chunk, so any step whose whole 8-bit
    # window falls under the mask can be skipped entirely — level 10 needs
    # 3 of the 8 steps, level 16 needs 5
    k_min = max(0, (2 * (30 - level) - 8) // 8 + 1) if level < 30 else 0
    steps = list(range(7, k_min - 1, -1))
    prev_bits = F.col("__s2bits8")
    for k in steps:
        b = (prev_bits
             + F.shiftleft(F.shiftrightunsigned(i, 4 * k)
                           .bitwiseAND(F.lit(15)), 6)
             + F.shiftleft(F.shiftrightunsigned(j, 4 * k)
                           .bitwiseAND(F.lit(15)), 2))
        stages.append((
            f"__s2t{k}",
            F.element_at(lut, (b + 1).cast("int")).cast("long")))
        temps.append(f"__s2t{k}")
        prev_bits = F.col(f"__s2t{k}").bitwiseAND(F.lit(3))
    n = F.lit(0).cast("long")
    for k in steps:
        n = n.bitwiseOR(F.shiftleft(
            F.shiftrightunsigned(F.col(f"__s2t{k}"), 2), 8 * k))
    leaf = F.shiftleft(face.cast("long"), 61) \
        .bitwiseOR(F.shiftleft(n, 1)).bitwiseOR(F.lit(1))
    lsb = 1 << (2 * (30 - level))
    stages.append((out_col,
                   leaf.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))))
    _S2_STAGE_MEMO[key] = (stages, temps)
    return stages, temps


def s2_cell_expr(lat: Column, lon: Column, level: int) -> Column:
    """S2 encode as PURE Catalyst expressions — no Python anywhere.
    NOTE: prefer `with_s2_cell` in real plans — this Column form embeds
    the i/j/face subtrees once per Hilbert step and costs ~16 s of
    ANALYSIS time per query; it is kept for parity testing and as the
    readable reference of the expression math.

    Mirrors spatial/s2.py bit-for-bit (parity-tested): lat/lon → unit xyz
    (trig exprs) → face via argmax CASE (each division guarded by its CASE
    branch, so no div-by-zero even under ANSI) → quadratic ST → 30-bit ij
    (truncating cast, same as numpy astype) → Hilbert position as an
    8-step lookup-table walk where the 1024-entry table is an array
    literal probed with element_at (O(1) constant access in codegen) →
    (face<<61 | pos<<1 | 1) & parent mask.

    Why: this removes the last Arrow round-trip from the tiling hot path —
    scan → encode → aggregate is then ONE WholeStageCodegen span, and the
    encode runs wherever the scan runs with zero Python workers. The
    pandas UDF form (`s2_cell`) is kept as the cross-check and for numpy
    callers."""
    from pyspark.sql import functions as F

    phi, theta = F.radians(lat), F.radians(lon)
    cosphi = F.cos(phi)
    x, y, z = F.cos(theta) * cosphi, F.sin(theta) * cosphi, F.sin(phi)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face0 = F.when(ax >= ay, F.when(ax >= az, F.lit(0)).otherwise(F.lit(2))) \
        .otherwise(F.when(ay >= az, F.lit(1)).otherwise(F.lit(2)))
    major = F.when(face0 == 0, x).when(face0 == 1, y).otherwise(z)
    face = F.when(major < 0, face0 + 3).otherwise(face0)

    u = (F.when(face == 0, y / x).when(face == 1, -x / y)
         .when(face == 2, -x / z).when(face == 3, z / x)
         .when(face == 4, z / y).otherwise(-y / z))
    v = (F.when(face == 0, z / x).when(face == 1, z / y)
         .when(face == 2, -y / z).when(face == 3, y / x)
         .when(face == 4, -x / y).otherwise(-x / z))

    def st(w):
        return F.when(w >= 0, 0.5 * F.sqrt(1 + 3 * w)) \
            .otherwise(1 - 0.5 * F.sqrt(1 - 3 * w))

    def ij(s):
        raw = (s * F.lit(float(1 << 30))).cast("long")  # truncating, = astype
        return F.greatest(F.lit(0).cast("long"),
                          F.least(F.lit((1 << 30) - 1).cast("long"), raw))

    i, j = ij(st(u)), ij(st(v))

    # The 1024-entry Hilbert state table rides the plan as ONE string
    # literal: entry v (10 bits = pos<<2|orient) is stored as chr(256+v)
    # and probed with substr+ascii (codepoint lookup — verified Spark's
    # ascii() returns full BMP codepoints). An array<int> literal here
    # would be copied into the tree once per walk step (~16k literal
    # nodes) and made ANALYSIS take ~15 s; the string is a single node.
    lut_str = F.lit("".join(chr(256 + int(t))
                            for t in _s2._lookup_pos.tolist()))
    bits = face.cast("long").bitwiseAND(F.lit(1))
    n = F.lit(0).cast("long")
    for k in range(7, -1, -1):
        b = (bits
             + F.shiftleft(F.shiftrightunsigned(i, 4 * k)
                           .bitwiseAND(F.lit(15)), 6)
             + F.shiftleft(F.shiftrightunsigned(j, 4 * k)
                           .bitwiseAND(F.lit(15)), 2))
        # single reference to b per step (pos and orient share the char) —
        # keeps the dependency chain linear, not exponential
        b2 = (F.ascii(lut_str.substr((b + 1).cast("int"), F.lit(1)))
              - 256).cast("long")
        n = n.bitwiseOR(F.shiftleft(F.shiftrightunsigned(b2, 2), 8 * k))
        bits = b2.bitwiseAND(F.lit(3))

    leaf = F.shiftleft(face.cast("long"), 61) \
        .bitwiseOR(F.shiftleft(n, 1)).bitwiseOR(F.lit(1))
    lsb = 1 << (2 * (30 - level))
    return leaf.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))


def s2_parent_col(cell: Column, level: int) -> Column:
    """Parent cell as pure bit arithmetic — no UDF: (id & -lsb) | lsb.
    Level coarsening in joins should use this, never a re-encode."""
    from pyspark.sql import functions as F
    lsb = 1 << (2 * (30 - level))
    return (cell.bitwiseAND(F.lit(-lsb))).bitwiseOR(F.lit(lsb))


def s2_parent(level: int):
    @pandas_udf("long")
    def f(cell: pd.Series) -> pd.Series:
        import numpy as np
        out = _s2.parent(cell.to_numpy(np.int64).astype(np.uint64), level)
        return pd.Series(out.astype(np.int64))
    return f
