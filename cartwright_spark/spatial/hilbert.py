"""Hilbert space-filling-curve index — locality-preserving layout order.

Z-order (sources/iceberg_lite.py z_order_sort) interleaves bits and is
cheap, but adjacent z values jump across the grid at power-of-two seams;
the Hilbert curve guarantees consecutive indexes are GRID NEIGHBORS, so
sorting tile data by Hilbert index gives strictly better range-scan
locality (fewer partitions touched per spatial window) — the standard
layout choice for tile stores and spatial file formats.

From-scratch xy2d, expressed as pure JVM column arithmetic: the classic
per-bit fold (top bit down: quadrant digit = gray-coded (rx, ry), then
the reflect+swap frame rotation) with ONE select per bit level — the
plan grows LINEARLY in curve order (each level rewrites x/y/d through a
simultaneous select; inlining the rotation recursively instead would
double the expression tree per level). No UDF, no shuffle: the index is
a narrow map stage that whole-stage-codegens, exactly like the mercator
tile formula in functions/geodesy.py.

The same per-level formulas are emitted as chained SQL CTEs by
``hilbert_sql`` so the DuckDB oracle replays bit-for-bit (integer-only
arithmetic — no float divergence surface at all).

Reference parity: jataware/cartwright has no layout layer; this extends
the engine's storage-order toolkit (z-order, hive partitioning) per
SURVEY §2's sink row S6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hilbert_index(df: DataFrame, x_col: str, y_col: str, order: int,
                  out_col: str = "hilbert_d") -> DataFrame:
    """Append the Hilbert curve index of (x, y) on the 2^order grid.

    x/y must lie in [0, 2^order); the result is in [0, 4^order), a
    bijection. order <= 31 keeps 4^order inside int64.
    """
    if not 1 <= order <= 31:
        raise ValueError("hilbert_index: 1 <= order <= 31")
    n1 = (1 << order) - 1
    out = df.select(
        "*",
        F.col(x_col).cast("bigint").alias("__hx"),
        F.col(y_col).cast("bigint").alias("__hy"),
        F.lit(0).cast("bigint").alias("__hd"))
    passthrough = df.columns
    for k in range(order - 1, -1, -1):
        s = 1 << k
        x, y, d = F.col("__hx"), F.col("__hy"), F.col("__hd")
        rx = x.bitwiseAND(F.lit(s)) > 0
        ry = y.bitwiseAND(F.lit(s)) > 0
        # quadrant digit (3*rx) XOR ry as an explicit CASE so the SQL
        # twin is literally the same decision table
        quad = (F.when(rx & ry, F.lit(2))
                .when(rx, F.lit(3))
                .when(ry, F.lit(1))
                .otherwise(F.lit(0))).cast("bigint")
        new_d = d + F.lit(s) * F.lit(s) * quad
        # frame rotation: ry=1 -> identity; ry=0,rx=1 -> reflect both
        # through the grid (n1 - v, a pure bit complement) then swap;
        # ry=0,rx=0 -> swap only
        new_x = F.when(ry, x).when(rx, F.lit(n1) - y).otherwise(y)
        new_y = F.when(ry, y).when(rx, F.lit(n1) - x).otherwise(x)
        out = out.select(
            *passthrough, new_x.alias("__hx"), new_y.alias("__hy"),
            new_d.alias("__hd"))
    return out.select(*passthrough, F.col("__hd").alias(out_col))


def hilbert_sql(from_sql: str, keys: list[str], x: str, y: str,
                order: int, out_col: str = "hilbert_d") -> str:
    """Chained-CTE DuckDB replay of hilbert_index: one CTE per bit level
    (linear SQL growth), the identical CASE decision table and rotation.
    `from_sql` must select `keys` + integer columns `x`/`y`."""
    n1 = (1 << order) - 1
    ks = ", ".join(keys)
    # working columns use reserved __h* names so key columns named plain
    # x/y cannot collide with (and silently shadow) the fold state
    ctes = [f"h{order} AS (SELECT {ks}, CAST({x} AS BIGINT) AS __hx, "
            f"CAST({y} AS BIGINT) AS __hy, CAST(0 AS BIGINT) AS __hd "
            f"FROM ({from_sql}))"]
    for k in range(order - 1, -1, -1):
        s = 1 << k
        ctes.append(f"""h{k} AS (
          SELECT {ks},
                 CASE WHEN (__hy & {s}) > 0 THEN __hx
                      WHEN (__hx & {s}) > 0 THEN {n1} - __hy
                      ELSE __hy END AS __hx,
                 CASE WHEN (__hy & {s}) > 0 THEN __hy
                      WHEN (__hx & {s}) > 0 THEN {n1} - __hx
                      ELSE __hx END AS __hy,
                 __hd + {s * s} * (CASE WHEN (__hx & {s}) > 0
                                             AND (__hy & {s}) > 0 THEN 2
                                        WHEN (__hx & {s}) > 0 THEN 3
                                        WHEN (__hy & {s}) > 0 THEN 1
                                        ELSE 0 END) AS __hd
          FROM h{k + 1}
        )""")
    body = ",\n".join(ctes)
    return (f"WITH {body}\n"
            f"SELECT {ks}, __hd AS {out_col} FROM h0")
