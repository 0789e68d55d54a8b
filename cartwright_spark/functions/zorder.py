"""Z-order (Morton) clustering for data-skipping file layout.

Min/max footer statistics only prune files when values are CLUSTERED:
a lat-lon box query over files written in ingest order keeps every file
(each file's lat range spans the world). Interleaving the bits of the
quantized dimensions and range-partitioning + sorting the write by that
Morton code gives every file a tight hyper-rectangle of the key space,
so `Catalog.select_files(stats_filter=...)` — and any real engine's
footer pruning — skips all files outside the query box. This is the
same mechanism as Delta/Iceberg `OPTIMIZE ZORDER BY` (public), built
from plain Spark primitives.

Everything is pure codegen'd column expressions (shifts + masks — no
UDF), one `repartitionByRange` shuffle, and a per-partition local sort;
the min/max quantization bounds come from ONE scalar agg pass (driver
receives 2·k numbers, metadata scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _interleave(quantized: list[Column], bits: int) -> Column:
    """Morton code of k already-quantized non-negative int columns:
    bit i of column j lands at position i·k + j. k·bits ≤ 62."""
    k = len(quantized)
    z = F.lit(0).cast("long")
    for j, q in enumerate(quantized):
        for i in range(bits):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def zvalue(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton z-value Column over ``cols`` (numeric), each linearly
    quantized to ``bits`` bits between its observed min and max (one
    scalar agg pass; constant columns quantize to 0)."""
    if len(cols) * bits > 62:
        raise ValueError(f"{len(cols)} cols × {bits} bits exceeds long")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    row = df.agg(*aggs).first()
    top = (1 << bits) - 1
    qs = []
    for c in cols:
        mn, mx = float(row[f"mn_{c}"]), float(row[f"mx_{c}"])
        span = (mx - mn) or 1.0
        q = F.floor((F.col(c).cast("double") - F.lit(mn))
                    / F.lit(span) * F.lit(float(top)))
        qs.append(F.least(F.greatest(q, F.lit(0)), F.lit(top)).cast("long"))
    return _interleave(qs, bits)


def zorder(df: DataFrame, cols: list[str], n_files: int = 32,
           bits: int = 16) -> DataFrame:
    """Cluster ``df`` for write: range-partition into ``n_files`` splits
    of the Morton order and sort within each — every output file then
    covers a compact z-range, i.e. a tight min/max box per dimension.
    The helper column is dropped before the data lands."""
    return (df.withColumn("__z", zvalue(df, cols, bits))
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z"))
