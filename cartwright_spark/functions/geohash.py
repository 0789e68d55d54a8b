"""Geohash encoding as pure Catalyst column expressions — no UDF.

Standard geohash (Niemeyer, 2008 — public domain): bits alternate
longitude-first MSB-first, 5 bits per base-32 character
('0123456789bcdefghjkmnpqrstuvwxyz'). The successive-bisection
definition is exactly the binary expansion of the normalized
coordinate, so quantize-then-interleave reproduces it bit-for-bit:

    qlon = floor((lon+180)/360 · 2^lon_bits),  qlat likewise,
    z bit (total−1−2i)   = qlon bit (lon_bits−1−i)
    z bit (total−1−2i−1) = qlat bit (lat_bits−1−i)

Everything is shifts/masks/element_at — whole-stage-codegen'd JVM
expressions, a narrow map with no shuffle and no Python worker. The
identical arithmetic is emitted as a SQL string by ``geohash_sql`` for
the DuckDB oracle (and for pushing the encode into any SQL engine).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _split_bits(precision: int) -> tuple[int, int, int]:
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12 (60 bits max)")
    total = 5 * precision
    lon_bits = (total + 1) // 2   # lon leads, so it gets the extra bit
    return total, lon_bits, total - lon_bits


def geohash_col(lat: Column, lon: Column, precision: int = 8) -> Column:
    total, lon_bits, lat_bits = _split_bits(precision)
    qlon = F.least(F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                           * F.lit(float(1 << lon_bits))),
                   F.lit((1 << lon_bits) - 1)).cast("long")
    qlat = F.least(F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                           * F.lit(float(1 << lat_bits))),
                   F.lit((1 << lat_bits) - 1)).cast("long")
    z = F.lit(0).cast("long")
    for i in range(lon_bits):
        bit = F.shiftright(qlon, lon_bits - 1 - i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit, total - 1 - 2 * i))
    for i in range(lat_bits):
        bit = F.shiftright(qlat, lat_bits - 1 - i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit, total - 2 - 2 * i))
    chars = F.array(*[F.lit(c) for c in ALPHABET])
    parts = [F.element_at(
        chars, (F.shiftright(z, 5 * (precision - 1 - g))
                .bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"))
        for g in range(precision)]
    return F.concat(*parts)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 8) -> str:
    """The identical encode as an ANSI-ish SQL expression string
    (DuckDB-compatible; used verbatim as the contract oracle)."""
    total, lon_bits, lat_bits = _split_bits(precision)
    qlon = (f"least(CAST(floor(({lon_expr} + 180.0) / 360.0 * "
            f"{float(1 << lon_bits)!r}) AS BIGINT), {(1 << lon_bits) - 1})")
    qlat = (f"least(CAST(floor(({lat_expr} + 90.0) / 180.0 * "
            f"{float(1 << lat_bits)!r}) AS BIGINT), {(1 << lat_bits) - 1})")
    terms = []
    for i in range(lon_bits):
        terms.append(f"((({qlon} >> {lon_bits - 1 - i}) & 1) "
                     f"<< {total - 1 - 2 * i})")
    for i in range(lat_bits):
        terms.append(f"((({qlat} >> {lat_bits - 1 - i}) & 1) "
                     f"<< {total - 2 - 2 * i})")
    z = "(" + " | ".join(terms) + ")"
    parts = [f"substr('{ALPHABET}', "
             f"CAST((({z} >> {5 * (precision - 1 - g)}) & 31) + 1 AS INT), 1)"
             for g in range(precision)]
    return "(" + " || ".join(parts) + ")"
