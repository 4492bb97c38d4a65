"""Z-order (Morton) curve values — the data-layout clustering primitive.

Sorting a table by the bit-interleave of two (or more) dimension keys
places rows that are close in BOTH dimensions into the same parquet row
groups, so min/max statistics prune multi-dimensional range predicates —
the same layout trick Delta's OPTIMIZE ZORDER BY applies before writing.
Here it is a pure Catalyst integer expression (shift/mask/or — stays in
whole-stage codegen), usable as ``df.repartitionByRange(N, z).
sortWithinPartitions(z).write...``.

Exactly expressible in ANSI SQL (the oracle unrolls the same shift/mask
arithmetic), so the z-values themselves are hash-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: result bit
    2b is x's bit b, bit 2b+1 is y's bit b (both inputs masked to
    ``bits``). 16+16 → 32-bit Morton code in a LongType."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    xm = xc.bitwiseAND((1 << bits) - 1).cast("long")
    ym = yc.bitwiseAND((1 << bits) - 1).cast("long")
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(xm, b).bitwiseAND(1), 2 * b)
        ).bitwiseOR(F.shiftleft(F.shiftright(ym, b).bitwiseAND(1), 2 * b + 1))
    return out


def z_value_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB/ANSI twin of :func:`z_value` as a SQL fragment."""
    xm = f"(({x}) & {(1 << bits) - 1})"
    ym = f"(({y}) & {(1 << bits) - 1})"
    terms = []
    for b in range(bits):
        terms.append(f"((({xm} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ym} >> {b}) & 1) << {2 * b + 1})")
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"
