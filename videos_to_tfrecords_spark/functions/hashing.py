"""Cross-engine deterministic hashing.

The dedup/similarity operators need hash values that are identical in Spark
and in any ANSI-SQL oracle engine (the correctness strategy of SURVEY §5).
Engine-native hashes (Spark murmur3 `hash()`, DuckDB `hash()`) differ, so the
engine's portable hash is: first 15 hex chars of md5 → bigint (60 bits,
always positive, fits BIGINT in every engine).

Spark side: ``conv(substring(md5(x),1,15),16,10)`` — all JVM/codegen
expressions, no Python. Oracle side:
``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column | str) -> Column:
    return F.md5(F.col(col) if isinstance(col, str) else col)


def h15(col: Column | str, salt: str | None = None) -> Column:
    """Portable 60-bit hash of a string column (optionally salted).

    Salting (``salt:value``) gives the independent hash families used for
    MinHash permutations and LSH hyperplanes.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(f"{salt}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h15_sql(expr: str, salt: str | None = None) -> str:
    """The DuckDB/ANSI twin of :func:`h15`, as a SQL fragment."""
    inner = f"concat('{salt}:', {expr})" if salt is not None else expr
    return f"CAST(concat('0x', substr(md5({inner}), 1, 15)) AS BIGINT)"
