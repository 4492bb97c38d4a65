"""Vector math over ArrayType(Float/Double) embedding columns.

Two tiers:
- ``dot``/``cosine`` — double-precision, built from zip_with + aggregate
  (JVM-side, no Python). The production path for similarity search.
- ``scaled_int_dot`` — the oracle-comparable twin: per-component
  round(x*1e6) → exact 64-bit integer products summed. Float summation
  order is engine-dependent; integer sums are not, so hash-checked
  similarity queries rank/threshold on this (embeddings are unit-norm, so
  scaled dot ≈ cosine × 1e12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def scaled_int_dot(a: Column | str, b: Column | str, scale: int = 1_000_000) -> Column:
    """Exact integer dot product of µ-scaled components.

    64-dim unit vectors: |round(x*1e6)| ≤ 1e6 ⇒ per-term ≤ 1e12, sum ≤
    6.4e13 — no 64-bit overflow (2048-dim still ≤ 2e15, safe)."""
    s = F.lit(scale)
    return F.aggregate(
        F.zip_with(
            _c(a),
            _c(b),
            lambda x, y: F.round(x.cast("double") * s).cast("long")
            * F.round(y.cast("double") * s).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def scaled_int_dot_sql(a_expr: str, b_expr: str, scale: int = 1_000_000) -> str:
    """DuckDB twin of :func:`scaled_int_dot` over DOUBLE[] expressions."""
    return (
        f"CAST(list_sum(list_transform(list_zip({a_expr}, {b_expr}), "
        f"p -> CAST(round(p[1] * {scale}) AS BIGINT) "
        f"* CAST(round(p[2] * {scale}) AS BIGINT))) AS BIGINT)"
    )
