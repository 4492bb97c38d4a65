"""Distributed exact linear-model fitting via normal equations.

The 100 TB shape for least squares: a SINGLE partial-aggregate pass over
the fact table computes the d×d Gram sums XᵀX and the d-vector Xᵀy
(map-side combine, one row shuffles), then the driver solves the d×d
system — O(d³) on metadata-sized input, the same justification as the
Gram-matrix/centroid collects elsewhere in this package. Nothing about
the pass changes at 1000 executors: every executor emits one partial row
of int64 sums.

Numeric contract (registry.py rules): all inputs are integer-valued
columns (the caller quantizes, e.g. cents / discount·100), sums are exact
int64, and the solve runs in ``fractions.Fraction`` (arbitrary-precision
rationals) — coefficients are emitted floor-quantized at ``quant`` so the
DuckDB oracle can reproduce them bit-for-bit with HUGEINT Cramer
determinants and the same floor division.

Reference parity: the reference has no model fitting; this extends the
training-data engine the same way inference (ml/inference.py) does —
cited as absent-in-reference in SURVEY §2.7.
"""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _solve_fractions(a: list[list[int]], b: list[int]) -> list[Fraction] | None:
    """Exact Gaussian elimination over rationals; None if singular."""
    d = len(b)
    m = [[Fraction(a[i][j]) for j in range(d)] + [Fraction(b[i])] for i in range(d)]
    for col in range(d):
        piv = next((r for r in range(col, d) if m[r][col] != 0), None)
        if piv is None:
            return None
        m[col], m[piv] = m[piv], m[col]
        for r in range(d):
            if r != col and m[r][col] != 0:
                f = m[r][col] / m[col][col]
                m[r] = [x - f * y for x, y in zip(m[r], m[col])]
    return [m[i][d] / m[i][i] for i in range(d)]


def linreg_normal_eq(
    df: DataFrame,
    y: Column,
    xs: list[Column],
    quant: int = 10_000,
) -> DataFrame:
    """OLS with intercept over integer-valued feature/target columns.

    Returns ONE row: ``n_rows`` plus ``beta{i}_q`` = floor(βᵢ·quant) for
    i = 0 (intercept), 1..d — exact, engine-independent values. Singular
    designs yield NULL coefficients.
    """
    feats = [F.lit(1).cast("long")] + [x.cast("long") for x in xs]
    d = len(feats)
    yl = y.cast("long")
    # per-row products fit int64 (cent-scale² ≈ 1e14); the SUMS do not at
    # corpus scale (1e14 × 1e12 rows) — accumulate in DECIMAL(38,0),
    # exact to 1e38, matching the oracle's HUGEINT sums. The driver-side
    # Fraction solve is arbitrary-precision either way.
    d38 = "decimal(38,0)"
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum((feats[i] * feats[j]).cast(d38)).alias(f"s_{i}_{j}")
            )
        aggs.append(F.sum((feats[i] * yl).cast(d38)).alias(f"b_{i}"))
    row = df.agg(*aggs).collect()[0]  # one row of exact sums — metadata

    a = [
        [int(row[f"s_{min(i, j)}_{max(i, j)}"]) for j in range(d)] for i in range(d)
    ]
    rhs = [int(row[f"b_{i}"]) for i in range(d)]
    sol = _solve_fractions(a, rhs)
    betas = (
        [None] * d if sol is None else [int(math.floor(s * quant)) for s in sol]
    )
    n = int(row["s_0_0"])
    schema = "n_rows long, " + ", ".join(f"beta{i}_q long" for i in range(d))
    return df.sparkSession.createDataFrame([tuple([n] + betas)], schema)
