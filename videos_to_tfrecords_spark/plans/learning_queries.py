"""Learning / model-fitting queries (SURVEY §2.7 extension — the
training-side ops a 100 TB data engine feeds): exact distributed OLS via
normal equations, with more to follow (importance weighting, calibration).

Cross-engine determinism: the engine solves the normal equations in
arbitrary-precision rationals over exact int64 sums; the oracle solves the
SAME system with HUGEINT (int128) Cramer determinants — both emit
floor(βᵢ·quant), so the fitted model itself is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.plans.registry import query
from videos_to_tfrecords_spark.sources.tables import load_table

_LR_QUANT = 10_000


def _floordiv(num: str, den: str) -> str:
    """DuckDB fragment: floor(num/den) for possibly-negative num, positive
    den (the kmeans-oracle floor trick — engine-independent semantics)."""
    return f"(({num}) - ((({num}) % ({den})) + ({den})) % ({den})) // ({den})"


def _linreg_oracle() -> str:
    """Cramer's rule on the 3×3 normal equations in HUGEINT. Magnitudes at
    sf0.1 (600k rows): XᵀX entries ≤ 1.5e9, det ~ 1e27, numerators ~ 3e32,
    ×quant ~ 3e36 < hugeint max 1.7e38 — exact with headroom."""
    q = _LR_QUANT
    fd = _floordiv
    outs = []
    for i, num in enumerate(("n0", "n1", "n2")):
        t = f"(CASE WHEN det < 0 THEN -{num} ELSE {num} END) * {q}"
        outs.append(
            f"CASE WHEN det = 0 THEN NULL ELSE "
            f"CAST({fd(t, 'dpos')} AS BIGINT) END AS beta{i}_q"
        )
    sel = ",\n       ".join(outs)
    return f"""
WITH t AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
                  CAST(l_quantity AS BIGINT) AS x1,
                  CAST(round(l_discount * 100) AS BIGINT) AS x2
           FROM lineitem),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x1) AS HUGEINT) AS s1,
             CAST(sum(x2) AS HUGEINT) AS s2,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x1 * x1) AS HUGEINT) AS s11,
             CAST(sum(x1 * x2) AS HUGEINT) AS s12,
             CAST(sum(x2 * x2) AS HUGEINT) AS s22,
             CAST(sum(x1 * y) AS HUGEINT) AS s1y,
             CAST(sum(x2 * y) AS HUGEINT) AS s2y
      FROM t),
m AS (SELECT n, sy,
  n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s12 - s11 * s2) AS det,
  sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
      + s2 * (s1y * s12 - s11 * s2y) AS n0,
  n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s2y - s1y * s2) AS n1,
  n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2)
      + sy * (s1 * s12 - s11 * s2) AS n2
 FROM s),
f AS (SELECT *, CASE WHEN det < 0 THEN -det ELSE det END AS dpos FROM m)
SELECT CAST(n AS BIGINT) AS n_rows,
       {sel}
FROM f
"""


@query("linreg_extprice_normal_eq", _linreg_oracle())
def q_linreg_extprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed OLS (price ~ quantity + discount, intercept): one
    partial-aggregate pass emits the integer Gram sums, the driver solves
    the 3×3 system in exact rationals — the fitted coefficients themselves
    hash-match the HUGEINT-Cramer SQL twin. The scan is the ONLY
    data-proportional stage (map-side combine; one row shuffles)."""
    from videos_to_tfrecords_spark.operators.regression import linreg_normal_eq

    li = load_table(spark, sf_dir, "lineitem")
    return linreg_normal_eq(
        li,
        y=F.round(F.col("l_extendedprice") * 100),
        xs=[F.col("l_quantity"), F.round(F.col("l_discount") * 100)],
        quant=_LR_QUANT,
    )
