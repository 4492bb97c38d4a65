"""Exact distributed OLS (operators/regression.py)."""

from pyspark.sql import functions as F

from videos_to_tfrecords_spark.operators.regression import linreg_normal_eq


def test_linreg_recovers_exact_planar_fit(spark):
    """y = 7 + 3·x1 − 2·x2 exactly ⇒ floor-quantized coefficients are the
    exact integers (no residual, determinant non-zero)."""
    rows = [
        (x1, x2, 7 + 3 * x1 - 2 * x2)
        for x1 in range(5)
        for x2 in range(4)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    out = linreg_normal_eq(df, y=F.col("y"), xs=[F.col("x1"), F.col("x2")]).collect()[0]
    assert out.n_rows == 20
    assert out.beta0_q == 7 * 10_000
    assert out.beta1_q == 3 * 10_000
    assert out.beta2_q == -2 * 10_000


def test_linreg_floor_quantization_of_fractional_solution(spark):
    """Two points (0,0),(3,1): slope 1/3 ⇒ beta1_q = floor(10000/3) = 3333
    (floor semantics, matching the oracle's integer floor division)."""
    df = spark.createDataFrame([(0, 0), (3, 1)], "x1 long, y long")
    out = linreg_normal_eq(df, y=F.col("y"), xs=[F.col("x1")]).collect()[0]
    assert out.beta0_q == 0
    assert out.beta1_q == 3333


def test_linreg_singular_design_yields_nulls(spark):
    """x2 = 2·x1 (collinear) ⇒ singular normal matrix ⇒ NULL betas, n kept."""
    rows = [(x, 2 * x, x + 1) for x in range(6)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    out = linreg_normal_eq(df, y=F.col("y"), xs=[F.col("x1"), F.col("x2")]).collect()[0]
    assert out.n_rows == 6
    assert out.beta0_q is None and out.beta1_q is None and out.beta2_q is None
