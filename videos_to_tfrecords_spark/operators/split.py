"""Random + deterministic dataset splitting (R1/R3).

Reference parity: ``randomly_split`` (reference preprocess.py:36-70) draws
``r = random.random()`` per row and routes: r < test → Test;
r < 1 - train → Val; else Train, stamping the split name into a ``dataset``
column (preprocess.py:58-66). Ratio sum validated (preprocess.py:51-53).

Spark design: one seeded ``rand()`` draw stamped as a column, then N filters
over the SAME cached frame — the tagged-multi-output routing (R3) has no
single-plan analog, and stamping-then-filtering preserves the reference's
"each row drawn once" semantics exactly while keeping every branch a narrow
(shuffle-free) plan. ``hash_bucket_split`` is the deterministic twin used for
oracle checks (SURVEY §5: random ops are invariant-tested; the hash variant
is value-testable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT_NAMES = ("Train", "Val", "Test")  # reference preprocess.py:58-66


def with_random_split(
    df: DataFrame,
    train: float = 0.7,
    val: float = 0.15,
    test: float = 0.15,
    seed: int = 42,
    out: str = "dataset",
) -> DataFrame:
    """Stamp `dataset ∈ {Train,Val,Test}` from one seeded uniform draw.

    Boundary layout matches the reference (preprocess.py:58-66):
    [0, test) → Test, [test, test+val) → Val, rest → Train.
    """
    if abs(train + val + test - 1.0) > 1e-9:
        # reference preprocess.py:51-53 validates ratios sum to 1.0
        raise ValueError(f"split ratios must sum to 1.0, got {train+val+test}")
    # materialize the draw FIRST: rand() is non-deterministic, and embedding
    # the same expression tree in both WHEN branches would draw twice
    # (Catalyst's CollapseProject guard keeps this projection separate)
    r = F.col("_split_r")
    return (
        df.withColumn("_split_r", F.rand(seed))
        .withColumn(
            out,
            F.when(r < test, F.lit("Test"))
            .when(r < test + val, F.lit("Val"))
            .otherwise(F.lit("Train")),
        )
        .drop("_split_r")
    )


def randomly_split(
    df: DataFrame,
    train: float = 0.7,
    val: float = 0.15,
    test: float = 0.15,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Three-way split as a dict of DataFrames (R1+R3).

    Scale note: the stamped frame should be cached (or checkpointed) by the
    caller when all three branches are consumed, so the upstream scan runs
    once, mirroring Beam's single-pass tagged outputs.
    """
    stamped = with_random_split(df, train, val, test, seed)
    return {name: stamped.filter(F.col("dataset") == name) for name in SPLIT_NAMES}


def hash_bucket_split(
    df: DataFrame,
    key_col: str,
    train: float = 0.7,
    val: float = 0.15,
    test: float = 0.15,
    buckets: int = 100,
    out: str = "dataset",
) -> DataFrame:
    """Deterministic split: bucket = (key*9973 + 7) mod buckets.

    Same routing boundaries as the random split but reproducible across
    engines (plain integer arithmetic — no engine-specific hash), so it IS
    DuckDB-oracle-checkable. Also the right tool at 100 TB when splits must
    be stable across reruns/backfills.
    """
    if abs(train + val + test - 1.0) > 1e-9:
        raise ValueError("split ratios must sum to 1.0")
    bucket = F.pmod(F.col(key_col).cast("long") * 9973 + 7, F.lit(buckets))
    frac = bucket / F.lit(float(buckets))
    return df.withColumn(
        out,
        F.when(frac < test, F.lit("Test"))
        .when(frac < test + val, F.lit("Val"))
        .otherwise(F.lit("Train")),
    )
