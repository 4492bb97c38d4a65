"""Random order decorrelation before sink writes (R2).

Reference parity: ``shuffle`` (reference preprocess.py:73-79) pairs every row
with ``random.random()``, GroupByKey's on it and flattens — one full shuffle
whose only purpose is randomized row order for ML training.

Spark design: ``repartition(n, rand(seed))`` — the faithful mapping (Beam's
version guarantees decorrelation, not a global order) at strictly lower cost:
no per-key grouped materialization, just an exchange. Optional
``sortWithinPartitions(rand())`` adds intra-partition decorrelation without a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffle(
    df: DataFrame,
    num_partitions: int | None = None,
    seed: int = 42,
    sort_within: bool = True,
) -> DataFrame:
    """Decorrelate row order (multiset-preserving; invariant-tested)."""
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    out = df.repartition(int(parts), F.rand(seed))
    if sort_within:
        out = out.sortWithinPartitions(F.rand(seed + 1))
    return out
