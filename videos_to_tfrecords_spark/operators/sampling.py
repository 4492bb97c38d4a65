"""Exact anchored frame sampling (P8's true sequential semantics).

Reference preprocess.py:172-177: while decoding, keep a frame iff
``pos_msec >= last_kept + skip_msec`` — the anchor moves to each KEPT
frame, so this is not expressible as a stateless bucket filter (an event at
t=900 with skip=500 keeps t=0 and t=900, but bucket-per-500ms would keep
t=0 and t=500-bucket's t=900 differently when frames are irregular).

Engine mapping: per-key ``applyInPandas`` — sort the group by timestamp and
run the anchored scan in vectorized-ish pandas. One shuffle on the key
(same as any grouping); group size is bounded by frames-per-video, so the
operator scales with corpus size. The relational bucket approximation (one
row per key × time-bucket) lives in plans/reference_queries.py
(frame_downsample_buckets) for the oracle-checkable path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def sample_frames_exact(
    df: DataFrame,
    key_col: str = "filename",
    ts_col: str = "timestamp_ms",
    skip_msec: float = 500.0,
) -> DataFrame:
    schema = df.schema

    def keep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        mask, last = [], None
        for ts in pdf[ts_col]:
            if last is None or ts >= last + skip_msec:
                mask.append(True)
                last = ts
            else:
                mask.append(False)
        return pdf[pd.Series(mask, index=pdf.index)]

    return df.groupBy(key_col).applyInPandas(keep, schema)


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    ``h15(id) % 100 < rate(stratum)`` — the data-diet primitive for
    training corpora (downsample the dominant language/source, keep the
    rare strata whole).

    vs ``df.sampleBy``: the hash predicate is reproducible across runs,
    engines, and partitionings (no RNG state), pushes down to the scan as
    plain arithmetic, and the per-stratum rate error is the same
    O(1/√n) as Bernoulli sampling. Exactly expressible in SQL, so the
    sampled SET itself is oracle-checkable, not just its size."""
    from pyspark.sql import functions as F

    from videos_to_tfrecords_spark.functions.hashing import h15

    bucket = F.pmod(h15(F.col(id_col).cast("string"), salt="strat"), F.lit(100))
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)
