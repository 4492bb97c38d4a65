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


def mixture_resample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, int],
) -> DataFrame:
    """Deterministic TARGET-MIXTURE resampling — the corpus-composition
    primitive behind every LLM data recipe ("60% web, 30% wiki, 10%
    code"): given integer weight parts per source, find the largest total
    T the available data supports (T = min_s ⌊100·n_s/w_s⌋ — the
    binding source is ~fully consumed) and keep ⌊T·w_s/100⌋ rows of each
    listed source IN EXPECTATION via the portable hash predicate
    ``pmod(h15(id), n_s) < target_s`` (realized counts are binomial
    around the target — the same O(1/√n) wobble as Bernoulli sampling,
    negligible at corpus scale; an exact-k variant would need a
    per-source global rank, i.e. a shuffle of every kept source).
    Sources not in the recipe are dropped.

    Everything is integer arithmetic over per-source COUNTS (a k-row
    aggregate — planning metadata, collected like AQE stats), and the kept
    SET is hash-reproducible across runs/engines/partitionings, so the
    resampled corpus itself is oracle-checkable. At 100 TB: one count
    pass + one scan with a pushed-down arithmetic filter; no shuffle of
    data rows at all."""
    from pyspark.sql import functions as F

    from videos_to_tfrecords_spark.functions.hashing import h15

    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    present = {s: w for s, w in weights.items() if counts.get(s)}
    if not present:
        return df.filter(F.lit(False))
    t_max = min(counts[s] * 100 // w for s, w in present.items())
    pred = F.lit(False)
    for s in sorted(present):
        target = t_max * present[s] // 100
        pred = pred | (
            (F.col(source_col) == s)
            & (
                F.pmod(
                    h15(F.col(id_col).cast("string"), salt="mix"),
                    F.lit(counts[s]),
                )
                < F.lit(target)
            )
        )
    return df.filter(pred)


def weighted_sample_exact_k(
    df,
    id_col: str,
    weight_col: str,
    k: int,
):
    """EXACT-k weighted sample without replacement (Efraimidis–Spirakis):
    each row races an exponential clock -ln(u)/w — the k smallest keys are
    a draw where selection probability is proportional to ``weight_col``.
    The mixture/stratified samplers above hit TARGET COUNTS; this one is
    the importance-weighted draw (sample long documents more often, rare
    sources proportionally to a score).

    u comes from the portable 60-bit hash mapped into (0, 1], so the drawn
    SET is deterministic across runs/engines/partitionings and therefore
    oracle-checkable — a seeded rand() would be neither. Physically a
    global top-k (TakeOrderedAndProject): per-partition heaps of size k, no
    global sort, no shuffle of non-winners. ln() on both engines is
    correctly-rounded to well under the spacing between two rows' keys, so
    the selected set is stable.
    """
    from pyspark.sql import functions as F

    from videos_to_tfrecords_spark.functions.hashing import h15

    two60 = float(1 << 60)
    u = (h15(F.col(id_col).cast("string"), salt="wsamp") + 1) / two60
    key = -F.log(u) / F.col(weight_col)
    return (
        df.withColumn("_wkey", key)
        .orderBy("_wkey", id_col)
        .limit(k)
        .withColumn("wkey_x1e9", F.floor(F.col("_wkey") * 1_000_000_000).cast("long"))
        .drop("_wkey")
    )


def group_quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    quota: int,
    salt: str = "quota",
) -> DataFrame:
    """Per-group EXACT-k deterministic sampling: keep each group's ``quota``
    rows with the smallest (h15(id), id) — the per-domain/per-language cap
    every web corpus applies so no single source dominates training. A
    distributed reservoir with none of the RNG-state trouble: membership
    is a pure hash rank, so re-runs, engines, and partitionings agree.
    One group-keyed window (single shuffle); groups smaller than the
    quota are kept whole."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from videos_to_tfrecords_spark.functions.hashing import h15

    w = Window.partitionBy(group_col).orderBy("_hk", id_col)
    return (
        df.withColumn("_hk", h15(F.col(id_col).cast("string"), salt))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_hk", "_rn")
    )
