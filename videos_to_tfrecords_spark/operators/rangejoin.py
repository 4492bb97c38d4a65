"""Point-in-interval (range) join — the §2.7 join variant Spark has no
single built-in for.

A naive range join is a cross join + inequality filter — O(points ×
intervals). The scale-safe shape here is BUCKETING: pick a bucket width ≈
the maximum interval length, explode each interval to the buckets its span
covers (≤ ⌈len/width⌉ + 1, i.e. ~2 for width ≈ max length), bucket each
point once, equi-join on the bucket, then apply the exact residual
predicate. Shuffle ∝ points + intervals·(span/width) — never a cross
product, no broadcast requirement on either side, and AQE/skew handling
applies because it IS an equi-join. (Same trick production engines use for
ST/temporal range joins; cf. Spark's own range-join hints in Databricks.)

Results are exactly the inequality-join semantics, so the oracle states
the naive form declaratively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_of(expr_sql: str, width: int) -> Column:
    # Floor division kept entirely in long space: pmod makes the numerator
    # an exact non-negative-remainder multiple of width, so SQL `div`
    # (integer truncation) equals floor — exact for the full long range.
    # A `/`-based form would round through double and can misbucket values
    # above 2^53 (e.g. nanosecond-unit timestamps ~1.7e18).
    return F.expr(f"(({expr_sql}) - pmod(({expr_sql}), {width})) div {width}")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of point rows to every interval row with
    start ≤ ts < end (half-open, the window convention). ``point_ts``,
    ``start_col``, ``end_col`` must share an integer unit (e.g. epoch µs).
    Pick ``bucket_width`` ≈ the maximum interval length: each interval then
    explodes to ≤ 2-3 buckets. Output: all point columns + all interval
    columns (names must not collide apart from the join machinery)."""
    pts = points.withColumn("_bkt", _bucket_of(point_ts, bucket_width))
    ivs = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                _bucket_of(start_col, bucket_width),
                # end is exclusive: the last bucket that can contain a
                # matching point is bucket(end - 1)
                _bucket_of(f"{end_col} - 1", bucket_width),
            )
        ),
    )
    return (
        pts.join(ivs, "_bkt")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_bkt")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Inner join of the two interval tables on the OVERLAP predicate
    ``l.start < r.end AND r.start < l.end`` (half-open intervals, shared
    integer unit). Same bucketing scheme as :func:`interval_join`, now on
    BOTH sides, plus the canonical-bucket trick for exactly-once output:

    a pair of overlapping intervals shares every bucket in
    [bucket(max(starts)), bucket(min(ends)-1)] — emitting on each would
    duplicate the pair, and a DISTINCT to repair that would shuffle the
    whole join output. Instead each joined pair is kept only in the
    single bucket containing max(starts) (both explosions cover it, since
    max(starts) < min(ends) whenever the pair overlaps), so the output is
    exactly-once BY CONSTRUCTION — no dedup shuffle. Shuffle volume stays
    ∝ rows·(span/width) per side and the join is an equi-join, so AQE
    skew splitting still applies.

    ``extra_keys``: same-named columns on both sides folded into the
    equi-join key (e.g. a partition entity id), narrowing candidate pairs
    before the residual predicate runs.
    """
    lb = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                _bucket_of(left_start, bucket_width),
                _bucket_of(f"{left_end} - 1", bucket_width),
            )
        ),
    )
    rb = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                _bucket_of(right_start, bucket_width),
                _bucket_of(f"{right_end} - 1", bucket_width),
            )
        ),
    )
    return (
        lb.join(rb, ["_bkt", *extra_keys])
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
        )
        .filter(
            F.col("_bkt")
            == _bucket_of(
                f"greatest({left_start}, {right_start})", bucket_width
            )
        )
        .drop("_bkt")
    )
