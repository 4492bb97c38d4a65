"""R1/R2 invariants (SURVEY §5): splits disjoint+complete with ratio
tolerance; shuffle preserves the multiset while decorrelating order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.operators.shuffle import shuffle
from videos_to_tfrecords_spark.operators.split import (
    hash_bucket_split,
    randomly_split,
    with_random_split,
)
from videos_to_tfrecords_spark.sources.tables import load_table


def test_random_split_disjoint_complete_ratioed(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    parts = randomly_split(orders, seed=42)
    counts = {k: v.count() for k, v in parts.items()}
    assert sum(counts.values()) == n  # complete
    key_sets = {k: {r.o_orderkey for r in v.select("o_orderkey").collect()} for k, v in parts.items()}
    assert not (key_sets["Train"] & key_sets["Val"])  # disjoint
    assert not (key_sets["Train"] & key_sets["Test"])
    assert not (key_sets["Val"] & key_sets["Test"])
    # ±5 pp at n=1500 (FIXTURES.md oracle note)
    assert abs(counts["Train"] / n - 0.70) < 0.05
    assert abs(counts["Val"] / n - 0.15) < 0.05
    assert abs(counts["Test"] / n - 0.15) < 0.05
    # dataset column stamped with the split name (preprocess.py:58-66)
    assert parts["Val"].filter(F.col("dataset") != "Val").count() == 0


def test_split_ratio_validation():
    with pytest.raises(ValueError):
        with_random_split(None, 0.5, 0.2, 0.2)  # sums to 0.9 → rejected


def test_hash_split_deterministic(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    a = hash_bucket_split(orders, "o_orderkey").groupBy("dataset").count().collect()
    b = hash_bucket_split(orders, "o_orderkey").groupBy("dataset").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_shuffle_preserves_multiset_and_decorrelates(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber").limit(2000)
    before = sorted(map(tuple, li.collect()))
    shuffled = shuffle(li, num_partitions=4, seed=11)
    after_rows = shuffled.collect()
    assert sorted(map(tuple, after_rows)) == before  # multiset preserved
    # order actually changed (decorrelation — the whole point of R2)
    assert list(map(tuple, after_rows)) != list(map(tuple, li.collect()))


def test_salted_sum_matches_plain_on_skewed_data(spark):
    """The skew defense must be result-identical: one hot key holding ~90%
    of rows, salted two-phase agg == plain groupBy."""
    from pyspark.sql import functions as F

    from videos_to_tfrecords_spark.operators.relational import salted_sum

    hot = spark.range(90_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(10_000).select((F.col("id") % 50 + 2).alias("k"), F.col("id").alias("v"))
    df = hot.unionByName(cold)
    salted = {r.k: r.s for r in salted_sum(df, ["k"], "v", alias="s", n_salt=16).collect()}
    plain = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert salted == plain


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property check of the union+carry-forward as-of against pandas'
    reference implementation on seeded random data."""
    import numpy as np
    import pandas as pd

    from videos_to_tfrecords_spark.operators.relational import asof_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 4, 60),
            "ts": rng.randint(0, 1000, 60).astype("int64"),
            "lid": np.arange(60, dtype="int64"),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.randint(0, 4, 30),
                "ts": rng.randint(0, 1000, 30).astype("int64"),
                "rv": np.arange(30, dtype="int64") * 10,
            }
        )
        .groupby(["k", "ts"], as_index=False)
        .agg(rv=("rv", "max"))  # unique (k, ts) on the right
    )
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = {
        r.lid: r.asof_rv
        for r in asof_join(ldf, rdf, ["k"], "ts", "ts", ["rv"]).collect()
    }
    want_df = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
    )
    want = {int(r.lid): (None if pd.isna(r.rv) else int(r.rv)) for r in want_df.itertuples()}
    assert got == want


def test_asof_join_multiple_value_columns(spark):
    from videos_to_tfrecords_spark.operators.relational import asof_join

    left = spark.createDataFrame([(1, 100, 7)], "k long, ts long, lv long")
    right = spark.createDataFrame(
        [(1, 50, 10, "a"), (1, 90, 20, "b"), (1, 150, 30, "c")],
        "k long, ts long, rv long, tag string",
    )
    out = asof_join(left, right, ["k"], "ts", "ts", ["rv", "tag"]).collect()[0]
    assert (out.asof_rv, out.asof_tag, out.asof_ts) == (20, "b", 90)
    assert out.lv == 7


def test_asof_join_null_right_values_carry_atomically(spark):
    """A right row with NULL in one value column must supersede the prior
    right row WHOLESALE (ASOF JOIN / merge_asof semantics) — round-1 review
    finding: per-column last(ignorenulls) mixed values from different right
    rows and treated NULL updates as no-ops."""
    from videos_to_tfrecords_spark.operators.relational import asof_join

    ldf = spark.createDataFrame([("k", 10, 1), ("k", 30, 2)], "k string, ts long, lid long")
    rdf = spark.createDataFrame(
        [("k", 5, 100, "a"), ("k", 20, None, "b")],
        "k string, ts long, rv1 long, rv2 string",
    )
    out = {
        r.lid: (r.asof_rv1, r.asof_rv2, r.asof_ts)
        for r in asof_join(ldf, rdf, ["k"], "ts", "ts", ["rv1", "rv2"]).collect()
    }
    assert out[1] == (100, "a", 5)
    # ts=30 sees the ts=20 right row atomically: rv1 is NULL (not the stale
    # 100 from ts=5), rv2 is "b"
    assert out[2] == (None, "b", 20)


def test_interval_join_bucketed_equals_naive(spark):
    """Bucketed range join == naive inequality join on adversarial
    geometry: overlapping intervals, an interval spanning many buckets,
    points on boundaries (start inclusive, end exclusive), and points
    matching nothing."""
    from videos_to_tfrecords_spark.operators.rangejoin import interval_join

    ivs = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 150), (3, 40, 1000), (4, 2000, 2010)],
        "iv_id long, s long, e long",
    )
    pts = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 49, 50, 99, 100, 149, 500, 999, 1000, 1500, 2000, 2009, 2010])],
        "pt_id long, ts long",
    )
    for width in (7, 100, 1000):  # width ≪, ≈, ≫ interval lengths
        got = sorted(
            (r.pt_id, r.iv_id)
            for r in interval_join(pts, ivs, "ts", "s", "e", bucket_width=width).collect()
        )
        naive = sorted(
            (r.pt_id, r.iv_id)
            for r in pts.crossJoin(ivs)
            .filter("ts >= s and ts < e")
            .collect()
        )
        assert got == naive and len(naive) > 0


def test_interval_join_exact_past_double_precision(spark):
    """Bucket assignment must stay exact for longs beyond 2^53 (nanosecond
    epochs ≈ 1.7e18): a `/`-through-double bucket computation rounds and
    silently drops boundary matches (round-2 ADVICE fix — `div` in long
    space). Points sit exactly ON bucket/interval boundaries at ns scale."""
    from videos_to_tfrecords_spark.operators.rangejoin import interval_join

    base = 1_700_000_000_000_000_123  # > 2^53, not double-representable
    width = 3_600_000_000_000  # 1h in ns
    ivs = spark.createDataFrame(
        [(1, base, base + width), (2, base + width - 1, base + 3 * width)],
        "iv_id long, s long, e long",
    )
    pts = spark.createDataFrame(
        [
            (0, base),
            (1, base + width - 1),
            (2, base + width),
            (3, base + 3 * width - 1),
            (4, base + 3 * width),
        ],
        "pt_id long, ts long",
    )
    got = sorted(
        (r.pt_id, r.iv_id)
        for r in interval_join(pts, ivs, "ts", "s", "e", bucket_width=width).collect()
    )
    naive = sorted(
        (r.pt_id, r.iv_id)
        for r in pts.crossJoin(ivs).filter("ts >= s and ts < e").collect()
    )
    assert got == naive == [(0, 1), (1, 1), (1, 2), (2, 2), (3, 2)]


def test_interval_overlap_join_exactly_once_equals_naive(spark):
    """interval_overlap_join == naive overlap self-join on adversarial
    geometry — in particular a pair sharing MANY buckets (long × long
    overlap) must come out exactly once (canonical max-starts bucket, no
    DISTINCT), and touching half-open intervals (a.e == b.s) must NOT
    match."""
    from videos_to_tfrecords_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rows = [
        (1, 0, 1000),  # long; overlaps 2, 3, 4
        (2, 500, 1500),  # long; shares 500..1000 with 1 (many buckets)
        (3, 999, 1001),  # straddles a boundary
        (4, 0, 7),  # sub-bucket
        (5, 1000, 1002),  # touches 1 (half-open: no overlap with 1)
        (6, 5000, 5001),  # isolated
    ]
    left = spark.createDataFrame(rows, "a_id long, a_s long, a_e long")
    right = spark.createDataFrame(rows, "b_id long, b_s long, b_e long")
    for width in (7, 100, 2000):
        got = sorted(
            (r.a_id, r.b_id)
            for r in interval_overlap_join(
                left, right, "a_s", "a_e", "b_s", "b_e", bucket_width=width
            )
            .filter("a_id < b_id")
            .collect()
        )
        naive = sorted(
            (r.a_id, r.b_id)
            for r in left.crossJoin(right)
            .filter("a_s < b_e and b_s < a_e and a_id < b_id")
            .collect()
        )
        assert got == naive == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 5), (3, 5)]
