"""Sequence assembly: window assignment closed form (SURVEY §5), P9
partial-window semantics, pivot shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from videos_to_tfrecords_spark.operators.sequence import (
    assign_windows,
    crop_video,
    format_features,
    single_frame,
    to_full_video,
)


def expected_windows(ts_ms: float, size: int, slide: int) -> set[int]:
    """Closed form (SURVEY §5): starts k·slide for
    k ∈ [⌈(ts−size)/slide⌉+1−?…⌊ts/slide⌋] — equivalently all aligned starts
    s with s ≤ ts < s+size."""
    top = math.floor(ts_ms / slide) * slide
    out = set()
    s = top
    while s > ts_ms - size:
        out.add(s)
        s -= slide
    return out


def test_window_assignment_matches_closed_form(spark):
    rows = [(float(t),) for t in [0, 1, 499, 500, 999, 1500, 14999, 15000, 15001, 30500]]
    df = spark.createDataFrame(rows, "ts_ms double")
    got = (
        assign_windows(df, "ts_ms", size_ms=15000, slide_ms=1000)
        .select("ts_ms", "win_start_ms")
        .collect()
    )
    actual: dict[float, set[int]] = {}
    for r in got:
        actual.setdefault(r.ts_ms, set()).add(r.win_start_ms)
    for ts, wins in actual.items():
        assert wins == expected_windows(ts, 15000, 1000), ts


def test_crop_video_reference_policy_keeps_first_window(spark):
    # video shorter than one window: ONLY the [0, size) window survives via
    # the window.end == size disjunct (reference preprocess.py:294)
    rows = [("v", 0.0, 1.0), ("v", 500.0, 2.0)]
    df = spark.createDataFrame(rows, "filename string, timestamp_ms double, v double")
    df = df.withColumn("len_ms", F.lit(900.0))
    out = crop_video(
        df,
        ts_ms_col="timestamp_ms",
        key_cols=["filename"],
        size_ms=4000,
        slide_ms=1000,
        length_ms_col="len_ms",
        partial_policy="reference",
    ).collect()
    assert len(out) == 1
    assert (out[0].win_start_ms, out[0].win_end_ms) == (0, 4000)
    assert [f.v for f in out[0].frames] == [1.0, 2.0]


def test_crop_video_drops_overrunning_windows(spark):
    # 10 s video, 4 s windows sliding 1 s: starts 0..6 keep (end ≤ 10 s),
    # starts 7..9 overrun → dropped; negative starts dropped; start 0 kept
    rows = [("v", float(t * 1000), float(t)) for t in range(10)]
    df = spark.createDataFrame(rows, "filename string, timestamp_ms double, v double")
    df = df.withColumn("len_ms", F.lit(10_000.0))
    out = crop_video(
        df,
        ts_ms_col="timestamp_ms",
        key_cols=["filename"],
        size_ms=4000,
        slide_ms=1000,
        length_ms_col="len_ms",
        partial_policy="reference",
    ).collect()
    starts = sorted(r.win_start_ms for r in out)
    assert starts == [i * 1000 for i in range(7)]
    full = [r for r in out if r.win_start_ms == 3000][0]
    assert [f.v for f in full.frames] == [3.0, 4.0, 5.0, 6.0]


def test_keep_all_includes_negative_starts(spark):
    rows = [("v", 500.0, 1.0)]
    df = spark.createDataFrame(rows, "filename string, timestamp_ms double, v double")
    out = crop_video(
        df,
        ts_ms_col="timestamp_ms",
        key_cols=["filename"],
        size_ms=4000,
        slide_ms=1000,
        partial_policy="keep_all",
    ).collect()
    assert sorted(r.win_start_ms for r in out) == [-3000, -2000, -1000, 0]


def test_full_video_sorts_and_pivots(spark):
    rows = [
        ("a", 500.0, 2.0, "L"),
        ("a", 0.0, 1.0, "L"),
        ("b", 100.0, 9.0, "M"),
    ]
    df = spark.createDataFrame(rows, "filename string, timestamp_ms double, v double, label string")
    full = to_full_video(df, ts_ms_col="timestamp_ms", key_cols=["filename"])
    out = format_features(full, context_cols=["label"], list_cols=["v", "timestamp_ms"])
    rows_out = {r.filename: r for r in out.collect()}
    assert rows_out["a"].v == [1.0, 2.0]  # time-sorted (G5)
    assert rows_out["a"].timestamp_ms == [0.0, 500.0]
    assert rows_out["a"].label == "L"  # context from first frame (G6)
    assert rows_out["b"].v == [9.0]


def test_single_frame_narrow(spark):
    df = spark.createDataFrame([("a", 1.0, 5.0)], "filename string, timestamp_ms double, v double")
    out = single_frame(df, ts_ms_col="timestamp_ms", key_cols=["filename"]).collect()
    assert len(out) == 1 and len(out[0].frames) == 1


def test_crop_video_tumbling_fallback(spark):
    """period omitted → tumbling (reference preprocess.py:330): every frame
    in exactly one window."""
    rows = [("v", float(t * 500), float(t)) for t in range(8)]  # 0..3500ms
    df = spark.createDataFrame(rows, "filename string, timestamp_ms double, v double")
    out = crop_video(
        df,
        ts_ms_col="timestamp_ms",
        key_cols=["filename"],
        size_ms=2000,
        slide_ms=None,  # tumbling fallback
        partial_policy="keep_all",
    ).collect()
    assert sorted(r.win_start_ms for r in out) == [0, 2000]
    total_frames = sum(len(r.frames) for r in out)
    assert total_frames == 8  # each frame exactly once


def test_crop_video_composite_keys(spark):
    """Multi-column grouping key (the reference's (window, filename) is one
    key; the operator generalizes to composite keys)."""
    rows = [
        ("a", "x", 0.0, 1.0),
        ("a", "x", 500.0, 2.0),
        ("a", "y", 0.0, 3.0),
        ("b", "x", 0.0, 4.0),
    ]
    df = spark.createDataFrame(rows, "f string, cam string, timestamp_ms double, v double")
    out = crop_video(
        df,
        ts_ms_col="timestamp_ms",
        key_cols=["f", "cam"],
        size_ms=2000,
        slide_ms=2000,
        partial_policy="keep_all",
    ).collect()
    groups = {(r.f, r.cam): [fr.v for fr in r.frames] for r in out}
    assert groups == {("a", "x"): [1.0, 2.0], ("a", "y"): [3.0], ("b", "x"): [4.0]}


def test_paned_sliding_stats_equal_naive_window_agg(spark):
    """sliding_window_stats_paned (two-level pane aggregation, no row
    explosion) must equal the naive assign-each-row-to-r-windows shape —
    the paned plan is purely physical."""
    from pyspark.sql import functions as F

    from videos_to_tfrecords_spark.operators.sequence import (
        assign_windows,
        sliding_window_stats_paned,
    )

    rows = [("u%d" % (i % 5), float(i * 137 % 40_000), i % 97) for i in range(4000)]
    df = spark.createDataFrame(rows, "k string, ts_ms double, v long")

    paned = {
        (r.k, r.win_start_ms): (r.n_events, r.sum_value, r.min_value, r.max_value, r.win_end_ms)
        for r in sliding_window_stats_paned(
            df, "ts_ms", ["k"], "v", size_ms=8000, slide_ms=2000
        ).collect()
    }
    naive = {
        (r.k, r.win_start_ms): (r.n_events, r.sum_value, r.min_value, r.max_value, r.win_end_ms)
        for r in assign_windows(df, "ts_ms", size_ms=8000, slide_ms=2000)
        .groupBy("k", "win_start_ms", "win_end_ms")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("v").alias("sum_value"),
            F.min("v").alias("min_value"),
            F.max("v").alias("max_value"),
        )
        .collect()
    }
    assert paned == naive
