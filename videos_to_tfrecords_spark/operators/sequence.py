"""Sequence assembly: the reference's three --mode variants + feature pivot.

Reference parity (SURVEY §2.4-2.5):
- ``crop_video``  — reference preprocess.py:327-344: assign sliding
  event-time windows (size=sequence_length, period; period defaults to size
  → tumbling, preprocess.py:330), group by (window, filename)
  (preprocess.py:283-296), suppress partial windows (P9), collect frames.
- ``to_full_video`` — reference preprocess.py:347-357: group all frames by
  filename, collect.
- ``single_frame`` — reference preprocess.py:405-406: each frame is its own
  1-element sequence.
- ``format_features`` — reference preprocess.py:299-310 + 360-368: sort each
  group's frames by timestamp_ms (G5), take context columns from the FIRST
  frame (preprocess.py:303-304), pivot list columns into parallel arrays
  (preprocess.py:306-307).

Spark design: the collected group is ``sort_array(collect_list(struct(ts,
...)))`` — struct ordering puts the timestamp first so the lexicographic
array sort IS the in-group time sort, with deterministic tie-breaks on the
remaining fields (Beam's list.sort is stable but arrival order is
nondeterministic; this is strictly more deterministic). Window assignment is
``F.window`` over an integer-microsecond timeline, so bounds are exact
integers and oracle-comparable.

Partial-window rule (P9, reference preprocess.py:293-296) — documented
explicitly per SURVEY §7.3: keep a (window, video) group iff
``window.end == size`` (the first full-length window is ALWAYS kept, even
when the video is shorter than one window) OR
``window.start >= 0 AND window.end <= video_length`` (interior windows).
Note the disjunction precedence: windows overrunning the video's end are
dropped, except that first one.

Scale notes: one shuffle per grouping (the groupBy exchange) — same count as
the reference's GroupByKey (preprocess.py:338,353). Sliding windows multiply
rows by size/slide BEFORE the shuffle; keep list columns pruned to what the
sequence needs (the reference's own lesson: drop the image tensor before
grouping, preprocess.py:241). Skewed keys (one video with millions of
frames) are handled by AQE skew-join/partition splitting; the collected
per-group array must fit in one task — that is inherent to the semantics
(one output sequence per video) and holds at 100 TB because groups are
bounded by video length, not corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: reference run_preprocess.py:98-109 defaults (ms)
DEFAULT_SEQUENCE_LENGTH_MS = 15_000
DEFAULT_PERIOD_MS = 1_000


def _frames_struct(df: DataFrame, ts_col: str, key_cols: Sequence[str]) -> Column:
    """struct with ts first so sort_array orders by time then fields."""
    rest = [c for c in df.columns if c != ts_col and c not in key_cols]
    return F.struct(F.col(ts_col), *[F.col(c) for c in rest])


def assign_windows(
    df: DataFrame,
    ts_ms_col: str,
    size_ms: int = DEFAULT_SEQUENCE_LENGTH_MS,
    slide_ms: int | None = None,
) -> DataFrame:
    """Add integer win_start_ms / win_end_ms via event-time sliding windows.

    ``slide_ms=None`` → tumbling (reference preprocess.py:330 period
    fallback). The ms-offset timeline is converted to exact microseconds so
    ``F.window``'s epoch-aligned assignment (element ∈ ⌈size/slide⌉ windows)
    reproduces Beam SlidingWindows' 0-aligned assignment bit-exactly.
    """
    slide_ms = slide_ms or size_ms
    # round, don't truncate: an ms value like 123456.789 (derived from exact
    # integer microseconds) may sit an ulp below the true product after *1000
    ts_us = F.round(F.col(ts_ms_col).cast("double") * 1000, 0).cast("long")
    win = F.window(
        F.timestamp_micros(ts_us),
        f"{size_ms} milliseconds",
        f"{slide_ms} milliseconds",
    )
    return (
        df.withColumn("_win", win)
        .withColumn("win_start_ms", (F.unix_micros(F.col("_win.start")) / 1000).cast("long"))
        .withColumn("win_end_ms", (F.unix_micros(F.col("_win.end")) / 1000).cast("long"))
        .drop("_win")
    )


def crop_video(
    df: DataFrame,
    ts_ms_col: str = "timestamp_ms",
    key_cols: Sequence[str] = ("filename",),
    size_ms: int = DEFAULT_SEQUENCE_LENGTH_MS,
    slide_ms: int | None = None,
    length_ms_col: Column | str | None = None,
    partial_policy: str = "reference",
) -> DataFrame:
    """Sliding-window sequence assembly (reference crop_video mode).

    Returns one row per (window × key): key cols + win_start_ms/win_end_ms +
    ``frames`` (time-sorted array of structs of the remaining columns).

    partial_policy:
      - "reference": P9 exactly (keep first window always; drop overruns) —
        requires ``length_ms_col`` (the reference computes it as
        1000*frame_total/frame_per_sec, preprocess.py:293).
      - "complete_only": keep only windows fully inside [0, length].
      - "keep_all": no suppression.
    """
    slide_ms = slide_ms or size_ms
    keys = list(key_cols)
    windowed = assign_windows(df, ts_ms_col, size_ms, slide_ms)

    if partial_policy != "keep_all":
        if length_ms_col is None:
            raise ValueError(f"partial_policy={partial_policy!r} needs length_ms_col")
        length = F.col(length_ms_col) if isinstance(length_ms_col, str) else length_ms_col
        interior = (F.col("win_start_ms") >= 0) & (F.col("win_end_ms") <= length)
        if partial_policy == "reference":
            # preprocess.py:294: `window.end == sequence_length or (start>=0 and end<=len)`
            keep = (F.col("win_end_ms") == size_ms) | interior
        elif partial_policy == "complete_only":
            keep = interior
        else:
            raise ValueError(f"unknown partial_policy {partial_policy!r}")
        windowed = windowed.filter(keep)

    frame = _frames_struct(df, ts_ms_col, keys)
    return windowed.groupBy("win_start_ms", "win_end_ms", *keys).agg(
        F.sort_array(F.collect_list(frame)).alias("frames")
    )


def to_full_video(
    df: DataFrame,
    ts_ms_col: str = "timestamp_ms",
    key_cols: Sequence[str] = ("filename",),
) -> DataFrame:
    """Whole-stream grouping (reference to_full_video, preprocess.py:347-357):
    one time-sorted sequence per key."""
    frame = _frames_struct(df, ts_ms_col, key_cols)
    return df.groupBy(*key_cols).agg(F.sort_array(F.collect_list(frame)).alias("frames"))


def single_frame(
    df: DataFrame,
    ts_ms_col: str = "timestamp_ms",
    key_cols: Sequence[str] = ("filename",),
) -> DataFrame:
    """Each row its own 1-frame sequence (reference preprocess.py:405-406).
    Narrow (no shuffle)."""
    frame = _frames_struct(df, ts_ms_col, key_cols)
    return df.select(*key_cols, F.array(frame).alias("frames"))


def format_features(
    df: DataFrame,
    context_cols: Sequence[str],
    list_cols: Sequence[str],
    frames_col: str = "frames",
) -> DataFrame:
    """Pivot a sorted frames array into context scalars + parallel list arrays
    (reference FormatFeatures, preprocess.py:299-310).

    Context values come from the first (earliest) frame — exactly
    ``element[0][key]`` in the reference (preprocess.py:303-304). List
    columns become parallel arrays aligned by frame index. Pure Catalyst
    array expressions: no shuffle, no Python.
    """
    frames = F.col(frames_col)
    passthrough = [c for c in df.columns if c != frames_col]
    ctx = [frames[0][c].alias(c) for c in context_cols if c not in passthrough]
    lists = [F.transform(frames, lambda f: f[c]).alias(c) for c in list_cols]  # noqa: B023
    return df.select(*passthrough, *ctx, *lists)


def sliding_window_stats_paned(
    df: DataFrame,
    ts_ms_col: str,
    key_cols: Sequence[str],
    value_col: Column | str,
    size_ms: int = DEFAULT_SEQUENCE_LENGTH_MS,
    slide_ms: int = DEFAULT_PERIOD_MS,
) -> DataFrame:
    """Two-level "paned" sliding-window aggregation for STATS-ONLY
    consumers (count/sum/min/max per window × key).

    ``crop_video`` explodes every ROW into size/slide windows before its
    shuffle — unavoidable for sequence assembly, which must materialize the
    member rows per window, but pure overhead when the consumer only needs
    decomposable aggregates (the ``tumbling_window_stats`` shape at
    slide < size). Here rows aggregate ONCE into slide-sized panes (no
    explosion, map-side combine does most of the work), and only the PANE
    PARTIALS — ≈ distinct panes × size/slide, orders of magnitude fewer
    than rows at 100 TB — explode to their parent windows and combine.
    This is the classic stream-slicing scheme (Pairs/Scotty-style).

    When each wins: row explosion costs rows·(size/slide) shuffled bytes in
    one exchange; paned costs rows (narrow pane assignment + combine) plus
    panes·(size/slide) in a second tiny exchange. Paned wins whenever
    rows ≫ panes, i.e. any dense timeline; the naive shape only ties when
    almost every pane holds ≤1 row.

    Window geometry is identical to :func:`assign_windows` (epoch-aligned,
    exact integer µs; ``pmod`` keeps floor semantics for pre-epoch
    timestamps). Requires size_ms % slide_ms == 0. The value column should
    already be exact-typed (e.g. integer cents) for cross-engine parity.
    """
    if size_ms % slide_ms != 0:
        raise ValueError("paned aggregation needs size_ms % slide_ms == 0")
    r = size_ms // slide_ms
    keys = list(key_cols)
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    slide_us, size_us = slide_ms * 1000, size_ms * 1000
    ts_us = F.round(F.col(ts_ms_col).cast("double") * 1000, 0).cast("long")
    panes = (
        df.withColumn("_pane_us", ts_us - F.pmod(ts_us, F.lit(slide_us)))
        .withColumn("_v", value)
        .groupBy(*keys, "_pane_us")
        .agg(
            F.count("*").alias("_n"),
            F.sum("_v").alias("_s"),
            F.min("_v").alias("_mn"),
            F.max("_v").alias("_mx"),
        )
    )
    exploded = panes.withColumn(
        "_i", F.explode(F.sequence(F.lit(0), F.lit(r - 1)))
    ).withColumn(
        "win_start_ms",
        ((F.col("_pane_us") - F.col("_i") * slide_us) / 1000).cast("long"),
    )
    return (
        exploded.groupBy(*keys, "win_start_ms")
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_s").alias("sum_value"),
            F.min("_mn").alias("min_value"),
            F.max("_mx").alias("max_value"),
        )
        .withColumn("win_end_ms", F.col("win_start_ms") + F.lit(size_ms))
    )
