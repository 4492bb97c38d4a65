"""Queries exercising the reference's own operator surface (SURVEY §2).

The reference's data model is frames-of-a-video; the driver tables map onto
it as: ``events`` = frames (user_id ≈ filename as the grouping key, ts ≈
frame timestamp, value ≈ a 1-d logit), ``documents`` provides path-shaped
strings for the filename ops. Each query composes the engine's operators and
is hash-checked against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.operators.filenames import extract_label, filter_extensions
from videos_to_tfrecords_spark.operators.sequence import (
    crop_video,
    format_features,
    single_frame,
    sliding_window_stats_paned,
    to_full_video,
)
from videos_to_tfrecords_spark.operators.shuffle import shuffle
from videos_to_tfrecords_spark.operators.split import hash_bucket_split, randomly_split
from videos_to_tfrecords_spark.plans.registry import query
from videos_to_tfrecords_spark.sources.tables import load_table

# Sliding-window geometry for the events "video" timeline: 1 h windows
# sliding by 15 min (the reference's 15 s / 1 s geometry scaled to the
# events table's per-user event density; reference run_preprocess.py:98-109).
SIZE_MS = 3_600_000
SLIDE_MS = 900_000
_SIZE_US = SIZE_MS * 1000
_SLIDE_US = SLIDE_MS * 1000


def _events_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → per-user relative-ms timeline (the reference's frame
    timestamps are ms offsets from video start, SURVEY §1.3).

    Per-key min/max via groupBy + broadcast join back, NOT window functions:
    a WindowExec sorts the whole table per key, while the aggregate is a
    hash-agg producing |keys| rows that broadcast — the plan that holds when
    the events table is 100 TB and keys are few-per-million-rows."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    base = ev.select("user_id", "value", "event_type", us.alias("us"))
    bounds = base.groupBy("user_id").agg(
        F.min("us").alias("min_us"), F.max("us").alias("max_us")
    )
    return base.join(F.broadcast(bounds), "user_id").select(
        "user_id",
        "value",
        "event_type",
        ((F.col("us") - F.col("min_us")) / F.lit(1000.0)).alias("rel_ms"),
        ((F.col("max_us") - F.col("min_us")) / F.lit(1000.0)).alias("length_ms"),
    )


def _seq_col(frames="frames") -> F.Column:
    """Comma-joined value-cents, in frame (time) order — the value-sequence
    fingerprint used to hash-compare assembled sequences."""
    return F.concat_ws(
        ",", F.transform(frames, lambda f: F.round(f["value"] * 100).cast("long").cast("string"))
    )


_CROP_ORACLE = f"""
WITH e AS (
  SELECT user_id, value, event_type,
         (epoch_ns(ts)//1000) - min((epoch_ns(ts)//1000)) OVER (PARTITION BY user_id) AS rel_us,
         max((epoch_ns(ts)//1000)) OVER (PARTITION BY user_id)
           - min((epoch_ns(ts)//1000)) OVER (PARTITION BY user_id) AS len_us
  FROM events
), x AS (
  SELECT e.*, t.ws FROM e,
  LATERAL (SELECT unnest(generate_series(
      (rel_us // {_SLIDE_US}) * {_SLIDE_US} - {_SIZE_US - _SLIDE_US},
      (rel_us // {_SLIDE_US}) * {_SLIDE_US},
      {_SLIDE_US})) AS ws) t
), f AS (
  SELECT * FROM x
  WHERE ws + {_SIZE_US} = {_SIZE_US} OR (ws >= 0 AND ws + {_SIZE_US} <= len_us)
)
SELECT user_id,
       ws // 1000 AS win_start_ms,
       (ws + {_SIZE_US}) // 1000 AS win_end_ms,
       CAST(count(*) AS BIGINT) AS n_events,
       split_part(string_agg(event_type, ',' ORDER BY rel_us, value, event_type), ',', 1)
         AS first_type,
       string_agg(CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR), ','
                  ORDER BY rel_us, value, event_type) AS seq
FROM f GROUP BY 1, 2, 3
"""


@query("crop_video_events", _CROP_ORACLE)
def q_crop_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — the reference's crop_video mode (preprocess.py:327-344):
    sliding event-time windows over each user's relative timeline, grouped by
    (window × user), partial windows suppressed per P9 (keep the first
    full-length window always; drop windows overrunning the stream's end),
    frames collected time-sorted. Exercises W1-W3, G2-G6, P9 in one plan."""
    base = _events_timeline(spark, sf_dir)
    crop = crop_video(
        base,
        ts_ms_col="rel_ms",
        key_cols=["user_id"],
        size_ms=SIZE_MS,
        slide_ms=SLIDE_MS,
        length_ms_col="length_ms",
        partial_policy="reference",
    )
    return crop.select(
        "user_id",
        "win_start_ms",
        "win_end_ms",
        F.size("frames").cast("long").alias("n_events"),
        F.col("frames")[0]["event_type"].alias("first_type"),
        _seq_col().alias("seq"),
    )


@query(
    "tumbling_window_stats",
    """
SELECT ((epoch_ns(ts)//1000) // 86400000000) * 86400 AS win_start_s,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
""",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (W2 with period = size,
    reference preprocess.py:330) as a daily aggregate, F.window on the real
    TimestampType column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            (F.unix_micros("w.start") / 1_000_000).cast("long").alias("win_start_s"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


@query(
    "full_video_sequences",
    """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       split_part(string_agg(event_type, ',' ORDER BY (epoch_ns(ts)//1000), value, event_type), ',', 1)
         AS first_type,
       string_agg(CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR), ','
                  ORDER BY (epoch_ns(ts)//1000), value, event_type) AS seq
FROM events GROUP BY user_id
""",
)
def q_full_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_full_video mode (reference preprocess.py:347-357): one time-sorted
    sequence per key (G1 + G4 + G5)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value", "event_type"
    )
    full = to_full_video(ev, ts_ms_col="ts_us", key_cols=["user_id"])
    return full.select(
        "user_id",
        F.size("frames").cast("long").alias("n_events"),
        F.col("frames")[0]["event_type"].alias("first_type"),
        _seq_col().alias("seq"),
    )


@query(
    "single_frame_sequences",
    """
SELECT event_id, user_id, event_type,
       CAST(1 AS BIGINT) AS n_events,
       CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR) AS seq
FROM events
""",
)
def q_single_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """single_frame mode (reference preprocess.py:405-406): each row its own
    1-frame sequence, then FormatFeatures' pivot (G6) — context columns from
    the (only) frame, list columns as length-1 arrays. Narrow plan: no
    shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type", "value"
    )
    seqs = single_frame(ev, ts_ms_col="ts_us", key_cols=["event_id"])
    out = format_features(seqs, context_cols=["user_id", "event_type"], list_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.size("value").cast("long").alias("n_events"),
        F.concat_ws(
            ",", F.transform("value", lambda v: F.round(v * 100).cast("long").cast("string"))
        ).alias("seq"),
    )


_FILES_SQL = """
  SELECT doc_id,
         concat('gs://data/', lang, '/', source, '/clip_', CAST(doc_id AS VARCHAR),
                CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN '.mp4' WHEN 1 THEN '.avi'
                     WHEN 2 THEN '.mkv' ELSE '.txt' END) AS filename
  FROM documents
"""


def _files_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ext = (
        F.when(F.col("doc_id") % 4 == 0, ".mp4")
        .when(F.col("doc_id") % 4 == 1, ".avi")
        .when(F.col("doc_id") % 4 == 2, ".mkv")
        .otherwise(".txt")
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("gs://data/"),
            "lang",
            F.lit("/"),
            "source",
            F.lit("/clip_"),
            F.col("doc_id").cast("string"),
            ext,
        ).alias("filename"),
    )


@query(
    "filename_extension_filter",
    f"""
WITH files AS ({_FILES_SQL})
SELECT doc_id, filename FROM files
WHERE string_split(filename, '.')[-1] IN ('mkv', 'avi', 'mp4')
""",
)
def q_extension_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 (reference preprocess.py:320-323): keep filenames whose last
    '.'-segment is a video extension. Pure Catalyst split/isin."""
    return filter_extensions(_files_df(spark, sf_dir))


@query(
    "filename_extract_label",
    f"""
WITH files AS ({_FILES_SQL})
SELECT doc_id, filename, string_split(filename, '/')[-3] AS label
FROM files WHERE string_split(filename, '.')[-1] IN ('mkv', 'avi', 'mp4')
""",
)
def q_extract_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 (reference preprocess.py:268-274): label = 3rd-from-last path
    segment — here the doc's lang directory."""
    return extract_label(filter_extensions(_files_df(spark, sf_dir)))


@query(
    "hash_bucket_split_counts",
    """
WITH b AS (
  SELECT o_totalprice,
         CASE WHEN (o_orderkey * 9973 + 7) % 100 < 15 THEN 'Test'
              WHEN (o_orderkey * 9973 + 7) % 100 < 30 THEN 'Val'
              ELSE 'Train' END AS dataset
  FROM orders
)
SELECT dataset, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM b GROUP BY dataset
""",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1's deterministic twin (SURVEY §5): arithmetic-bucket split with the
    same Test/Val/Train boundary layout as randomly_split
    (reference preprocess.py:58-66), value-checkable cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        hash_bucket_split(orders, "o_orderkey")
        .groupBy("dataset")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
        )
    )


@query("random_split_sizes")  # no oracle: seeded rand() is engine-specific;
def q_random_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 proper (reference preprocess.py:36-70). Seeded ``rand()`` draws are
    not reproducible in another engine, so this is rows-only here; the split
    invariants (disjoint, complete, ratios within tolerance) are pytest-
    asserted in tests/test_split.py."""
    orders = load_table(spark, sf_dir, "orders")
    parts = randomly_split(orders, seed=42)
    stamped = parts["Train"].unionByName(parts["Val"]).unionByName(parts["Test"])
    return stamped.groupBy("dataset").agg(F.count("*").alias("n")).orderBy("dataset")


@query(
    "shuffle_preserves_multiset",
    """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS checksum_cents
FROM lineitem
""",
)
def q_shuffle_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 (reference preprocess.py:73-79): the randomizing reshuffle before
    the sink write. Row order is the point and can't be hash-compared, so the
    query proves the multiset is preserved: aggregate AFTER the shuffle and
    compare with the oracle's plain aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return shuffle(li, seed=7).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("checksum_cents"),
    )


@query(
    "frame_downsample_buckets",
    """
WITH e AS (
  SELECT user_id, event_id,
         (epoch_ns(ts)//1000) - min((epoch_ns(ts)//1000)) OVER (PARTITION BY user_id) AS rel_us
  FROM events
), r AS (
  SELECT user_id, rel_us // 3600000000 AS bucket, event_id,
         row_number() OVER (PARTITION BY user_id, rel_us // 3600000000
                            ORDER BY rel_us, event_id) AS rn
  FROM e
)
SELECT user_id, CAST(bucket AS BIGINT) AS bucket, event_id FROM r WHERE rn = 1
""",
)
def q_frame_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8's relational analog (reference preprocess.py:172-177 keeps one
    frame per skip_msec): keep the earliest event per (user, hour-bucket).
    The reference's exact anchored-scan semantics (next kept frame ≥ last
    kept + skip) is sequential per key and lives in
    operators/sampling.sample_frames_exact, pytest-verified."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    us = F.unix_micros("ts")
    rel = (us - F.min(us).over(w)).alias("rel_us")
    e = ev.select("user_id", "event_id", rel)
    bucket = (F.col("rel_us") / F.lit(3_600_000_000)).cast("long")
    wb = Window.partitionBy("user_id", "bucket").orderBy("rel_us", "event_id")
    return (
        e.withColumn("bucket", bucket)
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("user_id", "bucket", "event_id")
    )


@query(
    "arithmetic_normalize",
    """
SELECT event_id,
       CAST(floor(value / 255.0 * 1000000) AS BIGINT) AS norm_x1e6,
       CAST(round(value) AS BIGINT) AS rounded,
       CAST(1000.0 * 90.0 / 30.0 AS BIGINT) AS video_length_ms,
       list_reverse(string_split(event_type, ''))[1] AS last_char
FROM events
""",
)
def q_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7's scalar arithmetic surface (reference preprocess.py:178-184,293):
    /255 normalization, round(), the video_length = 1000·frame_total/fps
    formula (literal operands here), and an array reverse (the BGR→RGB
    channel flip's relational analog)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.floor(F.col("value") / 255.0 * 1_000_000).cast("long").alias("norm_x1e6"),
        F.round("value").cast("long").alias("rounded"),
        (F.lit(1000.0) * 90.0 / 30.0).cast("long").alias("video_length_ms"),
        F.reverse(F.split("event_type", ""))[0].alias("last_char"),
    )


@query(
    "url_parsing",
    f"""
WITH files AS ({_FILES_SQL})
SELECT doc_id,
       split_part(filename, '://', 1) AS scheme,
       split_part(split_part(filename, '://', 2), '/', 1) AS bucket,
       string_split(filename, '/')[-1] AS basename
FROM files
""",
)
def q_url_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (the reference's urlparse at preprocess.py:163):
    scheme / bucket / object basename from storage URLs — split-based so
    the same semantics run on both engines."""
    files = _files_df(spark, sf_dir)
    return files.select(
        "doc_id",
        F.split_part(F.col("filename"), F.lit("://"), F.lit(1)).alias("scheme"),
        F.split_part(
            F.split_part(F.col("filename"), F.lit("://"), F.lit(2)), F.lit("/"), F.lit(1)
        ).alias("bucket"),
        F.element_at(F.split("filename", "/"), -1).alias("basename"),
    )


@query(
    "timestamp_formatting",
    """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS day_str,
       strftime(o_orderdate, '%Y%m%d-%H%M%S') AS job_ts
FROM orders WHERE o_orderkey % 50 = 0
""",
)
def q_timestamp_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp formatting (the reference's strftime job-name stamps,
    run_preprocess.py:32): date_format patterns matching strftime output."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day_str"),
        F.date_format("o_orderdate", "yyyyMMdd-HHmmss").alias("job_ts"),
    )


_PANED_SLIDE_US = 6 * 3600 * 1_000_000  # 6h slide
_PANED_SIZE_MS = 24 * 3600 * 1000  # 1d windows → r = 4, the flagship geometry


@query(
    "sliding_window_stats_paned",
    f"""
WITH x AS (SELECT event_type, (epoch_ns(ts) // 1000) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
w AS (SELECT event_type, cents,
             (ts_us - ((ts_us % {_PANED_SLIDE_US}) + {_PANED_SLIDE_US}) % {_PANED_SLIDE_US})
               - i * {_PANED_SLIDE_US} AS ws_us
      FROM x, range(0, 4) t(i))
SELECT event_type, CAST(ws_us // 1000 AS BIGINT) AS win_start_ms,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_value,
       CAST(min(cents) AS BIGINT) AS min_value,
       CAST(max(cents) AS BIGINT) AS max_value,
       CAST(ws_us // 1000 + {_PANED_SIZE_MS} AS BIGINT) AS win_end_ms
FROM w GROUP BY event_type, ws_us
""",
)
def q_sliding_window_stats_paned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window stats via the two-level PANED aggregation (W2 for
    stats-only consumers): rows aggregate once into 6h panes (no row
    explosion — crop_video\'s shape would shuffle 4x the rows at this
    1d/6h geometry), then pane partials explode x4 and combine. The oracle
    states the naive per-row window assignment declaratively; results are
    identical — the paned shape is purely physical."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.unix_micros("ts") / 1000).alias("ts_ms"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return sliding_window_stats_paned(
        base,
        ts_ms_col="ts_ms",
        key_cols=["event_type"],
        value_col="cents",
        size_ms=_PANED_SIZE_MS,
        slide_ms=6 * 3600 * 1000,
    )
