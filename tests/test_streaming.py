"""Structured Streaming parity: the streaming plan reproduces the batch
aggregate exactly on a bounded source."""

from __future__ import annotations

from pyspark.sql import functions as F

from videos_to_tfrecords_spark.sources.tables import load_table
from videos_to_tfrecords_spark.streaming.pipeline import (
    streaming_sliding_watermarked,
    streaming_tumbling_counts,
)


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream_rows = {
        (r.win_start_s, r.event_type): r.n
        for r in streaming_tumbling_counts(spark, sf_dir).collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            (F.unix_micros("w.start") / 1_000_000).cast("long").alias("win_start_s"),
            "event_type",
            "n",
        )
        .collect()
    )
    batch_rows = {(r.win_start_s, r.event_type): r.n for r in batch}
    assert stream_rows == batch_rows


def test_streaming_watermarked_append_runs(spark, sf_dir):
    # bounded source + append mode: emitted windows are a subset of batch
    # (the un-passed tail stays in state — expected; see module docstring)
    out = streaming_sliding_watermarked(spark, sf_dir).collect()
    assert isinstance(out, list)


def test_stateful_running_counts_match_batch(spark, sf_dir):
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_user_running_counts,
    )

    got = {
        r.user_id: r.n_events
        for r in streaming_user_running_counts(spark, sf_dir).collect()
    }
    want = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    from videos_to_tfrecords_spark.streaming.pipeline import streaming_dedup_events

    got = {
        r.event_type: r.n_users for r in streaming_dedup_events(spark, sf_dir).collect()
    }
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_session_windows_match_batch(spark, sf_dir):
    from videos_to_tfrecords_spark.sources.tables import load_table
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_session_windows,
    )

    got = sorted(
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in streaming_session_windows(spark, sf_dir).collect()
    )
    ev = load_table(spark, sf_dir, "events")
    want = sorted(
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in ev.groupBy(
            F.session_window("ts", "1 hour").alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("start_us"),
            F.unix_micros("w.end").alias("end_us"),
            "n_events",
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_streaming_tfrecord_sink_roundtrip(spark, sf_dir, tmp_path):
    """Stream → foreachBatch → sharded TFRecords: every event lands exactly
    once and the bytes parse back (the reference sink under unbounded
    input)."""
    from videos_to_tfrecords_spark.sources.tfrecord import (
        decode_sequence_example,
        read_records,
    )
    from videos_to_tfrecords_spark.streaming.pipeline import streaming_tfrecord_sink

    out = str(tmp_path / "stream_out")
    n = streaming_tfrecord_sink(spark, sf_dir, out)
    import glob

    files = glob.glob(f"{out}/data/stream-b*/*.tfrecord")
    assert files and n > 0
    ids = []
    for f in files:
        for payload in read_records(f):
            ctx, _ = decode_sequence_example(payload)
            ids.extend(ctx["event_id"])
    from videos_to_tfrecords_spark.sources.tables import load_table

    want = [r.event_id for r in load_table(spark, sf_dir, "events").select("event_id").collect()]
    assert sorted(ids) == sorted(want)
