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


def test_streaming_stateful_sessionize_with_timeout(spark, tmp_path):
    """Full stateful-sessionization lifecycle: in-batch session closes AND
    watermark-driven state timeouts. Two event files land in sequence; a
    far-future sentinel then advances the watermark so the last open
    sessions flush — the bounded-replay drain pattern. Result must equal
    batch sessionize() session aggregates."""
    import time as _time

    from videos_to_tfrecords_spark.operators.relational import sessionize
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_sessionize_stateful,
    )

    GAP_S = 3600
    base = 1_700_000_000_000_000  # epoch µs
    rows = []
    eid = 0
    # user 1: two sessions (events 0,10m | 2h,2h+5m); user 2: one session
    for off_min in (0, 10, 120, 125):
        rows.append((eid, base + off_min * 60_000_000, 1)); eid += 1
    for off_min in (5, 30, 55):
        rows.append((eid, base + off_min * 60_000_000, 2)); eid += 1

    src = str(tmp_path / "sess_src")
    df1 = spark.createDataFrame(
        [(i, t, u) for i, t, u in rows[:4]], "event_id long, ts_us long, user_id long"
    ).select("event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id")
    df1.write.mode("overwrite").parquet(src)

    # start + drain batch 1 happens inside the helper; to exercise multi-
    # batch state we write everything then the sentinel before starting —
    # the file source still delivers files across microbatches.
    df2 = spark.createDataFrame(
        [(i, t, u) for i, t, u in rows[4:]], "event_id long, ts_us long, user_id long"
    ).select("event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id")
    df2.write.mode("append").parquet(src)
    sentinel = spark.createDataFrame(
        [(99_999, base + 10**12, 99_999)], "event_id long, ts_us long, user_id long"
    ).select("event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id")
    sentinel.write.mode("append").parquet(src)

    got = sorted(
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in streaming_sessionize_stateful(spark, src, gap_seconds=GAP_S).collect()
        if r.user_id != 99_999
    )

    ev = spark.createDataFrame(
        [(i, t, u) for i, t, u in rows], "event_id long, ts_us long, user_id long"
    )
    sess = sessionize(ev, "user_id", "ts_us", gap=GAP_S * 1_000_000)
    want = sorted(
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    assert got == want and len(got) == 3


def test_streaming_merge_upsert_last_writer_wins(spark, tmp_path):
    """foreachBatch CDC apply: three source files → three microbatches
    (maxFilesPerTrigger=1); the target must equal the batch last-per-key
    result, with within-batch and cross-batch updates superseding."""
    from pyspark.sql import types as T

    from videos_to_tfrecords_spark.streaming.pipeline import streaming_merge_upsert

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    src = str(tmp_path / "cdc_src")
    tgt = str(tmp_path / "cdc_tgt")
    batches = [
        [(1, 1, "a1"), (2, 1, "b1"), (1, 2, "a2")],  # within-batch: k=1 → a2
        [(2, 3, "b2"), (3, 4, "c1")],
        [(1, 5, "a3")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    n = streaming_merge_upsert(spark, src, tgt, schema, ["k"], ["seq"])
    assert n >= 1
    got = {r.k: (r.seq, r.v) for r in spark.read.schema(schema).parquet(tgt).collect()}
    # batch ground truth: latest seq per key over all rows
    allr = [r for b in batches for r in b]
    want = {}
    for k, seq, v in sorted(allr, key=lambda t: t[1]):
        want[k] = (seq, v)
    assert got == want


def test_streaming_sessionize_on_rocksdb_state_store(spark, tmp_path):
    """Same stateful-sessionization lifecycle on the RocksDB state store
    (VERDICT r2 item 7): at 100× event volume the default HDFS-backed
    store keeps every open session in executor HEAP and OOMs; RocksDB
    spills state to executor disk. The provider is a session conf read at
    query start; results must be identical, and the checkpoint must show
    RocksDB artifacts (proof the conf took effect, not a silent
    fallback)."""
    import glob as _glob
    import os as _os

    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_sessionize_stateful,
    )

    GAP_S = 3600
    base = 1_700_000_000_000_000
    rows = []
    eid = 0
    for off_min in (0, 10, 120, 125):
        rows.append((eid, base + off_min * 60_000_000, 1)); eid += 1
    for off_min in (5, 30, 55):
        rows.append((eid, base + off_min * 60_000_000, 2)); eid += 1

    src = str(tmp_path / "rocks_src")
    spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long"
    ).select("event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id").write.mode(
        "overwrite"
    ).parquet(src)
    sentinel = spark.createDataFrame(
        [(99_999, base + 10**12, 99_999)], "event_id long, ts_us long, user_id long"
    ).select("event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id")
    sentinel.write.mode("append").parquet(src)

    chk = str(tmp_path / "rocks_chk")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = sorted(
            (r.user_id, r.start_us, r.end_us, r.n_events)
            for r in streaming_sessionize_stateful(
                spark, src, gap_seconds=GAP_S, checkpoint_dir=chk
            ).collect()
            if r.user_id != 99_999
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    # sessions: user 1 → (0,10m) and (2h,2h+5m); user 2 → (5m..55m)
    m = 60_000_000
    assert got == [
        (1, base, base + 10 * m, 2),
        (1, base + 120 * m, base + 125 * m, 2),
        (2, base + 5 * m, base + 55 * m, 3),
    ]
    # RocksDB leaves its own on-disk layout under state/0/<partition>/
    # (zip snapshots / changelog files — never the HDFS store's .delta)
    state_files = _glob.glob(_os.path.join(chk, "state", "**", "*"), recursive=True)
    assert state_files, "no state checkpoint written"
    assert not any(f.endswith(".delta") for f in state_files)
    assert any(f.endswith((".zip", ".changelog")) for f in state_files)


def test_transform_with_state_sessionize_matches_old_api(spark, tmp_path):
    """The new-gen stateful API (transformWithStateInPandas: ValueState +
    event-time timers, RocksDB-backed by requirement) must emit exactly
    the sessions the applyInPandasWithState path emits on the same input,
    including the timer-driven tail flush.

    Skipped when the protobuf package is absent: transformWithState's
    Python driver worker speaks protobuf to the JVM state server
    (pyspark/sql/streaming/proto/StateMessage_pb2), an import this
    container cannot satisfy — environment-imposed, like the cv2/TF
    skips."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_sessionize_stateful,
        streaming_sessionize_tws,
    )

    GAP_S = 3600
    base = 1_700_000_000_000_000
    rows = []
    eid = 0
    for off_min in (0, 10, 120, 125):
        rows.append((eid, base + off_min * 60_000_000, 1)); eid += 1
    for off_min in (5, 30, 55):
        rows.append((eid, base + off_min * 60_000_000, 2)); eid += 1

    src = str(tmp_path / "tws_src")
    spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long"
    ).select("event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id").write.mode(
        "overwrite"
    ).parquet(src)
    sentinel = spark.createDataFrame(
        [(99_999, base + 10**12, 99_999)], "event_id long, ts_us long, user_id long"
    ).select("event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id")
    sentinel.write.mode("append").parquet(src)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        tws = sorted(
            (r.user_id, r.start_us, r.end_us, r.n_events)
            for r in streaming_sessionize_tws(
                spark, src, gap_seconds=GAP_S, checkpoint_dir=str(tmp_path / "tws_chk")
            ).collect()
            if r.user_id != 99_999
        )
        old = sorted(
            (r.user_id, r.start_us, r.end_us, r.n_events)
            for r in streaming_sessionize_stateful(
                spark, src, gap_seconds=GAP_S
            ).collect()
            if r.user_id != 99_999
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert tws == old and len(tws) == 3


def test_streaming_cms_merges_across_microbatches(spark, sf_dir, tmp_path):
    """The streaming CMS must equal the batch sketch even when the source
    arrives as several microbatches (streaming-agg partial merge IS the
    sketch's mergeability)."""
    from videos_to_tfrecords_spark.operators.sketches import cms_counts
    from videos_to_tfrecords_spark.sources.tables import load_table
    from videos_to_tfrecords_spark.streaming.pipeline import streaming_cms_counts

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "evsrc")
    ev.repartition(4).write.parquet(src)  # several files → several triggers
    got = {
        (r.d, r.bucket): r.c
        for r in streaming_cms_counts(
            spark, src, glob="*.parquet", max_files_per_trigger=1
        ).collect()
    }
    expect = {
        (r.d, r.bucket): r.c
        for r in cms_counts(
            ev.select(F.col("user_id").cast("string").alias("item")), "item"
        ).collect()
    }
    assert got == expect


def test_streaming_drift_double_pass_stable(spark, sf_dir):
    """Two executions in ONE session must agree row-for-row (memory-sink
    query names are uuid-fresh per run; no temp-view/state leakage), and
    the streamed histogram must equal the batch drift monitor exactly."""
    import videos_to_tfrecords_spark.plans.feature_queries  # noqa: F401
    import videos_to_tfrecords_spark.plans.pipeline_queries  # noqa: F401
    from videos_to_tfrecords_spark.plans.registry import QUERIES

    s1 = sorted(tuple(r) for r in QUERIES["streaming_value_drift"](spark, sf_dir).collect())
    s2 = sorted(tuple(r) for r in QUERIES["streaming_value_drift"](spark, sf_dir).collect())
    b = sorted(tuple(r) for r in QUERIES["value_drift_chisq"](spark, sf_dir).collect())
    assert s1 == s2 == b


def test_streaming_checkpoint_restart_exactly_once(spark, tmp_path):
    """Stop/restart recovery: drain a file stream, stop the query, add more
    source files, restart from the SAME checkpoint — the sink holds every
    input row exactly once (offsets resumed, first batch not reprocessed).
    This is the exactly-once contract a 100 TB ingestion pipeline leans on
    when executors die mid-run."""
    import os

    src, out, chk = (str(tmp_path / d) for d in ("src", "out", "chk"))
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame([(i,) for i in range(10)], "v long").coalesce(
        1
    ).write.mode("append").parquet(src)

    def drain_once():
        q = (
            spark.readStream.schema("v long")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain_once()
    first = sorted(r.v for r in spark.read.parquet(out).collect())
    assert first == list(range(10))

    spark.createDataFrame([(i,) for i in range(10, 15)], "v long").coalesce(
        1
    ).write.mode("append").parquet(src)
    drain_once()  # fresh query object, same checkpoint — resumes offsets
    got = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got == list(range(15))  # no duplicates of the first 10


def test_streaming_heavy_hitters_matches_batch_across_microbatches(
    spark, sf_dir, tmp_path
):
    """Streamed per-bucket counts must merge across microbatches into
    exactly the batch two-pass (Misra-Gries) heavy-hitter answer."""
    from videos_to_tfrecords_spark.plans.mining_queries import q_heavy_hitters_mg
    from videos_to_tfrecords_spark.sources.tables import load_table
    from videos_to_tfrecords_spark.streaming.pipeline import streaming_heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "evsrc")
    ev.repartition(4).write.parquet(src)
    got = {
        (r.bucket, r.freq, r.share_ppm)
        for r in streaming_heavy_hitters(
            spark, src, glob="*.parquet", max_files_per_trigger=1
        ).collect()
    }
    expect = {
        (r.bucket, r.freq, r.share_ppm)
        for r in q_heavy_hitters_mg(spark, sf_dir).collect()
    }
    assert got == expect


def test_streaming_hll_merges_across_microbatches(spark, sf_dir, tmp_path):
    """The streaming HLL registers must equal the single-batch build when
    the source arrives as several microbatches — max() per register IS
    the sketch's merge, so partial-agg order must not matter."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_hll_registers,
    )
    from videos_to_tfrecords_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "evhll")
    ev.repartition(4).write.parquet(src)
    multi = {
        (r.idx, r.m)
        for r in streaming_hll_registers(
            spark, src, glob="*.parquet", max_files_per_trigger=1
        ).collect()
    }
    single = {
        (r.idx, r.m)
        for r in streaming_hll_registers(spark, sf_dir).collect()
    }
    assert multi == single and 0 < len(single) <= 64


def test_foreachbatch_upsert_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """The foreachBatch MERGE-upsert must be batch-count-invariant: driven
    one file per trigger (4 microbatches) it produces exactly the batch
    groupBy census — increments merge, never double-count."""
    from videos_to_tfrecords_spark.sources.tables import load_table
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_upsert_foreachbatch,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev4")
    ev.repartition(4).write.parquet(src)
    got = {
        (r.user_id, r.event_type, r.n, r.value_cents)
        for r in streaming_upsert_foreachbatch(
            spark,
            src,
            glob="*.parquet",
            max_files_per_trigger=1,
            target_path=str(tmp_path / "target"),
        ).collect()
    }
    want = {
        (r.user_id, r.event_type, r.n, r.value_cents)
        for r in ev.groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_late_data_census_drops_stragglers(spark, sf_dir):
    """The late-data census must (a) process >1 microbatch, (b) actually
    drop the straggler rows via the watermark (not merely filter them),
    and (c) exclude exactly the stragglers from the emitted counts — the
    registry oracle checks (c); this pins (a)+(b) on the live query
    progress so a future single-trigger regression can't fake the
    census."""
    from videos_to_tfrecords_spark.sources.tables import load_table
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_late_data_census,
    )

    out = {
        (r.day, r.n, r.value_cents)
        for r in streaming_late_data_census(spark, sf_dir).collect()
    }
    # recompute the expected census (same integer rules as the oracle)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
    )
    dmin, dmax, maxus = ev.agg(F.min("d"), F.max("d"), F.max("us")).collect()[0]
    strag = (F.col("event_id") % 17 == 0) & (F.col("d") <= dmin + (dmax - dmin) // 2 - 2)
    n_strag = ev.filter(strag).count()
    assert n_strag > 0  # the drop set is non-vacuous at every test SF
    want = {
        (r.d, r.n, r.value_cents)
        for r in ev.filter(~strag)
        .filter((F.col("d") + 1) * 86400000000 <= maxus)
        .groupBy("d")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("value_cents"),
        )
        .collect()
    }
    assert out == want and len(want) > 0


def test_dedup_within_watermark_pinned_semantics(spark, tmp_path):
    """Pins the probed dropDuplicatesWithinWatermark rules the registry
    oracle replays: (1) first-seen emits; (2) a duplicate arriving in the
    SAME batch whose watermark passed the entry's expiry is still dropped
    (eviction is lazy, end-of-batch) and does NOT refresh state; (3) the
    key re-emits when it next arrives AFTER the evicting batch. If a
    Spark upgrade changes any of these, this fails before the driver
    gate does."""
    import glob
    import os

    from pyspark.sql import types as T

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        [("A", 1000, 1)],  # b0: A emits, expiry 1005
        [("B", 1100, 2)],  # b1: wm=995 < 1005 -> A kept
        [("A", 1101, 3), ("C", 1102, 4)],  # b2: wm=1095 > 1005, but lazy
        #   eviction -> A@1101 dropped, no refresh; A evicted at b2 end
        [("A", 1200, 5)],  # b3: A re-emits
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "k string, t long, v long"
        ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
        tmp = str(tmp_path / f"tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + i * 1000,) * 2)

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
        ]
    )
    out = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "5 seconds")
        .dropDuplicatesWithinWatermark(["k"])
    )
    name = "ddww_pin_test"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.k, r.v) for r in spark.table(name).collect()}
    assert got == {("A", 1), ("B", 2), ("C", 4), ("A", 5)}


def test_dedup_within_watermark_census_paths_nonvacuous(spark, sf_dir):
    """The registry census must exercise every rule: some b=2 keys
    re-emitted after expiry, some dropped against live state, some b=1
    duplicates dropped — verified on the arrival table the harness
    builds, so the oracle's CASE arms never go untested."""
    from videos_to_tfrecords_spark.sources.tables import load_table
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_dedup_within_watermark,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
    )
    dmin, dmax = ev.agg(F.min("d"), F.max("d")).collect()[0]
    t1 = dmin + (dmax - dmin) // 3
    t2 = dmin + 2 * (dmax - dmin) // 3
    lab = ev.withColumn(
        "b",
        F.when(F.col("d") <= t1, F.lit(0))
        .when(F.col("d") <= t2, F.lit(1))
        .otherwise(F.lit(2)),
    )
    arr = (
        lab.groupBy("user_id", "event_type", "b")
        .agg(F.min("d").alias("dfirst"))
        .cache()
    )
    maxd0 = arr.filter("b = 0").agg(F.max("dfirst")).collect()[0][0]
    b0 = arr.filter("b = 0").select(
        "user_id", "event_type", F.col("dfirst").alias("d0")
    )
    b2 = arr.filter("b = 2").join(b0, ["user_id", "event_type"])
    n_reemit = b2.filter(F.lit(maxd0) - F.col("d0") >= 6).count()
    n_live_drop = b2.filter(F.lit(maxd0) - F.col("d0") < 6).count()
    n_b1_drop = (
        arr.filter("b = 1")
        .join(b0, ["user_id", "event_type"], "left_semi")
        .count()
    )
    n_fresh = (
        arr.filter("b = 2")
        .join(
            arr.filter("b < 2").select("user_id", "event_type"),
            ["user_id", "event_type"],
            "left_anti",
        )
        .count()
    )
    arr.unpersist()
    assert n_reemit > 0 and n_live_drop > 0 and n_b1_drop > 0
    # and the census itself agrees with the replay on totals
    cen = streaming_dedup_within_watermark(spark, sf_dir)
    b2_emitted = (
        cen.filter("b = 2").agg(F.sum("n_emitted")).collect()[0][0] or 0
    )
    assert b2_emitted == n_reemit + n_fresh


def test_trigger_available_now_drains_and_terminates(spark, sf_dir, tmp_path):
    """Trigger.AvailableNow (SPARK-36533) — the production batch-drain
    trigger (bounded backfill with rate limits, then self-termination,
    unlike processingTime which runs forever and processAllAvailable
    which is test-only): a maxFilesPerTrigger-limited file stream under
    availableNow must process EVERYTHING present at start across
    multiple batches, then stop on its own; counts must equal batch."""
    import glob
    import os

    from videos_to_tfrecords_spark.sources.tables import load_table
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(3):
        tmp = str(tmp_path / f"t{i}")
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.rename(part, os.path.join(src, f"b{i}.parquet"))

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("avail_now_test")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query did not self-stop"
    progress = q.recentProgress
    assert len([p for p in progress if p["numInputRows"] > 0]) >= 3
    got = {r.event_type: r.n for r in spark.table("avail_now_test").collect()}
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_foreach_row_writer_sink_exactly_once(spark, tmp_path):
    """Row-level ``foreach`` sink (the per-row sibling of foreachBatch):
    a ForeachWriter with open/process/close lifecycle appends every row
    to a per-partition file; drained, the union of files holds exactly
    the source multiset — covers the custom-sink API the engine's
    foreachBatch MERGE path doesn't touch."""
    import glob
    import os

    out_dir = str(tmp_path / "rows")
    os.makedirs(out_dir)
    src = str(tmp_path / "src")
    spark.range(500).selectExpr("id AS v").write.parquet(src)

    class FileWriter:
        def open(self, partition_id, epoch_id):
            self._f = open(
                os.path.join(out_dir, f"p{partition_id}_e{epoch_id}.txt"),
                "a",
            )
            return True

        def process(self, row):
            self._f.write(f"{row.v}\n")

        def close(self, error):
            self._f.close()

    from pyspark.sql import types as T

    stream = spark.readStream.schema(
        T.StructType([T.StructField("v", T.LongType())])
    ).parquet(src)
    q = stream.writeStream.foreach(FileWriter()).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = []
    for f in glob.glob(os.path.join(out_dir, "*.txt")):
        with open(f) as fh:
            got.extend(int(x) for x in fh.read().split())
    assert sorted(got) == list(range(500))


def test_streaming_query_listener_reports_progress(spark, tmp_path):
    """StreamingQueryListener — the observability surface a production
    pipeline wires to metrics: start/progress/termination callbacks must
    fire with row counts that sum to the drained input."""
    import time

    from pyspark.sql.streaming import StreamingQueryListener

    events = {"started": 0, "progress_rows": 0, "terminated": 0}

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):
            events["started"] += 1

        def onQueryProgress(self, e):
            events["progress_rows"] += e.progress.numInputRows

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events["terminated"] += 1

    listener = L()
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "src")
        spark.range(1234).write.parquet(src)
        from pyspark.sql import types as T

        q = (
            spark.readStream.schema(
                T.StructType([T.StructField("id", T.LongType())])
            )
            .parquet(src)
            .writeStream.format("noop")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline and (
            events["progress_rows"] < 1234 or events["terminated"] < 1
        ):
            time.sleep(0.5)
        assert events["started"] >= 1
        assert events["progress_rows"] >= 1234
        assert events["terminated"] >= 1
    finally:
        spark.streams.removeListener(listener)


def test_streaming_observe_metrics_in_progress(spark, tmp_path):
    """df.observe on a STREAM (the streaming half of the registry's
    observed_quality_metrics): per-microbatch observed metrics must ride
    the progress events — row count and cents sum across batches must
    total the drained input, with no second pass over the data."""
    import time

    from pyspark.sql import types as T
    from pyspark.sql.streaming import StreamingQueryListener

    seen = {"rows": 0, "cents": 0}

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):
            pass

        def onQueryProgress(self, e):
            m = e.progress.observedMetrics.get("census")
            if m:
                seen["rows"] += m.n
                seen["cents"] += m.cents

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            pass

    src = str(tmp_path / "src")
    spark.range(1000).selectExpr(
        "id", "(id % 97) * 100 AS cents"
    ).write.parquet(src)
    listener = L()
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.schema(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("cents", T.LongType()),
                    ]
                )
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .observe(
                "census",
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("cents"),
            )
        )
        q = stream.writeStream.format("noop").start()
        q.processAllAvailable()
        q.stop()
        want_cents = sum((i % 97) * 100 for i in range(1000))
        deadline = time.time() + 30
        while time.time() < deadline and seen["rows"] < 1000:
            time.sleep(0.5)
        assert seen["rows"] == 1000 and seen["cents"] == want_cents
    finally:
        spark.streams.removeListener(listener)


def test_statestore_reader_matches_batch_agg(spark, sf_dir):
    # the raw operator state after a full AvailableNow drain must equal
    # the batch aggregate computed directly from the same input — and the
    # state-metadata source must describe the aggregation operator
    import os

    from videos_to_tfrecords_spark.sources.tables import load_table
    from videos_to_tfrecords_spark.streaming.pipeline import (
        _statestore_base,
        statestore_reader_audit,
    )

    got = {
        (r.event_type, r.bucket): (r.n, r.cents)
        for r in statestore_reader_audit(spark, sf_dir).collect()
    }
    want = {
        (r.event_type, r.bucket): (r.n, r.cents)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type", (F.col("user_id") % 32).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
    ckpt = os.path.join(_statestore_base(sf_dir), "ck")
    md = spark.read.format("state-metadata").load(ckpt).collect()
    assert len(md) == 1
    assert md[0].operatorName == "stateStoreSave"
    assert md[0].numPartitions == 8
