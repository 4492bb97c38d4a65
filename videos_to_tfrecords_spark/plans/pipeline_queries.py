"""End-to-end pipeline + multimodal + inference + streaming queries.

These exercise the Python-boundary operators (mapInPandas decode, pandas-UDF
inference, proto serialization, Structured Streaming). Where the fake decode
is closed-form, the query is STILL hash-checked against SQL arithmetic —
proving the opaque-operator plumbing, not just the formula. Inference and
proto bytes are rows-only (no SQL analog) with pytest golden checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.ml.inference import batch_inference, linear_stub_model
from videos_to_tfrecords_spark.ml.video import decode_and_infer, decode_videos
from videos_to_tfrecords_spark.operators.multimodal import (
    decode_media_frames,
    with_media_payload,
)
from videos_to_tfrecords_spark.operators.sequence import format_features, to_full_video
from videos_to_tfrecords_spark.operators.split import hash_bucket_split
from videos_to_tfrecords_spark.plans.reference_queries import (
    _FILES_SQL,
    _files_df,
)
from videos_to_tfrecords_spark.plans.registry import query
from videos_to_tfrecords_spark.schema import (
    CONTEXT_COLUMNS,
    LIST_COLUMNS,
    FeatureKind,
)
from videos_to_tfrecords_spark.sources.tables import load_table
from videos_to_tfrecords_spark.sources.tfrecord import with_sequence_example
from videos_to_tfrecords_spark.streaming.pipeline import streaming_tumbling_counts


@query(
    "multimodal_meta",
    """
SELECT doc_id,
       CAST(octet_length(unhex(sha256(text))) AS BIGINT) AS n_bytes,
       sha256(sha256(text)) AS sha_hex
FROM documents
""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column convention (M5): opaque binary payload + typed meta
    struct; metadata projection + content hash stay relational."""
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_payload(docs)
    # hash of the payload's lowercase-hex form: DuckDB's sha256 takes
    # VARCHAR only, and Spark's hex() uppercases → lower() it. No join:
    # everything derives from the payload column in one narrow pass.
    return media.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.sha2(F.lower(F.hex("payload")), 256).alias("sha_hex"),
    )


@query(
    "media_decode_frames",
    """
SELECT doc_id,
       CAST(t.i AS BIGINT) AS frame_idx,
       CAST(t.i AS DOUBLE) * 500.0 AS timestamp_ms,
       CAST((doc_id * 31 + t.i) % 1000 AS BIGINT) AS checksum
FROM documents, LATERAL (SELECT unnest(generate_series(0, CAST(doc_id % 4 AS BIGINT))) AS i) t
""",
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode as a flat-map UDTF over mapInPandas (M5): 1 asset → N
    frame rows. The decode body is a deterministic fake (no codecs in this
    container) with a closed-form output, so the Arrow-batched Python
    plumbing itself is hash-checked against SQL arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media_frames(docs)


_INFER_ORACLE = """
WITH x AS (SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                                 v -> CAST(round(v * 1000) AS BIGINT)) AS xq
           FROM embeddings),
dims AS (SELECT unnest(range(0, (SELECT len(embedding) FROM embeddings LIMIT 1)))
           AS i),
outs AS (SELECT unnest(range(0, 8)) AS j),
w AS (SELECT i, j,
             CAST(concat('0x', substr(md5('w:' || i || ':' || j), 1, 15)) AS BIGINT)
               % 201 - 100 AS w
      FROM dims, outs),
l AS (SELECT vec_id, j, greatest(CAST(sum(xq[i + 1] * w) AS BIGINT), 0) AS logit
      FROM x, w GROUP BY 1, 2),
r AS (SELECT vec_id, j, logit,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY logit DESC, j) AS rnk
      FROM l)
SELECT vec_id, CAST(8 AS BIGINT) AS n_logits,
       CAST(j AS BIGINT) AS argmax_idx, CAST(logit AS BIGINT) AS max_logit
FROM r WHERE rnk = 1
"""


@query("inference_logits", _INFER_ORACLE)
def q_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched model inference (U2, reference preprocess.py:192-265) as an
    iterator pandas UDF with per-worker model init. The stub's weights are
    portable-hash integers and inputs are quantized (ml/inference
    .int_hash_linear_model), so every logit is an exact small integer and
    the whole inference pass — Arrow batching, per-worker factory, the
    same UDF plumbing a real model uses — is hash-checked against a SQL
    matmul oracle (upgraded from rows-only in round 3). The float-weight
    stub keeps its numeric-golden pytest coverage in tests/test_ml.py."""
    from videos_to_tfrecords_spark.ml.inference import int_hash_linear_model

    emb = load_table(spark, sf_dir, "embeddings")
    out = batch_inference(emb, "embedding", int_hash_linear_model(8), drop_input=True)
    return out.select(
        "vec_id",
        F.size("logits").cast("long").alias("n_logits"),
        (F.array_position("logits", F.array_max("logits")) - 1)
        .cast("long")
        .alias("argmax_idx"),
        F.array_max("logits").cast("long").alias("max_logit"),
    )


_VIDEO_INFER_CENSUS_ORACLE = f"""
WITH files AS ({_FILES_SQL}),
vf AS (SELECT filename,
              CAST(concat('0x', substr(md5(filename), 1, 8)) AS BIGINT) AS h
       FROM files WHERE filename NOT LIKE '%.txt'),
-- the fake decoder's float frame loop collapses to a CONSTANT kept set
-- per fps: positions advance by 1000/fps ms, skip=500 ms, local cap 3 ⇒
-- kept frame indices are exactly (0, fps/2, fps) for fps ∈ {{24,30,60}}
-- at every duration the props hash can produce (verified against the
-- Python loop, including the 499.99999999999994-vs-500.0 double hazard)
fr AS (SELECT filename, h,
              CASE h % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS fps
       FROM vf),
px AS (SELECT filename, fps, k,
              CAST(round(1000 * ((xor(h, CAST(k AS BIGINT)) % 256) / 255.0))
                AS BIGINT) AS xq
       FROM (SELECT filename, h, fps, unnest([0, fps // 2, fps]) AS k
             FROM fr)),
dims AS (SELECT unnest(range(0, 12)) AS i),
outs AS (SELECT unnest(range(0, 8)) AS j),
w AS (SELECT i, j,
             CAST(concat('0x', substr(md5('w:' || i || ':' || j), 1, 15))
               AS BIGINT) % 201 - 100 AS w
      FROM dims, outs),
s AS (SELECT j, CAST(sum(w) AS BIGINT) AS sj FROM w GROUP BY j),
l AS (SELECT filename, fps, k, j, greatest(xq * sj, 0) AS logit FROM px, s),
r AS (SELECT filename, fps, j, logit,
             row_number() OVER (PARTITION BY filename, k
                                ORDER BY logit DESC, j) AS rnk
      FROM l)
SELECT CAST(fps AS BIGINT) AS fps, CAST(j AS BIGINT) AS argmax_idx,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(logit) AS BIGINT) AS sum_max_logit,
       CAST(count(DISTINCT filename) AS BIGINT) AS n_files
FROM r WHERE rnk = 1
GROUP BY 1, 2
"""


@query("video_inference_census", _VIDEO_INFER_CENSUS_ORACLE)
def q_video_inference_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference mainline — filename table → extension filter → video
    decode (U1, mapInPandas flat-map) → batched model inference (U2,
    iterator pandas UDF with per-worker model init) → census — as ONE
    hash-checked query (VERDICT r6 #8): the deterministic fake decoder's
    frames feed the exact-integer ``int_hash_linear_model``, so every
    stage of the decode→infer→assemble chain the reference runs
    (preprocess.py:156-265) is verified end to end against a closed-form
    SQL twin, not just rows-counted. The frame values are constant per
    frame (12 × v), so each logit collapses to relu(xq·Σᵢw[i][j]) — the
    oracle rebuilds the weight column sums from the same portable md5.
    Scale: decode fan-out is the spread-repartitioned mapInPandas stage;
    inference is Arrow-batched; the final census is one partial-agg
    shuffle of (fps, argmax) rows."""
    from videos_to_tfrecords_spark.ml.inference import (
        batch_inference,
        int_hash_linear_model,
    )

    files = _files_df(spark, sf_dir).filter(~F.col("filename").endswith(".txt"))
    frames = decode_videos(files.select("filename"))
    logits = batch_inference(
        frames, "image", int_hash_linear_model(8), drop_input=True
    )
    per_frame = logits.select(
        "filename",
        F.col("frame_per_sec").cast("long").alias("fps"),
        (F.array_position("logits", F.array_max("logits")) - 1)
        .cast("long")
        .alias("argmax_idx"),
        F.array_max("logits").cast("long").alias("max_logit"),
    )
    return per_frame.groupBy("fps", "argmax_idx").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.sum("max_logit").cast("long").alias("sum_max_logit"),
        F.countDistinct("filename").cast("long").alias("n_files"),
    )


_VIDEO_SEQ_CENSUS_ORACLE = f"""
WITH files AS ({_FILES_SQL}),
vf AS (SELECT doc_id, filename,
              string_split(filename, '/')[-3] AS label,
              CAST(concat('0x', substr(md5(filename), 1, 8)) AS BIGINT) AS h
       FROM files
       WHERE string_split(filename, '.')[-1] IN ('mkv', 'avi', 'mp4')),
sp AS (SELECT *, CASE WHEN (doc_id * 9973 + 7) % 100 < 15 THEN 'Test'
                      WHEN (doc_id * 9973 + 7) % 100 < 30 THEN 'Val'
                      ELSE 'Train' END AS dataset
       FROM vf),
fr AS (SELECT filename, label, dataset,
              CASE h % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS fps, h
       FROM sp),
px AS (SELECT filename, label, dataset, k,
              CAST(round(1000 * ((xor(h, CAST(k AS BIGINT)) % 256) / 255.0))
                AS BIGINT) AS xq
       FROM (SELECT filename, label, dataset, h,
                    unnest([0, fps // 2, fps]) AS k
             FROM fr)),
dims AS (SELECT unnest(range(0, 12)) AS i),
outs AS (SELECT unnest(range(0, 8)) AS j),
w AS (SELECT i, j,
             CAST(concat('0x', substr(md5('w:' || i || ':' || j), 1, 15))
               AS BIGINT) % 201 - 100 AS w
      FROM dims, outs),
s AS (SELECT j, CAST(sum(w) AS BIGINT) AS sj FROM w GROUP BY j),
fm AS (SELECT filename, label, dataset, k,
              CAST(max(greatest(xq * sj, 0)) AS BIGINT) AS mx
       FROM px, s GROUP BY 1, 2, 3, 4)
SELECT dataset, label,
       CAST(count(DISTINCT filename) AS BIGINT) AS n_sequences,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(mx) AS BIGINT) AS logit_sum,
       TRUE AS protos_framed
FROM fm GROUP BY 1, 2
"""


@query("video_sequence_census", _VIDEO_SEQ_CENSUS_ORACLE)
def q_video_sequence_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE reference mainline, hash-checked (r7, extends
    video_inference_census to the sequence-assembly and encoder stages):
    filename table (S2) → extension filter (P2) → label extraction (P3)
    → deterministic hash split (U6) → fake video decode (U1, mapInPandas)
    → exact-integer batched inference (U2) → time-sorted full_video
    sequence assembly (G1/G4/G5) → FormatFeatures pivot (U7) →
    SequenceExample framing (U3/U4) → per-(split, label) census. Every
    stage the reference's preprocess.py runs is on the executed plan; the
    output pins sequence counts, frame counts, and the exact integer
    per-frame max-logit mass, and the proto encoder's execution via the
    framing flag (the bytes themselves stay golden-pytest-pinned).

    Scale: the same shapes as video_pipeline_e2e — spread-repartitioned
    decode fan-out, Arrow-batched inference, one sequence-assembly
    shuffle on filename, census partial-aggregates; the encoder runs
    after the last exchange."""
    from videos_to_tfrecords_spark.ml.inference import (
        batch_inference,
        int_hash_linear_model,
    )
    from videos_to_tfrecords_spark.operators.filenames import (
        extract_label,
        filter_extensions,
    )

    labeled = extract_label(filter_extensions(_files_df(spark, sf_dir)))
    split = hash_bucket_split(labeled, "doc_id")
    frames = decode_videos(split.select("filename", "label", "dataset"))
    logits = batch_inference(
        frames, "image", int_hash_linear_model(8), drop_input=True
    )
    full = to_full_video(
        logits.select(
            "filename", "label", "dataset", "timestamp_ms", "frame_per_sec",
            "frame_total", "logits",
        ),
        ts_ms_col="timestamp_ms",
        key_cols=["filename"],
    )
    seqs = format_features(
        full,
        context_cols=["label", "dataset", "frame_per_sec", "frame_total"],
        list_cols=["logits", "timestamp_ms"],
    )
    protos = with_sequence_example(
        seqs,
        context_cols=[
            "filename", "label", "dataset", "frame_per_sec", "frame_total",
        ],
        list_cols=["logits", "timestamp_ms"],
        context_kinds=CONTEXT_COLUMNS,
        list_kinds=LIST_COLUMNS,
    )
    per_seq = protos.select(
        "dataset",
        "label",
        F.size("timestamp_ms").cast("long").alias("nf"),
        F.expr(
            "aggregate(logits, 0L, (a, fl) -> a + CAST(array_max(fl) AS LONG))"
        ).alias("seq_logit_sum"),
        (F.length("proto") >= F.lit(12)).alias("framed"),
    )
    return per_seq.groupBy("dataset", "label").agg(
        F.count("*").cast("long").alias("n_sequences"),
        F.sum("nf").cast("long").alias("n_frames"),
        F.sum("seq_logit_sum").cast("long").alias("logit_sum"),
        (F.count(F.when(F.col("framed"), 1)) == F.count("*")).alias(
            "protos_framed"
        ),
    )


def _crop_membership_rows() -> list[tuple[int, int, int, int]]:
    """(fps, duration_ms, win_start_ms, frame_idx) membership table of the
    crop-mode mainline, precomputed by replicating the engine's EXACT float
    semantics (the Python-precomputed-constant-table discipline):

    - the fake decoder's cloud-mode frame loop (ml/video._decode_fake:
      pos advances by the double 1000.0/fps, keep at ≥ last+500);
    - assign_windows' µs rounding (round(ts·1000), half-up) and the two
      epoch-aligned 2000/1000 sliding windows per frame;
    - crop_video's P9 reference keep rule, INCLUDING the float
      video-length round-trip 1000·(dur/1000·fps)/fps that can land an
      ulp under the true duration and drop the last interior window.

    Only (fps, duration) — both filename-hash-derived with 3×8 possible
    values — determine membership, so the table is a bounded constant
    (~500 rows) inlined into the SQL oracle as VALUES."""
    import math

    rows = []
    for fps in (24.0, 30.0, 60.0):
        for dur_i in range(2000, 10000, 1000):
            dur = float(dur_i)
            kept, last_ts = [], None
            pos, idx = 0.0, 0
            while pos < dur:
                if last_ts is None or pos >= last_ts + 500.0:
                    last_ts = pos
                    kept.append((idx, pos))
                idx += 1
                pos = idx * (1000.0 / fps)
            frame_total = dur / 1000.0 * fps
            length = 1000.0 * frame_total / fps
            for k, ts in kept:
                ts_us = int(math.floor(ts * 1000 + 0.5))
                base = ts_us - ts_us % 1_000_000
                for w_us in (base - 1_000_000, base):
                    if not (w_us <= ts_us < w_us + 2_000_000):
                        continue
                    w_ms = w_us // 1000
                    end_ms = w_ms + 2000
                    if end_ms == 2000 or (w_ms >= 0 and float(end_ms) <= length):
                        rows.append((int(fps), dur_i, w_ms, k))
    return rows


def _video_crop_census_oracle() -> str:
    mem = ", ".join(
        f"({fps}, {dur}, {w}, {k})" for fps, dur, w, k in _crop_membership_rows()
    )
    return f"""
WITH files AS ({_FILES_SQL}),
vf AS (SELECT doc_id, filename,
              string_split(filename, '/')[-3] AS label,
              CAST(concat('0x', substr(md5(filename), 1, 8)) AS BIGINT) AS h
       FROM files
       WHERE string_split(filename, '.')[-1] IN ('mkv', 'avi', 'mp4')),
sp AS (SELECT *, CASE WHEN (doc_id * 9973 + 7) % 100 < 15 THEN 'Test'
                      WHEN (doc_id * 9973 + 7) % 100 < 30 THEN 'Val'
                      ELSE 'Train' END AS dataset
       FROM vf),
fr AS (SELECT filename, label, dataset, h,
              CASE h % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS fps,
              2000 + (h % 8) * 1000 AS dur
       FROM sp),
mem(fps, dur, w_ms, k) AS (VALUES {mem}),
px AS (SELECT f.filename, f.label, f.dataset, m.w_ms, m.k,
              CAST(round(1000 * ((xor(f.h, CAST(m.k AS BIGINT)) % 256)
                   / 255.0)) AS BIGINT) AS xq
       FROM fr f JOIN mem m ON m.fps = f.fps AND m.dur = f.dur),
dims AS (SELECT unnest(range(0, 12)) AS i),
outs AS (SELECT unnest(range(0, 8)) AS j),
w AS (SELECT i, j,
             CAST(concat('0x', substr(md5('w:' || i || ':' || j), 1, 15))
               AS BIGINT) % 201 - 100 AS w
      FROM dims, outs),
s AS (SELECT j, CAST(sum(w) AS BIGINT) AS sj FROM w GROUP BY j),
fm AS (SELECT filename, label, dataset, w_ms, k,
              CAST(max(greatest(xq * sj, 0)) AS BIGINT) AS mx
       FROM px, s GROUP BY 1, 2, 3, 4, 5)
SELECT dataset, label,
       CAST(count(DISTINCT (filename, w_ms)) AS BIGINT) AS n_sequences,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(mx) AS BIGINT) AS logit_sum,
       TRUE AS protos_framed
FROM fm GROUP BY 1, 2
"""


@query("video_crop_census", _video_crop_census_oracle())
def q_video_crop_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's --mode=crop_video mainline, hash-checked (r7, the
    crop twin of video_sequence_census): uncapped cloud decode → exact-
    integer inference → SLIDING-window assembly with the P9 partial-window
    rule (video_length = 1000·frame_total/frame_per_sec, float-faithful)
    → FormatFeatures → SequenceExample framing → per-(split, label)
    census. The oracle joins a Python-precomputed 24-case membership
    table (see _crop_membership_rows — it encodes the decoder's float
    frame loop, the µs window rounding, and the P9 keep rule including
    its ulp-sensitive length round-trip), so the window semantics are
    pinned bit-exactly, not approximately."""
    from videos_to_tfrecords_spark.ml.inference import (
        batch_inference,
        int_hash_linear_model,
    )
    from videos_to_tfrecords_spark.operators.filenames import (
        extract_label,
        filter_extensions,
    )
    from videos_to_tfrecords_spark.operators.sequence import crop_video

    labeled = extract_label(filter_extensions(_files_df(spark, sf_dir)))
    split = hash_bucket_split(labeled, "doc_id")
    frames = decode_videos(
        split.select("filename", "label", "dataset"), cloud=True
    )
    logits = batch_inference(
        frames, "image", int_hash_linear_model(8), drop_input=True
    )
    length_ms = F.lit(1000.0) * F.col("frame_total") / F.col("frame_per_sec")
    crop = crop_video(
        logits.withColumn("length_ms", length_ms).select(
            "filename", "label", "dataset", "timestamp_ms", "length_ms",
            "logits",
        ),
        ts_ms_col="timestamp_ms",
        key_cols=["filename"],
        size_ms=2000,
        slide_ms=1000,
        length_ms_col="length_ms",
        partial_policy="reference",
    )
    seqs = format_features(
        crop,
        context_cols=["label", "dataset"],
        list_cols=["logits", "timestamp_ms"],
    )
    protos = with_sequence_example(
        seqs,
        context_cols=["label", "dataset"],
        list_cols=["logits", "timestamp_ms"],
        context_kinds=CONTEXT_COLUMNS,
        list_kinds=LIST_COLUMNS,
    )
    per_seq = protos.select(
        "dataset",
        "label",
        F.size("timestamp_ms").cast("long").alias("nf"),
        F.expr(
            "aggregate(logits, 0L, (a, fl) -> a + CAST(array_max(fl) AS LONG))"
        ).alias("seq_logit_sum"),
        (F.length("proto") >= F.lit(12)).alias("framed"),
    )
    return per_seq.groupBy("dataset", "label").agg(
        F.count("*").cast("long").alias("n_sequences"),
        F.sum("nf").cast("long").alias("n_frames"),
        F.sum("seq_logit_sum").cast("long").alias("logit_sum"),
        (F.count(F.when(F.col("framed"), 1)) == F.count("*")).alias(
            "protos_framed"
        ),
    )


def run_pipeline_e2e(
    spark: SparkSession, sf_dir: str, by_shape: bool = False
) -> DataFrame:
    """E2E pipeline body shared by the registered query and tests. With
    ``by_shape=True`` the inference stage routes through
    :func:`batch_inference_by_shape` grouped on (height, width, channels)
    — the reference's shape-homogeneous batching (preprocess.py:246-253),
    required when the decoder emits mixed resolutions (np.stack over a
    ragged Arrow batch raises). The fake decoder's frames are all 2×2×3,
    so both paths produce identical results here; the mixed-resolution
    case is exercised by tests/test_ml.py with a ragged fixture."""
    files = _files_df(spark, sf_dir)
    from videos_to_tfrecords_spark.operators.filenames import (
        extract_label,
        filter_extensions,
    )

    labeled = extract_label(filter_extensions(files))
    split = hash_bucket_split(labeled, "doc_id")
    if by_shape:
        from videos_to_tfrecords_spark.ml.inference import (
            adaptive_stub_model,
            batch_inference_by_shape,
        )

        frames = decode_videos(split.select("filename", "label", "dataset"), cloud=True)
        embedded = batch_inference_by_shape(
            frames,
            "image",
            ["height", "width", "channels"],
            adaptive_stub_model(4),
            drop_input=True,
            model_cache_key="e2e_adaptive",
        )
    else:
        # fused decode→inference: frames never cross the Arrow boundary
        # (decode_and_infer docstring; pytest asserts == the unfused chain)
        embedded = decode_and_infer(
            split.select("filename", "label", "dataset"),
            linear_stub_model(12, 4),
            cloud=True,
        )
    full = to_full_video(
        embedded.select(
            "filename", "label", "dataset", "timestamp_ms", "frame_per_sec",
            "frame_total", "logits",
        ),
        ts_ms_col="timestamp_ms",
        key_cols=["filename"],
    )
    seqs = format_features(
        full,
        context_cols=["label", "dataset", "frame_per_sec", "frame_total"],
        list_cols=["logits", "timestamp_ms"],
    )
    # a RAW-binary context column (BinaryType, not str→utf8): exercises the
    # encode_feature bytes-passthrough branch of the BYTES-declared leg
    # (reference features.py:30-36, 48-54) through the registry path —
    # real pipelines carry content digests / thumbnail bytes in context
    seqs = seqs.withColumn("content_md5", F.unhex(F.md5("filename")))
    protos = with_sequence_example(
        seqs,
        context_cols=[
            "filename", "label", "dataset", "frame_per_sec", "frame_total",
            "content_md5",
        ],
        list_cols=["logits", "timestamp_ms"],
        # serialize by DECLARED dtype (reference features.py:25-36), not
        # runtime inference — an int-valued FLOAT column stays FloatList
        context_kinds={**CONTEXT_COLUMNS, "content_md5": FeatureKind.BYTES},
        list_kinds=LIST_COLUMNS,
    )
    return (
        protos.groupBy("dataset")
        .agg(
            F.count("*").alias("n_sequences"),
            F.sum(F.length("proto")).alias("total_proto_bytes"),
        )
        .orderBy("dataset")
    )


@query("video_pipeline_e2e")  # rows-only: spans decode+inference+proto encode
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole mainline (preprocess.py:371-416) re-expressed
    Spark-first: filename table → extension filter → label extraction →
    deterministic split → video decode (fake, mapInPandas UDTF) → batched
    inference (pandas UDF) → full_video sequence assembly → FormatFeatures
    pivot → SequenceExample proto bytes. Output: per-split sequence counts
    and total proto bytes (deterministic; schema-stable).
    SPARK_GRAFT_E2E_BY_SHAPE=1 switches the inference stage to
    shape-homogeneous batching (see run_pipeline_e2e)."""
    import os

    by_shape = os.environ.get("SPARK_GRAFT_E2E_BY_SHAPE") == "1"
    return run_pipeline_e2e(spark, sf_dir, by_shape=by_shape)


def _text_e2e_oracle() -> str:
    """DuckDB twin of text_pipeline_e2e's PRE-ENCODER stages (VERDICT r6
    #4, the experiment_readout_e2e pattern): quality gate → exact dedup →
    packing layout → per-bin canonical digest, closed to one hash-checked
    row. The proto wire bytes still have no SQL analog — the encoder's
    execution is pinned by the ``protos_framed`` boolean (the engine can
    only emit TRUE by actually framing every bin; the oracle emits the
    literal), and the bytes themselves by the golden pytests."""
    from videos_to_tfrecords_spark.plans.text_queries import _STOP_IN

    return f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
q AS (SELECT doc_id, md5(text) AS text_md5, CAST(len(toks) AS BIGINT) AS n
      FROM t
      WHERE len(toks) >= 8
        AND floor(1000.0 * len(list_filter(toks, x -> x IN ({_STOP_IN})))
                  / len(toks)) >= 50),
d AS (SELECT min(doc_id) AS doc_id, min(n) AS n FROM q GROUP BY text_md5),
c AS (SELECT doc_id, n,
             CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS s
      FROM d),
spans AS (SELECT doc_id, n, s,
                 unnest(range(s // 256, (s + n - 1) // 256 + 1)) AS bin_id
          FROM c WHERE n > 0),
sp AS (SELECT doc_id, CAST(bin_id AS BIGINT) AS bin_id,
              CAST(greatest(s - bin_id * 256, 0) AS BIGINT) AS off_in_bin,
              CAST(least((bin_id + 1) * 256, s + n) - greatest(bin_id * 256, s)
                AS BIGINT) AS len_in_bin
       FROM spans),
bins AS (SELECT bin_id,
                string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY off_in_bin)
                  AS ids,
                string_agg(CAST(off_in_bin AS VARCHAR), '|' ORDER BY off_in_bin)
                  AS offs,
                string_agg(CAST(len_in_bin AS VARCHAR), '|' ORDER BY off_in_bin)
                  AS lens,
                CAST(count(*) AS BIGINT) AS n_spans,
                CAST(sum(len_in_bin) AS BIGINT) AS n_fill
         FROM sp GROUP BY bin_id),
dig AS (SELECT n_spans, n_fill,
               CAST(concat('0x', substr(md5(concat_ws(',',
                 CAST(bin_id AS VARCHAR), ids, offs, lens)), 1, 15)) AS BIGINT)
                 AS h
        FROM bins)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(n_spans) AS BIGINT) AS n_spans,
       CAST(sum(n_fill) AS BIGINT) AS n_tokens_packed,
       CAST(sum(CAST(h AS HUGEINT)) % 4611686018427387904 AS BIGINT)
         AS layout_digest_sum,
       TRUE AS protos_framed
FROM dig
"""


@query("text_pipeline_e2e", _text_e2e_oracle())
def q_text_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-pretraining data mainline, end to end over ``documents`` —
    the text twin of ``video_pipeline_e2e``, driving the same declared-
    dtype SequenceExample encoder the reference's sink uses
    (features.py:25-54) from the curation operators instead of the video
    decoder: quality gate (stopword ratio ≥ 0.05, ≥ 8 tokens) → exact
    dedup (md5 keep-lowest-id) → whitespace token counts → GPT-style
    concatenate-and-chunk packing (capacity 256) → one SequenceExample
    per bin (context: bin id / span count / token fill / raw-binary span
    digest; feature lists: per-span doc ids, bin offsets, span lengths)
    → one corpus-digest row.

    Hash-checked as of r7 (VERDICT r6 #4): the output row pins the
    pre-encoder funnel exactly — survivor/bin/span/token censuses plus a
    modular sum of per-bin canonical-layout digests (md5 over the
    off-sorted span lists, folded to 60-bit ints so the aggregate is
    order-independent and overflow-free) — against a full DuckDB twin.
    The proto framing itself still has no SQL analog: its execution is
    forced through the ``protos_framed`` boolean (TRUE only if every
    bin's proto is non-trivially framed) and its bytes are pinned by the
    golden + round-trip pytests of sources/tfrecord.py.

    Scale: token counts and the quality gate are narrow scan-side
    expressions; the dedup shuffle carries (md5, id, n_tokens) only —
    never text; packing is the two-level prefix scan (no global window);
    per-bin state is bounded by capacity, not corpus size; the encoder
    runs after the last exchange (proto bytes never shuffle, SURVEY §7.3).
    """
    from videos_to_tfrecords_spark.operators.packing import pack_concat_spans
    from videos_to_tfrecords_spark.operators.text import (
        with_quality_score,
        with_token_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = with_quality_score(with_token_stats(docs))
    kept = scored.filter(
        (F.col("n_tokens") >= 8) & (F.col("stop_ratio_x1000") >= 50)
    ).select("doc_id", F.md5("text").alias("text_md5"), "n_tokens")
    # keep-first as a min_by aggregate: same keep-min-doc_id semantics as
    # the row_number window, but partial-combines map-side and never sorts
    deduped = (
        kept.groupBy("text_md5")
        .agg(F.expr("min_by(struct(doc_id, n_tokens), doc_id)").alias("m"))
        .select(F.col("m.doc_id").alias("doc_id"), F.col("m.n_tokens").alias("n_tokens"))
    )
    spans = pack_concat_spans(deduped, capacity=256)
    bins = (
        spans.groupBy("bin_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("off_in_bin", "doc_id", "len_in_bin"))
            ).alias("sl")
        )
        .select(
            "bin_id",
            F.expr("transform(sl, s -> s.doc_id)").alias("doc_ids"),
            F.expr("transform(sl, s -> s.off_in_bin)").alias("offs"),
            F.expr("transform(sl, s -> s.len_in_bin)").alias("lens"),
            F.size("sl").cast("long").alias("n_spans"),
            F.expr(
                "aggregate(sl, 0L, (a, s) -> a + s.len_in_bin)"
            ).alias("n_fill"),
        )
        # raw-binary context digest of the canonical span layout — the
        # BYTES-declared passthrough branch (reference features.py:48-54);
        # the hex form feeds the oracle-checked modular digest sum below
        .withColumn(
            "span_md5",
            F.md5(
                F.concat_ws(
                    ",",
                    F.col("bin_id"),
                    F.expr("array_join(doc_ids, '|')"),
                    F.expr("array_join(offs, '|')"),
                    F.expr("array_join(lens, '|')"),
                )
            ),
        )
        .withColumn("span_digest", F.unhex("span_md5"))
    )
    protos = with_sequence_example(
        bins,
        context_cols=["bin_id", "n_spans", "n_fill", "span_digest"],
        list_cols=["doc_ids", "offs", "lens"],
        context_kinds={
            "bin_id": FeatureKind.INT,
            "n_spans": FeatureKind.INT,
            "n_fill": FeatureKind.INT,
            "span_digest": FeatureKind.BYTES,
        },
        list_kinds={
            "doc_ids": FeatureKind.INT,
            "offs": FeatureKind.INT,
            "lens": FeatureKind.INT,
        },
    )
    # 60-bit fold of each bin's layout md5: order-independent integer sum
    # closes in DECIMAL(38,0) then narrows mod 2^62 to BIGINT — exact
    # cross-engine at any corpus size (no float, no overflow)
    h = F.conv(F.substring("span_md5", 1, 15), 16, 10).cast("decimal(38,0)")
    return protos.agg(
        F.count("*").cast("long").alias("n_bins"),
        F.sum("n_spans").cast("long").alias("n_spans"),
        F.sum("n_fill").cast("long").alias("n_tokens_packed"),
        (F.sum(h) % F.lit(4611686018427387904))
        .cast("long")
        .alias("layout_digest_sum"),
        # TRUE only if EVERY bin framed a non-trivial SequenceExample —
        # keeps the encoder on the executed plan (Catalyst can't prune it)
        (
            F.count(F.when(F.length("proto") >= F.lit(12), 1)) == F.count("*")
        ).alias("protos_framed"),
    )


@query(
    "streaming_tumbling_counts",
    """
SELECT ((epoch_ns(ts)//1000) // 86400000000) * 86400 AS win_start_s,
       event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
""",
)
def q_streaming_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming variant of the tumbling-window aggregate (§7
    extension): readStream file source → windowed agg → memory sink, drained
    synchronously. Hash-matches the batch oracle — one logical plan, two
    execution modes."""
    return streaming_tumbling_counts(spark, sf_dir)


@query(
    "streaming_dedup_events",
    """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
)
def q_streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DEDUPLICATION — the LLM-pipeline dedup primitive under
    unbounded input: dropDuplicates((user_id, event_type)) under a
    watermark, state bounded because expired keys age out, then a per-type
    count. On the bounded test source this hash-matches the batch
    count-distinct oracle exactly."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_dedup_events,
    )

    return streaming_dedup_events(spark, sf_dir)


@query(
    "streaming_session_windows",
    """
WITH e AS (SELECT event_id, user_id, (epoch_ns(ts)//1000) AS ts_us FROM events),
s AS (SELECT user_id, ts_us, event_id,
             CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w > 3600000000 THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
x AS (SELECT user_id, ts_us,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM s)
SELECT user_id,
       CAST(min(ts_us) AS BIGINT) AS start_us,
       CAST(max(ts_us) + 3600000000 AS BIGINT) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM x GROUP BY user_id, sid
""",
)
def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows: F.session_window(1h gap) under a
    watermark, drained on the bounded source. The oracle is the independent
    lag/cumsum gaps-and-islands formulation (the session_window_native
    pattern) — two definitions of "session" agreeing is the check."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_session_windows,
    )

    return streaming_session_windows(spark, sf_dir)


@query("video_pipeline_crop_mode")  # rows-only: spans decode+inference+windows
def q_pipeline_crop_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's --mode=crop_video E2E (preprocess.py:399-403): decode
    → inference → SLIDING-window sequence assembly with the P9 partial-
    window rule (video_length = 1000·frame_total/frame_per_sec, exactly
    preprocess.py:293) → FormatFeatures → per-split window counts."""
    files = _files_df(spark, sf_dir)
    from videos_to_tfrecords_spark.operators.filenames import (
        extract_label,
        filter_extensions,
    )
    from videos_to_tfrecords_spark.operators.sequence import crop_video

    labeled = extract_label(filter_extensions(files))
    split = hash_bucket_split(labeled, "doc_id")
    # fused decode→inference (one Python boundary; see decode_and_infer)
    embedded = decode_and_infer(
        split.select("filename", "label", "dataset"),
        linear_stub_model(12, 4),
        cloud=True,
    )
    length_ms = F.lit(1000.0) * F.col("frame_total") / F.col("frame_per_sec")
    crop = crop_video(
        embedded.withColumn("length_ms", length_ms),
        ts_ms_col="timestamp_ms",
        key_cols=["filename"],
        size_ms=2000,
        slide_ms=1000,
        length_ms_col="length_ms",
        partial_policy="reference",
    )
    seqs = format_features(
        crop,
        context_cols=["label", "dataset"],
        list_cols=["logits", "timestamp_ms"],
    )
    return (
        seqs.groupBy("dataset")
        .agg(
            F.count("*").alias("n_sequences"),
            F.sum(F.size("timestamp_ms")).alias("n_frames_total"),
        )
        .orderBy("dataset")
    )


@query(
    "streaming_stream_stream_join",
    """
WITH e AS (SELECT event_id, epoch_ns(ts)//1000 AS ts_us, user_id, event_type
           FROM events)
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       v.ts_us AS view_us,
       c.ts_us AS click_us
FROM e v JOIN e c ON v.user_id = c.user_id
WHERE v.event_type = 'view' AND c.event_type = 'click'
  AND c.ts_us > v.ts_us AND c.ts_us <= v.ts_us + CAST(3600000000 AS BIGINT)
""",
)
def q_streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (§7 streaming extension):
    view⋈click within 1h per user, both sides watermarked so join-buffer
    state is evictable. Hash-matches the declarative batch interval join —
    one logical result, streaming physical execution."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_stream_stream_join,
    )

    return streaming_stream_stream_join(spark, sf_dir)


@query(
    "jsonl_source_roundtrip",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY event_type
""",
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink breadth (§2.1 extension): events written as
    JSONL (integer cents — exact through the text format), read back with
    an EXPLICIT schema (schema inference is a full extra pass at 100 TB;
    never pay it twice), aggregated. The oracle computes the same result
    from the parquet directly, so the JSON round-trip itself is what is
    being hash-checked. Deterministic overwrite path keeps re-runs pure."""
    import hashlib as _hl
    import os

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    # stay inside the repo (gitignored warehouse dir), keyed by SF so
    # concurrent SF runs never collide
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "jsonl_" + _hl.md5(sf_dir.encode()).hexdigest()[:8],
    )
    ev.write.mode("overwrite").json(path)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("value_cents").alias("value_cents")
    )


@query(
    "csv_source_roundtrip",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY event_type
""",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink breadth (§2.1 extension, the jsonl twin): events
    written as headered CSV (integer cents — exact through text), read
    back with an EXPLICIT schema, aggregated; the oracle reads the parquet
    directly so the CSV round-trip itself is hash-checked."""
    import hashlib as _hl
    import os

    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "csv_" + _hl.md5(sf_dir.encode()).hexdigest()[:8],
    )
    ev.write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).option("header", "true").csv(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("value_cents").alias("value_cents")
    )


@query(
    "streaming_foreachbatch_upsert",
    """
SELECT user_id, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id, event_type
""",
)
def q_streaming_foreachbatch_upsert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """foreachBatch → MERGE-upsert sink (r7): per-microbatch increments
    full-outer-merged into a copy-on-write versioned target table — the
    idempotent lakehouse-MERGE pattern (with Delta/Iceberg the body is
    one MERGE INTO). Drained, the final version hash-matches the batch
    census; multi-batch idempotence asserted in tests/test_streaming.py."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_upsert_foreachbatch,
    )

    return streaming_upsert_foreachbatch(spark, sf_dir)


@query(
    "parquet_schema_evolution",
    """
WITH e AS (SELECT event_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents,
                  length(props) AS props_len
           FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS value_cents,
       CAST(count(CASE WHEN event_id % 2 != 0 THEN 1 END) AS BIGINT)
         AS n_with_props_len,
       CAST(sum(CASE WHEN event_id % 2 != 0 THEN props_len ELSE 0 END)
         AS BIGINT) AS props_len_sum
FROM e GROUP BY event_type
""",
)
def q_parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read evolution (§2.1 sources breadth): two parquet batches
    of the same table where the SECOND adds a column (the routine drift of
    a long-lived 100 TB ingestion path), read back as one dataset with
    ``mergeSchema=true`` — rows from the old batch surface the new column
    as NULL. The census counts/sums the evolved column only where it
    exists, so the merge semantics themselves are hash-checked (oracle
    reconstructs the same split from the event ids)."""
    import hashlib as _hl
    import os

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.length("props").cast("long").alias("props_len"),
    )
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "evo_" + _hl.md5(sf_dir.encode()).hexdigest()[:8],
    )
    v1 = ev.filter(F.col("event_id") % 2 == 0).drop("props_len")
    v2 = ev.filter(F.col("event_id") % 2 != 0)
    v1.write.mode("overwrite").parquet(os.path.join(base, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(base, "batch=2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "batch=1"), os.path.join(base, "batch=2")
    )
    return back.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("value_cents"),
        F.count("props_len").cast("long").alias("n_with_props_len"),
        F.coalesce(F.sum("props_len"), F.lit(0))
        .cast("long")
        .alias("props_len_sum"),
    )


@query(
    "observed_quality_metrics",
    """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(count(CASE WHEN value <= 0 THEN 1 END) AS BIGINT) AS n_nonpositive,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
       CAST(count(CASE WHEN props IS NULL OR props = '' THEN 1 END)
         AS BIGINT) AS n_empty_props
FROM events
""",
)
def q_observed_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight data-quality metrics via ``df.observe`` (r7, the Spark
    Observation API): the quality counters PIGGYBACK on the pipeline's own
    action instead of costing a second corpus pass — at 100 TB this is how
    per-batch row counts / null rates / revenue checksums ship to the
    metrics system for free. The observed job here is a noop-format write
    of the events scan (the pipeline's stand-in main action); the
    observation's exact aggregates are returned as a 1-row frame and
    hash-checked against the batch SQL — proving observe() metrics equal
    a dedicated aggregation pass.

    Observe rejects DISTINCT aggregates, so the exact type count rides a
    ``size(collect_set(...))`` accumulator — fine here because the
    event-type domain is bounded; unbounded-cardinality columns would use
    approx_count_distinct in the observation."""
    from pyspark.sql import Observation

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("quality")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        F.count(F.when(F.col("value") <= 0, 1)).alias("n_nonpositive"),
        F.size(F.collect_set("event_type")).alias("n_event_types"),
        F.count(
            F.when(F.col("props").isNull() | (F.col("props") == ""), 1)
        ).alias("n_empty_props"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["value_cents"]),
                int(m["n_nonpositive"]),
                int(m["n_event_types"]),
                int(m["n_empty_props"]),
            )
        ],
        "n_rows long, value_cents long, n_nonpositive long, "
        "n_event_types long, n_empty_props long",
    )


def _stream_cms_cells_sql(width: int = 256, depth: int = 4) -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    return " UNION ALL ".join(
        f"SELECT {d} AS d, "
        f"{h15_sql('CAST(user_id AS VARCHAR)', salt=f'cms{d}')} % {width} AS bucket "
        f"FROM events"
        for d in range(depth)
    )


@query(
    "streaming_cms_counts",
    f"""
WITH cells AS ({_stream_cms_cells_sql()})
SELECT d, bucket, CAST(count(*) AS BIGINT) AS c
FROM cells GROUP BY 1, 2
""",
)
def q_streaming_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch as a STREAMING aggregation over event user ids —
    streaming state is the counter table itself (depth·width rows, constant
    in stream volume; an exact per-key count would grow state with the key
    universe). Drained on the bounded source, the sketch equals the batch
    build exactly, so the streaming path is oracle-checked; multi-microbatch
    mergeability is pytest-driven (streaming/pipeline.streaming_cms_counts)."""
    from videos_to_tfrecords_spark.streaming.pipeline import streaming_cms_counts

    return streaming_cms_counts(spark, sf_dir)


def _drift_oracle() -> str:
    from videos_to_tfrecords_spark.plans.feature_queries import DRIFT_ORACLE_SQL

    return DRIFT_ORACLE_SQL


@query("streaming_value_drift", _drift_oracle())
def q_streaming_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift monitor run THROUGH Structured Streaming: the temporal
    midpoint comes from one batch scalar aggregate (driver metadata, like
    pagerank's node count), the (half, bin) histogram is a streaming
    aggregation with constant 20-row state
    (streaming/pipeline.streaming_drift_histogram), and the closing
    chi-square pivot runs on the drained result. Must hash-match the
    SAME oracle as the batch value_drift_chisq — the streaming and batch
    paths are interchangeable bit-for-bit."""
    from videos_to_tfrecords_spark.sources.tables import load_table
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_drift_histogram,
    )

    ev = load_table(spark, sf_dir, "events")
    mid2 = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))).alias("m")
    ).collect()[0].m
    hist = streaming_drift_histogram(spark, sf_dir, midpoint_us2=int(mid2))
    o = hist.groupBy("bin").agg(
        F.sum(F.when(F.col("h") == 0, F.col("c")).otherwise(F.lit(0))).alias("o1"),
        F.sum(F.when(F.col("h") == 1, F.col("c")).otherwise(F.lit(0))).alias("o2"),
    )
    n = o.agg(F.sum("o1").alias("n1"), F.sum("o2").alias("n2"))
    nn = F.col("n1") + F.col("n2")
    e1 = ((F.col("o1") + F.col("o2")) * F.col("n1")).cast("double") / nn
    e2 = ((F.col("o1") + F.col("o2")) * F.col("n2")).cast("double") / nn
    chi = F.when(
        (F.col("o1") + F.col("o2")) == 0, F.lit(0.0)
    ).otherwise(
        (F.col("o1").cast("double") - e1) * (F.col("o1").cast("double") - e1) / e1
        + (F.col("o2").cast("double") - e2) * (F.col("o2").cast("double") - e2) / e2
    )
    return o.crossJoin(F.broadcast(n)).select(
        "bin",
        F.col("o1").cast("long").alias("o1"),
        F.col("o2").cast("long").alias("o2"),
        F.floor(F.lit(1000000.0) * chi).cast("long").alias("chi_x1e6"),
    )


def _phash_oracle() -> str:
    # thumbnail pixel j = Σ md5-lead-byte of tokens at positions ≡ j (mod
    # 32), mod 256; bit j set iff 32·v_j > Σv (exact ints)
    ph = " + ".join(
        f"(CASE WHEN 32 * v[{i + 1}] > s THEN {1 << i} ELSE 0 END)"
        for i in range(32)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t,
         unnest(range(0, len(string_split(text, ' ')))) AS o
  FROM documents),
pxs AS (
  SELECT doc_id, o % 32 AS j,
         CAST(sum(CAST(concat('0x', substr(md5(t), 1, 2)) AS BIGINT)) % 256
              AS BIGINT) AS px
  FROM tok GROUP BY doc_id, o % 32),
plane2 AS (
  SELECT doc_id,
         list(coalesce(px, 0) ORDER BY j) AS v0
  FROM (SELECT d.doc_id, g.j, pxs.px
        FROM documents d
        CROSS JOIN (SELECT unnest(range(0, 32)) AS j) g
        LEFT JOIN pxs ON pxs.doc_id = d.doc_id AND pxs.j = g.j)
  GROUP BY doc_id),
sig AS (
  SELECT doc_id, CAST({ph} AS BIGINT) AS ph
  FROM (SELECT doc_id, v0 AS v, list_sum(v0) AS s FROM plane2)),
bands AS (
  SELECT doc_id, ph, 0 AS b, ph % 2048 AS v FROM sig
  UNION ALL SELECT doc_id, ph, 1 AS b, (ph // 2048) % 2048 AS v FROM sig
  UNION ALL SELECT doc_id, ph, 2 AS b, ph // 4194304 AS v FROM sig),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b, l.ph AS pha, r.ph AS phb
  FROM bands l JOIN bands r ON l.b = r.b AND l.v = r.v AND l.doc_id < r.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(pha, phb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(pha, phb)) <= 2
"""


@query("media_phash_dup_pairs", _phash_oracle())
def q_media_phash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate media detection: perceptual average-hash signatures
    computed from the raw binary payload in one Arrow pass
    (operators/multimodal.phash_signatures), candidate pairs via the
    3-band pigeonhole join (any pair within Hamming ≤ 2 shares an intact
    band — zero recall loss, no quadratic cross), popcount-verified on
    candidates only. The image plane is a deterministic function of the
    payload, so the WHOLE pipeline — Python decode included — is
    hash-checked. Band width scales with corpus size like the simhash
    bands (SCALE.md)."""
    from videos_to_tfrecords_spark.operators.multimodal import phash_signatures
    from videos_to_tfrecords_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sig = phash_signatures(docs)
    bands = sig.select(
        "doc_id",
        "ph",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("b"), F.expr("ph % 2048").alias("v")),
                F.struct(F.lit(1).alias("b"), F.expr("(ph div 2048) % 2048").alias("v")),
                F.struct(F.lit(2).alias("b"), F.expr("ph div 4194304").alias("v")),
            )
        ).alias("bv"),
    ).select("doc_id", "ph", "bv.b", "bv.v")
    l = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("ph").alias("pha"), "b", "v"
    )
    r = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("ph").alias("phb"), "b", "v"
    )
    cand = (
        l.join(r, ["b", "v"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pha", "phb")
        .distinct()
    )
    ham = F.expr("bit_count(pha ^ phb)")
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= 2)
        .select("doc_a", "doc_b", "hamming")
    )


_AUDIO_SILENCE = 36_864


@query(
    "audio_energy_windows",
    f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
l AS (SELECT doc_id,
             list_transform(toks,
                 t -> CAST(concat('0x', substr(md5(t), 1, 2)) AS BIGINT) - 128)
               AS leads,
             64 + doc_id % 64 AS ns, len(toks) AS nt FROM d),
w AS (SELECT doc_id, leads, nt,
             unnest(range(0, (ns - 16) // 8 + 1)) AS win_idx FROM l),
e AS (SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
             CAST(list_sum(list_transform(range(0, 16),
                  j -> (leads[(win_idx * 8 + j) % nt + 1])
                       * (leads[(win_idx * 8 + j) % nt + 1]))) AS BIGINT) AS energy
      FROM w)
SELECT doc_id, win_idx, energy, (energy < {_AUDIO_SILENCE}) AS is_silence FROM e
""",
)
def q_audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality framing through the Python boundary: deterministic
    fake PCM decode → overlapping 16-sample windows (hop 8) → exact
    integer energy + silence flag. The mapInPandas flat map IS the real
    plumbing a PCM codec would ride; the closed-form samples make it
    hash-checkable end to end (the media_decode_frames stance, audio
    edition)."""
    from videos_to_tfrecords_spark.operators.multimodal import (
        audio_energy_windows,
    )

    docs = load_table(spark, sf_dir, "documents")
    return audio_energy_windows(docs, silence_energy=_AUDIO_SILENCE)


def _shadow_oracle() -> str:
    def matmul(salt: str, alias: str) -> str:
        return f"""
{alias}w AS (SELECT i, j,
       CAST(concat('0x', substr(md5('{salt}:' || i || ':' || j), 1, 15)) AS BIGINT)
         % 201 - 100 AS w
     FROM dims, outs),
{alias}l AS (SELECT vec_id, j, greatest(CAST(sum(xq[i + 1] * w) AS BIGINT), 0) AS logit
     FROM x, {alias}w GROUP BY 1, 2),
{alias}a AS (SELECT vec_id, j AS am FROM (
       SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
              ORDER BY logit DESC, j) AS rnk FROM {alias}l) WHERE rnk = 1)"""

    return f"""
WITH x AS (SELECT vec_id, label,
                  list_transform(embedding::DOUBLE[],
                                 v -> CAST(round(v * 1000) AS BIGINT)) AS xq
           FROM embeddings),
dims AS (SELECT unnest(range(0, (SELECT len(embedding) FROM embeddings LIMIT 1)))
           AS i),
outs AS (SELECT unnest(range(0, 8)) AS j),
{matmul("w", "p")},
{matmul("w2", "s")}
SELECT x.label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN pa.am = sa.am THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
FROM x JOIN pa ON pa.vec_id = x.vec_id JOIN sa ON sa.vec_id = x.vec_id
GROUP BY x.label
"""


@query("shadow_inference_agreement", _shadow_oracle())
def q_shadow_inference_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shadow-deployment model comparison (the MLOps gate before swapping
    a corpus-filter model): run the production and candidate model
    versions over the same embeddings in one pass each, census per-label
    argmax agreement. Both versions are integer hash-weight models
    (independent salt families), so the ENTIRE double-inference pipeline
    — two iterator-pandas-UDF passes included — hash-matches the SQL twin
    matmuls."""
    from videos_to_tfrecords_spark.ml.inference import int_hash_linear_model

    emb = load_table(spark, sf_dir, "embeddings")
    prod = batch_inference(
        emb, "embedding", int_hash_linear_model(8, salt="w"), drop_input=False
    ).withColumnRenamed("logits", "logits_prod")
    both = batch_inference(
        prod, "embedding", int_hash_linear_model(8, salt="w2"), drop_input=True
    ).withColumnRenamed("logits", "logits_cand")
    am = lambda c: (F.array_position(c, F.array_max(c)) - 1).cast("long")  # noqa: E731
    agree = (
        am(F.col("logits_prod")) == am(F.col("logits_cand"))
    ).cast("long")
    return both.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum(agree).alias("n_agree"),
    )


_SCENE_ORACLE = """
WITH frames AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS frame_idx,
         CAST(t.i AS DOUBLE) * 500.0 AS timestamp_ms,
         ((doc_id * 31 + t.i) % 1000) * 2654435761 % 4096 AS feat
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, CAST(doc_id % 4 AS BIGINT))) AS i) t),
cuts AS (
  SELECT doc_id, frame_idx, timestamp_ms,
         CASE WHEN lag(feat) OVER w IS NULL THEN 1
              WHEN abs(feat - lag(feat) OVER w) > 2048 THEN 1 ELSE 0 END AS cut
  FROM frames WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
segs AS (
  SELECT doc_id, timestamp_ms,
         sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS seg_id
  FROM cuts)
SELECT doc_id, CAST(seg_id AS BIGINT) AS seg_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       min(timestamp_ms) AS start_ms, max(timestamp_ms) AS end_ms
FROM segs GROUP BY doc_id, seg_id
"""


@query("video_scene_segments", _SCENE_ORACLE)
def q_video_scene_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut segmentation over decoded frames (the shot-boundary pass a
    video-training pipeline runs before sampling clips): per-frame feature
    delta vs the previous frame, cut where the jump exceeds the threshold,
    contiguous frames roll up into segments via a running cut-count. The
    decode is the closed-form fake (operators/multimodal.decode_media_frames
    — reference preprocess.py:162-187 territory), so the whole
    decode → lag-delta → segment rollup chain is hash-checked.

    Scale shape: decode is map-only; ONE shuffle partitions by doc_id and
    both windows plus the (doc_id, seg_id) rollup reuse it (per-group state
    bounded by frames-per-video, never corpus size). A real codec swaps into
    the same mapInPandas pass without touching the plan."""
    from pyspark.sql import Window

    frames = decode_media_frames(load_table(spark, sf_dir, "documents"))
    feat = (F.col("checksum") * F.lit(2654435761)) % F.lit(4096)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    lagf = F.lag(feat).over(w)
    cut = F.when(lagf.isNull(), F.lit(1)).otherwise(
        (F.abs(feat - lagf) > 2048).cast("int")
    )
    seg = frames.withColumn("seg_id", F.sum(cut).over(w))
    return seg.groupBy("doc_id", "seg_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.min("timestamp_ms").alias("start_ms"),
        F.max("timestamp_ms").alias("end_ms"),
    )


_RAG_CAND = 32  # lexical candidates per query kept for rerank


def _rag_oracle(final: str) -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql
    from videos_to_tfrecords_spark.functions.vector import scaled_int_dot_sql

    hq = h15_sql("CAST(doc_id AS VARCHAR)", salt="ragq")
    dot = scaled_int_dot_sql("qe.v", "ce.v")
    return f"""
WITH kq AS (SELECT GREATEST(1, count(*) // 16) AS m FROM documents),
d AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT doc_id AS query_id, source AS qsrc, tk[1:6] AS q6
      FROM d WHERE {hq} % (SELECT m FROM kq) = 0),
post AS (SELECT DISTINCT doc_id, unnest(tk) AS tok FROM d),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1),
qt AS (SELECT query_id, tok,
              row_number() OVER (PARTITION BY query_id ORDER BY df, tok) AS r
       FROM (SELECT DISTINCT query_id, unnest(q6) AS tok FROM q) j
       JOIN df USING (tok)),
rare AS (SELECT query_id, tok FROM qt WHERE r <= 2),
cand AS (SELECT DISTINCT r.query_id, p.doc_id
         FROM rare r JOIN post p USING (tok) WHERE p.doc_id != r.query_id),
sc AS (SELECT c.query_id, c.doc_id,
              CAST(len(list_intersect(q.q6, dd.tk)) AS BIGINT) AS score,
              dd.source = q.qsrc AS rel
       FROM cand c JOIN q ON q.query_id = c.query_id
       JOIN d dd ON dd.doc_id = c.doc_id),
top AS (SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS lr FROM sc)
        WHERE lr <= {_RAG_CAND}),
rr AS (SELECT t.query_id, t.doc_id, t.rel, t.lr,
              row_number() OVER (PARTITION BY t.query_id
                ORDER BY {dot} DESC, t.doc_id) AS er
       FROM top t JOIN e qe ON qe.vec_id = t.query_id
       JOIN e ce ON ce.vec_id = t.doc_id){final}
"""


_RAG_FUNNEL_FINAL = """
SELECT query_id,
       CAST(count(*) AS BIGINT) AS n_cand,
       CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_cand,
       CAST(coalesce(1000000 // min(CASE WHEN rel THEN er END), 0) AS BIGINT)
         AS rr_ppm,
       CAST(max(CASE WHEN rel AND er <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS hit3
FROM rr GROUP BY query_id"""

_RRF_FINAL = """
SELECT query_id, doc_id, fused, CAST(frank AS BIGINT) AS frank, rel
FROM (SELECT query_id, doc_id, rel,
             1000000000 // (60 + lr) + 1000000000 // (60 + er) AS fused,
             row_number() OVER (PARTITION BY query_id
               ORDER BY 1000000000 // (60 + lr) + 1000000000 // (60 + er) DESC,
                        doc_id) AS frank
      FROM rr)
WHERE frank <= 5"""


@query("rag_retrieval_e2e", _rag_oracle(_RAG_FUNNEL_FINAL))
def q_rag_retrieval_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth E2E mainline: the RETRIEVAL pipeline a RAG training-data
    builder runs — (1) bounded probe queries (corpus-derived modulus,
    leading 6 tokens as the lexical query), (2) candidate generation
    through the inverted token index pruned to each query's 2 RAREST
    tokens by global document frequency (the df-ordered prefix-filter that
    keeps stopword posting lists out of the join), (3) exact 6-token
    overlap scoring of candidates only, top-32 per query, (4) embedding
    dot-product rerank (exact scaled-int), (5) graded funnel: candidate
    counts, same-source relevance, reciprocal rank and hit@3 after rerank
    — per query, all exact integers, hash-checked against the SQL twin.

    Scale shape: df table is vocab-sized (broadcast); the posting join
    touches only the rare-token lists (~16 bounded queries × 2 lists);
    candidate scoring joins the bounded pair set against the corpus by
    doc_id ONCE (linear, no token explosion — array_intersect runs
    in-task on the already-loaded token arrays); rerank and metrics are
    metadata-sized windows over ≤ 16·32 rows."""
    rr = _rag_ranked(spark, sf_dir)
    return rr.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_cand"),
        F.sum(F.col("rel").cast("long")).cast("long").alias("n_rel_cand"),
        F.coalesce(
            F.expr("1000000 div min(CASE WHEN rel THEN er END)"), F.lit(0)
        )
        .cast("long")
        .alias("rr_ppm"),
        F.max(F.when(F.col("rel") & (F.col("er") <= 3), 1).otherwise(0))
        .cast("long")
        .alias("hit3"),
    )


def _rag_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared retrieval core of the RAG queries: candidates per bounded
    probe query with lexical rank ``lr`` (6-token overlap, top-32),
    embedding rank ``er`` (exact scaled-int dot) and relevance ``rel``."""
    from pyspark.sql import Window

    from videos_to_tfrecords_spark.functions.hashing import h15
    from videos_to_tfrecords_spark.functions.vector import scaled_int_dot

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n = int(docs.count())
    m = max(1, n // 16)
    d = docs.select("doc_id", "source", F.split("text", " ").alias("tk"))
    q = d.filter(h15(F.col("doc_id").cast("string"), salt="ragq") % m == 0).select(
        F.col("doc_id").alias("query_id"),
        F.col("source").alias("qsrc"),
        F.slice("tk", 1, 6).alias("q6"),
    )
    post = d.select("doc_id", F.explode(F.array_distinct("tk")).alias("tok"))
    df_t = post.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    qt = (
        q.select("query_id", F.explode(F.array_distinct("q6")).alias("tok"))
        .join(F.broadcast(df_t), "tok")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("df", "tok")
            ),
        )
    )
    rare = qt.filter(F.col("r") <= 2).select("query_id", "tok")
    cand = (
        post.join(F.broadcast(rare), "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id")
        .distinct()
    )
    sc = (
        cand.join(F.broadcast(q), "query_id")
        .join(d, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.size(F.array_intersect("q6", "tk")).cast("long").alias("score"),
            (F.col("source") == F.col("qsrc")).alias("rel"),
        )
    )
    top = sc.withColumn(
        "lr",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        ),
    ).filter(F.col("lr") <= _RAG_CAND)
    qe = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    ce = emb.select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("cv"))
    return (
        qe.join(F.broadcast(top), "query_id")
        .join(ce, "doc_id")
        .withColumn(
            "er",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc(scaled_int_dot("qv", "cv")), F.asc("doc_id")
                )
            ),
        )
        .select("query_id", "doc_id", "rel", "lr", "er")
    )


@query("hybrid_rrf_fusion", _rag_oracle(_RRF_FINAL))
def q_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the RAG pipeline's two rankers (hybrid
    search, the production default for lexical+vector retrieval): fused
    score = ⌊1e9/(60+lr)⌋ + ⌊1e9/(60+er)⌋ — the standard RRF with k=60,
    kept EXACT because ranks are bounded integers and both engines do the
    same integer floor divisions — then top-5 per query under
    (fused desc, doc_id). Shares the whole retrieval core (and the oracle
    CTE chain) with rag_retrieval_e2e; only the final ranking differs.

    Scale shape: inherits _rag_ranked's (bounded probe set × top-32
    candidates); the fusion itself is one metadata-sized window."""
    from pyspark.sql import Window

    rr = _rag_ranked(spark, sf_dir)
    fused = F.expr("1000000000 div (60 + lr) + 1000000000 div (60 + er)")
    w = Window.partitionBy("query_id").orderBy(F.desc("fused"), F.asc("doc_id"))
    return (
        rr.withColumn("fused", fused.cast("long"))
        .withColumn("frank", F.row_number().over(w).cast("long"))
        .filter(F.col("frank") <= 5)
        .select("query_id", "doc_id", "fused", "frank", "rel")
    )


@query(
    "streaming_heavy_hitters",
    """
WITH b AS (SELECT CAST(floor(value) AS BIGINT) AS bucket FROM events),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS freq FROM b GROUP BY 1)
SELECT bucket, freq,
       CAST((1000000 * freq) // (SELECT n FROM tot) AS BIGINT) AS share_ppm
FROM c, tot WHERE freq * 100 > n
""",
)
def q_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key monitor run THROUGH Structured Streaming (twin of the
    batch heavy_hitters_mg query, sharing its oracle bit-for-bit): the
    streaming state is the per-bucket count table, bounded by the value
    DOMAIN rather than stream volume. Multi-microbatch mergeability is
    pytest-driven; see streaming/pipeline.streaming_heavy_hitters for the
    unbounded-domain MG porting note."""
    from videos_to_tfrecords_spark.streaming.pipeline import streaming_heavy_hitters

    return streaming_heavy_hitters(spark, sf_dir)


def _stream_hll_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    h = h15_sql("CAST(user_id AS VARCHAR)", salt="hll")
    return f"""
WITH h AS (SELECT {h} AS hv FROM events),
rho AS (SELECT hv // 18014398509481984 AS idx,
               CASE WHEN hv % 18014398509481984 = 0 THEN 55
                    ELSE 55 - len(bin(hv % 18014398509481984)) END AS r
        FROM h),
regs AS (SELECT idx, max(r) AS m FROM rho GROUP BY idx),
sums AS (SELECT CAST(count(*) AS BIGINT) AS n_hit,
                CAST(sum(CAST(pow(2.0, 55 - m) AS BIGINT)) AS BIGINT) AS sp
         FROM regs)
SELECT n_hit,
       CAST(floor(0.709 * 4096.0 * pow(2.0, 55) /
            CAST(sp + (64 - n_hit) * 36028797018963968 AS DOUBLE)) AS BIGINT)
         AS est_distinct
FROM sums
"""


@query("streaming_hll_distinct", _stream_hll_oracle())
def q_streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HLL distinct-user estimate THROUGH Structured Streaming
    (streaming/pipeline.streaming_hll_registers): the 64-register sketch
    is the streaming state itself — constant in stream volume, merged by
    max() so microbatch order is irrelevant — and the drained registers
    feed the same exact-integer harmonic estimate as the batch
    hll_portable_union_distinct. The streaming approximate answer is
    itself hash-checked against the batch-constructed oracle: streaming
    and batch sketch paths are interchangeable bit-for-bit."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_hll_registers,
    )

    regs = streaming_hll_registers(spark, sf_dir)
    sums = regs.agg(
        F.count("*").cast("long").alias("n_hit"),
        F.sum(F.expr("CAST(pow(2.0, 55 - m) AS BIGINT)"))
        .cast("long")
        .alias("sp"),
    )
    return sums.select(
        "n_hit",
        F.floor(
            F.lit(0.709 * 4096.0)
            * F.pow(F.lit(2.0), F.lit(55))
            / (
                F.col("sp")
                + (F.lit(64) - F.col("n_hit")) * F.lit(36028797018963968)
            ).cast("double")
        )
        .cast("long")
        .alias("est_distinct"),
    )


_RBO_FINAL = """,
spine AS (SELECT unnest(range(1, 11)) AS d),
inter AS (SELECT rr.query_id, spine.d,
                 CAST(sum(CASE WHEN rr.lr <= spine.d AND rr.er <= spine.d
                          THEN 1 ELSE 0 END) AS BIGINT) AS i
          FROM rr, spine GROUP BY 1, 2),
perq AS (SELECT query_id,
                CAST(sum((1000000000 * i * (1 << (10 - d))) // (d * 1023))
                  AS BIGINT) AS rbo
         FROM inter GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(rbo) // count(*) AS BIGINT) AS mean_rbo_x1e9,
       CAST(min(rbo) AS BIGINT) AS min_rbo_x1e9
FROM perq"""


@query("ranker_rbo_agreement", _rag_oracle(_RBO_FINAL))
def q_ranker_rbo_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010 — public) between the RAG
    core's lexical and vector rankers at p=½, depth 10: the
    top-weighted agreement number that tells a hybrid-search team whether
    its two rankers are redundant (RBO→1, fusion adds nothing) or
    complementary (low RBO, fusion is load-bearing) — the diagnostic
    BEHIND the hybrid_rrf_fusion design choice, sharing its entire
    retrieval core and oracle CTE chain.

    p=½ makes every weight a dyadic rational, so each depth term floors
    exactly: (1e9·|A_d∩B_d|·2^(10−d)) // (d·1023), summed per query then
    floor-averaged. Prefix intersections come from one 10-row spine
    crossJoin over the bounded per-query candidate set (≤32 rows) —
    metadata-scale after the shared core."""
    rr = _rag_ranked(spark, sf_dir).localCheckpoint(eager=True)
    spine = spark.range(1, 11).select(F.col("id").alias("d"))
    inter = (
        rr.crossJoin(F.broadcast(spine))
        .groupBy("query_id", "d")
        .agg(
            F.sum(
                F.when(
                    (F.col("lr") <= F.col("d")) & (F.col("er") <= F.col("d")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("i")
        )
    )
    perq = inter.groupBy("query_id").agg(
        F.sum(
            F.expr("(1000000000 * i * shiftleft(1, 10 - d)) div (d * 1023)")
        )
        .cast("long")
        .alias("rbo")
    )
    return perq.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.expr("CAST(sum(rbo) div count(*) AS BIGINT)").alias(
            "mean_rbo_x1e9"
        ),
        F.min("rbo").cast("long").alias("min_rbo_x1e9"),
    )


@query(
    "streaming_stream_static_join",
    """
SELECT ((epoch_ns(e.ts) // 1000) // 86400000000) * 86400 AS win_start_s,
       c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
""",
)
def q_streaming_stream_static_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-static dimension enrichment (§7 streaming surface): the event
    stream joins the bounded customer dim map-side (broadcast — the static
    side adds NO stream state), then daily tumbling revenue per market
    segment. Hash-matches the batch join+window twin."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_static_enrich,
    )

    return streaming_static_enrich(spark, sf_dir)



@query(
    "tfrecord_sink_census",
    """
WITH b AS (
  SELECT doc_id, source, text,
         CASE WHEN (doc_id * 9973 + 7) % 100 < 15 THEN 'test'
              WHEN (doc_id * 9973 + 7) % 100 < 30 THEN 'val'
              ELSE 'train' END AS split
  FROM documents)
SELECT split,
       CAST(4 AS BIGINT) AS n_shards,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(octet_length(encode(CAST(doc_id AS VARCHAR)))
                + octet_length(encode(source))
                + octet_length(encode(text)) + 2) AS BIGINT) AS bytes_sum,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM b GROUP BY split
""",
)
def q_tfrecord_sink_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 on the executed plan (VERDICT r07 #5): the reference's actual
    output contract — ``write_split_tfrecords`` (per-split prefix
    LOWERCASED per reference preprocess.py:119, one shard per task,
    CRC32C-masked record framing) — written to the warehouse, then read
    back DISTRIBUTED (``read_tfrecords_df``: binaryFile scan + Arrow
    flat-map, which RAISES on any bad length/payload CRC, so a green row
    proves the wire framing), and censused per split: shard count from
    the filesystem listing (asserts the sharding layout, empty shards
    included), record count, total payload bytes, and the id-sum
    recovered by parsing the payloads — all hash-checked against an
    oracle over the pre-encode rows. Split routing is the deterministic
    hash-bucket split (operators/split.py), so the oracle reconstructs
    the exact same Train/Val/Test assignment."""
    import hashlib as _hl
    import os
    import shutil

    from videos_to_tfrecords_spark.sources.tfrecord import (
        read_tfrecords_df,
        write_split_tfrecords,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    payload = (
        hash_bucket_split(docs, "doc_id")
        .select(
            "dataset",
            F.encode(
                F.concat_ws(
                    "\t", F.col("doc_id").cast("string"), "source", "text"
                ),
                "UTF-8",
            ).alias("rec"),
        )
        .repartition(4)
        .localCheckpoint(eager=True)  # one corpus pass feeds 3 split sinks
    )
    base = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        "spark-warehouse",
        "tfsink_" + _hl.md5(sf_dir.encode()).hexdigest()[:8],
    )
    shutil.rmtree(base, ignore_errors=True)  # stale shards from prior layouts
    write_split_tfrecords(payload, "rec", "dataset", base)
    glob = os.path.join(base, "data", "*", "*.tfrecord")
    shards = (
        spark.read.format("binaryFile")
        .load(glob)
        .select(F.element_at(F.split("path", "/"), -2).alias("split"))
        .groupBy("split")
        .agg(F.count("*").cast("long").alias("n_shards"))
    )
    dec = read_tfrecords_df(spark, glob).select(
        F.element_at(F.split("path", "/"), -2).alias("split"),
        F.octet_length("record").cast("long").alias("blen"),
        F.split(F.decode(F.col("record"), "UTF-8"), "\t")
        .getItem(0)
        .cast("long")
        .alias("did"),
    )
    cen = dec.groupBy("split").agg(
        F.count("*").cast("long").alias("n_records"),
        F.sum("blen").cast("long").alias("bytes_sum"),
        F.sum("did").cast("long").alias("id_sum"),
    )
    return cen.join(F.broadcast(shards), "split").select(
        "split", "n_shards", "n_records", "bytes_sum", "id_sum"
    )


@query(
    "streaming_late_data_census",
    """
WITH e AS (SELECT event_id,
                  CAST(epoch_us(ts) AS BIGINT) AS us,
                  CAST(round(value * 100) AS BIGINT) AS cents,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
           FROM events),
b AS (SELECT min(d) AS dmin, max(d) AS dmax, max(us) AS maxus FROM e),
s AS (SELECT e.*,
             (event_id % 17 = 0
              AND d <= (SELECT dmin + (dmax - dmin) // 2 - 2 FROM b))
               AS straggler
      FROM e)
SELECT d AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM s, b
WHERE NOT straggler AND (d + 1) * 86400000000 <= b.maxus
GROUP BY d
""",
)
def q_streaming_late_data_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark late-data DROP on a real multi-batch source (§7 streaming
    surface, the semantic single-trigger drains can't reach): three
    deterministic microbatches, stragglers arriving after their
    day-windows were evicted, counts hash-checked against an oracle that
    replays the drop and emission rules exactly — see
    streaming/pipeline.streaming_late_data_census."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_late_data_census,
    )

    return streaming_late_data_census(spark, sf_dir)


@query(
    "streaming_tfrecord_sink_census",
    """
WITH e AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(event_id) AS BIGINT) AS id_sum,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(sum(octet_length(encode(CAST(event_id AS VARCHAR)))
                + octet_length(encode(event_type))
                + octet_length(encode(CAST(cents AS VARCHAR))) + 2)
            AS BIGINT) AS bytes_sum,
       CAST(3 AS BIGINT) AS n_batches,
       CAST(6 AS BIGINT) AS n_shards
FROM e GROUP BY event_type
""",
)
def q_streaming_tfrecord_sink_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """S4 × streaming (VERDICT r08 #7): the reference's TFRecord sink
    under a real multi-batch stream — three microbatches each append
    CRC32C-framed shards under their own batch prefix, the full shard set
    is read back distributed (CRC-verified) and censused per event_type
    with the batch/shard layout pinned — see
    streaming/pipeline.streaming_tfrecord_sink_census."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_tfrecord_sink_census,
    )

    return streaming_tfrecord_sink_census(spark, sf_dir)


@query(
    "streaming_stream_stream_left_outer",
    """
WITH v AS (SELECT event_id AS view_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS vus
           FROM events WHERE event_type = 'view'),
c AS (SELECT event_id AS click_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS cus
      FROM events WHERE event_type = 'click'),
wm AS (SELECT least((SELECT max(vus) FROM v), (SELECT max(cus) FROM c))
              - 3600000000 AS w),
m AS (SELECT v.view_id, c.click_id, v.user_id, v.vus
      FROM v JOIN c ON c.user_id = v.user_id
                   AND c.cus > v.vus AND c.cus <= v.vus + 3600000000),
um AS (SELECT v.view_id, CAST(-1 AS BIGINT) AS click_id, v.user_id, v.vus
       FROM v, wm
       WHERE NOT EXISTS (SELECT 1 FROM c
                         WHERE c.user_id = v.user_id
                           AND c.cus > v.vus
                           AND c.cus <= v.vus + 3600000000)
         AND v.vus + 3600000000 <= wm.w)
SELECT view_id, CAST(click_id AS BIGINT) AS click_id, user_id,
       CAST(vus AS BIGINT) AS view_us
FROM m
UNION ALL
SELECT view_id, click_id, user_id, CAST(vus AS BIGINT) AS view_us FROM um
""",
)
def q_streaming_stream_stream_left_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join (§7 streaming surface):
    inner matches plus null-padded (click_id = −1) views released only
    when the global watermark proves no future match — the state-expiry
    emission rule replayed exactly by the oracle; see
    streaming/pipeline.streaming_stream_stream_left_outer."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_stream_stream_left_outer,
    )

    return streaming_stream_stream_left_outer(spark, sf_dir)


@query(
    "streaming_dedup_within_watermark",
    """
WITH raw AS (SELECT user_id, event_type,
                    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
             FROM events),
bo AS (SELECT min(d) AS dmin, max(d) AS dmax FROM raw),
lab AS (SELECT user_id, event_type, d,
               CASE WHEN d <= dmin + (dmax - dmin) // 3 THEN 0
                    WHEN d <= dmin + (2 * (dmax - dmin)) // 3 THEN 1
                    ELSE 2 END AS b
        FROM raw, bo),
arr AS (SELECT user_id, event_type, b, min(d) AS dfirst, count(*) AS cnt
        FROM lab GROUP BY 1, 2, 3),
m0 AS (SELECT max(dfirst) AS maxd0 FROM arr WHERE b = 0),
em AS (SELECT a.event_type, a.b, a.dfirst, a.cnt
       FROM arr a
       LEFT JOIN arr p0 ON p0.user_id = a.user_id
                       AND p0.event_type = a.event_type AND p0.b = 0
       LEFT JOIN arr p1 ON p1.user_id = a.user_id
                       AND p1.event_type = a.event_type AND p1.b = 1
       CROSS JOIN m0
       WHERE a.b = 0
          OR (a.b = 1 AND p0.user_id IS NULL)
          OR (a.b = 2 AND CASE
                WHEN p0.user_id IS NOT NULL
                  THEN m0.maxd0 - p0.dfirst >= 6
                WHEN p1.user_id IS NOT NULL THEN FALSE
                ELSE TRUE END))
SELECT event_type,
       CAST(b AS BIGINT) AS b,
       CAST(count(*) AS BIGINT) AS n_emitted,
       CAST(sum(dfirst) AS BIGINT) AS day_sum,
       CAST(sum(cnt) AS BIGINT) AS cnt_sum
FROM em GROUP BY 1, 2
""",
)
def q_streaming_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` — bounded-state streaming dedup
    (§7 extension; reference has no streaming state at all) on a real
    3-microbatch source: first-seen emits, in-horizon duplicates drop
    without refreshing state, expired keys re-emit one batch after lazy
    eviction — every rule probed on this Spark and replayed exactly by
    the oracle; see streaming/pipeline.streaming_dedup_within_watermark."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        streaming_dedup_within_watermark,
    )

    return streaming_dedup_within_watermark(spark, sf_dir)


@query(
    "orc_source_roundtrip",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events GROUP BY event_type
""",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink breadth (§2.1 extension; the columnar sibling of
    the parquet/csv/jsonl roundtrips): events written as zstd ORC, read
    back with a type-pushdown filter census — ORC's predicate pushdown +
    column pruning ride the same Catalyst path as parquet, verified by
    the oracle reading the original parquet directly."""
    import hashlib as _hl
    import os

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "orc_" + _hl.md5(sf_dir.encode()).hexdigest()[:8],
    )
    ev.write.mode("overwrite").option("compression", "zstd").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("value_cents").cast("long").alias("value_cents"),
        F.sum("event_id").cast("long").alias("id_sum"),
    )


@query(
    "xml_source_roundtrip",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events GROUP BY event_type
""",
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink (§2.1 extension) — native in Spark 4 (SPARK-44265
    folded spark-xml into core): events written one <event> element per
    row, read back with an explicit schema + rowTag, aggregated; integer
    cents survive text exactly, and the oracle reads the original parquet
    so the XML round-trip itself is hash-checked."""
    import hashlib as _hl
    import os

    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "xml_" + _hl.md5(sf_dir.encode()).hexdigest()[:8],
    )
    (
        ev.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "events")
        .option("rowTag", "event")
        .save(path)
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "event")
        .load(path)
    )
    return back.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("value_cents").cast("long").alias("value_cents"),
        F.sum("event_id").cast("long").alias("id_sum"),
    )


@query(
    "python_stream_source_census",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events GROUP BY event_type
""",
)
def q_python_stream_source_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Python STREAMING data source (Spark 4 simpleStreamReader,
    SPARK-45065): the events table replayed through a user-defined
    source in 4 deterministic offset chunks, drained, and censused —
    the oracle reads the parquet directly, so exactly-once chunk replay
    (no drop, no double-read across microbatches) is pinned by value;
    see sources/pystream.py for the API-scale notes."""
    import os
    import uuid

    from videos_to_tfrecords_spark.sources.pystream import (
        EventsReplaySource,
    )

    spark.dataSource.register(EventsReplaySource)
    path = os.path.join(sf_dir, "events.parquet")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    src = (
        spark.readStream.format("events_replay")
        .option("path", path)
        .load()
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents_sum"),
            F.sum("event_id").cast("long").alias("id_sum"),
        )
    )
    name = f"pystream_{uuid.uuid4().hex[:8]}"
    q = (
        src.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


@query(
    "bucketed_join_census",
    """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents_sum,
       CAST(sum(o.o_orderkey) AS BIGINT) AS id_sum
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
)
def q_bucketed_join_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join on BUCKETED tables (the 100 TB join
    strategy the brief names): orders and customer written once via
    ``bucketBy(8, custkey).sortBy`` through the catalog, then joined —
    SortMergeJoin reads matching buckets directly, no per-query Exchange
    or Sort on either side (plan asserted in tests/test_storage_layout.py;
    broadcast is disabled here so the bucketed SMJ path actually runs —
    at real scale neither side fits a broadcast anyway). The census
    hash-checks the VALUES through the bucketed storage path against the
    raw-parquet oracle."""
    import hashlib as _hl
    import os

    from videos_to_tfrecords_spark.sources.layout import write_bucketed

    sfx = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    names = {}
    for tbl, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        tname = f"{tbl}_bkt_{sfx}"
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        write_bucketed(
            load_table(spark, sf_dir, tbl),
            tname,
            os.path.join(repo, "spark-warehouse", tname),
            key,
        )
        names[tbl] = tname
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(names["orders"])
        c = spark.table(names["customer"])
        out = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("long").alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("cents_sum"),
                F.sum("o_orderkey").cast("long").alias("id_sum"),
            )
        )
        # materialize UNDER the no-broadcast conf: the returned frame reads
        # the checkpoint, so the driver's later collect replays the bucketed
        # SMJ result, not a re-planned broadcast join
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@query(
    "dpp_join_census",
    """
WITH e AS (SELECT event_id,
                  CAST(round(value * 100) AS BIGINT) AS cents,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
           FROM events),
b AS (SELECT min(d) AS dmin FROM e)
SELECT d,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM e, b WHERE d <= dmin + 4 GROUP BY d
""",
)
def q_dpp_join_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic Partition Pruning on the executed plan (SPARK-11150 — the
    100 TB scan killer for star joins): the events fact written
    ``partitionBy(day)``, joined to a broadcast dim holding the first five
    days — at planning time the day filter lives on the DIM side only, so
    static pruning can't help; DPP injects the dim's day set into the
    fact scan's PartitionFilters at runtime and the other ~25 day
    directories are never read (plan-asserted in
    tests/test_storage_layout.py). Census per kept day, hash-checked."""
    import hashlib as _hl
    import os
    import shutil

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
    )
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    path = os.path.join(
        repo, "spark-warehouse", "dpp_" + _hl.md5(sf_dir.encode()).hexdigest()[:8]
    )
    # rewrite every run: a stale layout from an older testdata generation
    # would silently diverge from the oracle (same md5 key across rounds)
    shutil.rmtree(path, ignore_errors=True)
    ev.write.partitionBy("d").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    dmin = ev.agg(F.min("d")).collect()[0][0]
    dim = (
        fact.select("d")
        .distinct()
        .filter(F.col("d") <= F.lit(dmin + 4))
        .withColumnRenamed("d", "dim_d")
    )
    joined = fact.join(
        F.broadcast(dim), fact["d"] == dim["dim_d"]
    )
    return joined.groupBy("d").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents_sum"),
        F.sum("event_id").cast("long").alias("id_sum"),
    )


@query(
    "statestore_reader_audit",
    """
SELECT event_type,
       CAST(user_id % 32 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1, 2
""",
)
def q_statestore_reader_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 state data source (§7 streaming-ops surface): raw streaming
    aggregation state read back as a batch DataFrame and hash-checked
    against the events-table oracle; see
    streaming/pipeline.statestore_reader_audit."""
    from videos_to_tfrecords_spark.streaming.pipeline import (
        statestore_reader_audit,
    )

    return statestore_reader_audit(spark, sf_dir)


def _video_decode_real_oracle() -> str:
    """Literal-table oracle for the REAL cv2 decode census, replayed at
    import from the same pure functions that build the AVI bytes on
    executors (the Python-precomputed-constant-table discipline: rawavi is
    deterministic integer math, so the expectation is exact)."""
    from videos_to_tfrecords_spark.ml import rawavi

    rows = ", ".join(
        "('{filename}', {n_frames}, {fps}, {frame_total}, {height}, "
        "{width}, {channels}, {on_pixels})".format(**rawavi.expected_census(v))
        for v in range(rawavi.N_VIDEOS)
    )
    return f"""
SELECT filename,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(fps AS BIGINT) AS fps,
       CAST(frame_total AS BIGINT) AS frame_total,
       CAST(height AS BIGINT) AS height,
       CAST(width AS BIGINT) AS width,
       CAST(channels AS BIGINT) AS channels,
       CAST(on_pixels AS BIGINT) AS on_pixels
FROM (VALUES {rows})
  AS t(filename, n_frames, fps, frame_total, height, width, channels,
       on_pixels)
"""


def q_video_decode_real_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/S3's REAL decode path on the executed plan (registered only when
    cv2 is importable — absent in the CI container, so this row exists for
    cv2-equipped boxes; the same census is also a skipif(cv2) pytest):
    deterministic rawvideo AVI bytes are synthesized IN PURE PYTHON on
    executors (ml/rawavi.py: lossless BI_RGB frames, binary pixels), then
    decoded through ``_decode_real``'s actual cv2.VideoCapture loop
    (reference preprocess.py:169-190 control flow) and censused per video.
    Lossless codec + binary pixels make the check exact: after /255
    normalization every value is exactly 0.0/1.0, so on-pixel mass is an
    integer. POS_MSEC-derived values are deliberately excluded (frame-time
    conventions differ across FFmpeg builds; at fps=2 with the 500 ms skip
    the KEEP rule itself is convention-invariant — see ml/rawavi.py).

    Scale: same shape as every decode census — synthesis+decode is an
    embarrassingly parallel spread-repartitioned mapInPandas stage, the
    census one partial-agg shuffle of per-frame scalar rows (image columns
    never shuffle)."""
    import pandas as _pd

    from videos_to_tfrecords_spark.ml import rawavi

    vids = spark.range(rawavi.N_VIDEOS).select(F.col("id").cast("int").alias("vid"))

    def synth(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "filename": [f"synth://rawavi/{v}.avi" for v in pdf["vid"]],
                    "content": [rawavi.make_avi_bytes(int(v)) for v in pdf["vid"]],
                }
            )

    files = vids.mapInPandas(synth, "filename string, content binary")
    frames = decode_videos(files, use_real=True, cloud=True)
    per_frame = frames.select(
        "filename",
        F.col("height").cast("long").alias("height"),
        F.col("width").cast("long").alias("width"),
        F.col("channels").cast("long").alias("channels"),
        F.col("frame_per_sec").cast("long").alias("fps"),
        F.col("frame_total").cast("long").alias("frame_total"),
        F.expr(
            "CAST(aggregate(image, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)) AS LONG)"
        ).alias("on_px"),
    )
    return per_frame.groupBy("filename").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.min("fps").alias("fps"),
        F.min("frame_total").alias("frame_total"),
        F.min("height").alias("height"),
        F.min("width").alias("width"),
        F.min("channels").alias("channels"),
        F.sum("on_px").alias("on_pixels"),
    )


# env-gated registration: the row must not exist where cv2 (and thus the
# real decode path) cannot run — the driver would record a red error row.
from videos_to_tfrecords_spark.ml.video import HAVE_CV2 as _HAVE_CV2  # noqa: E402
from videos_to_tfrecords_spark.plans.registry import ENV_GATED as _ENV_GATED  # noqa: E402

_ENV_GATED.add("video_decode_real_census")
if _HAVE_CV2:  # pragma: no cover - cv2 absent in this container
    query("video_decode_real_census", _video_decode_real_oracle())(
        q_video_decode_real_census
    )
