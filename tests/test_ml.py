"""Inference scaffold + video decode + exact frame sampling."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.ml.inference import batch_inference, linear_stub_model
from videos_to_tfrecords_spark.ml.video import LOCAL_FRAME_CAP, _fake_video_props, decode_videos
from videos_to_tfrecords_spark.operators.sampling import sample_frames_exact


def test_inference_matches_numpy_golden(spark):
    vecs = [[float(x) for x in np.linspace(-1, 1, 8)], [0.0] * 8, [1.0] * 8]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)], "id long, vec array<double>")
    out = batch_inference(df, "vec", linear_stub_model(8, 3), drop_input=False)
    got = {r.id: np.array(r.logits) for r in out.collect()}
    model = linear_stub_model(8, 3)()
    want = model(np.array(vecs))
    for i in range(3):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-6)


def test_inference_drops_input_column(spark):
    # the reference's del element["image"] (preprocess.py:241)
    df = spark.createDataFrame([(1, [0.0] * 8)], "id long, vec array<double>")
    out = batch_inference(df, "vec", linear_stub_model(8, 2))
    assert "vec" not in out.columns and "logits" in out.columns


def test_decode_videos_flatmap_and_local_cap(spark):
    files = spark.createDataFrame(
        [("gs://b/L/360P/v1.mp4", "L", "Train"), ("gs://b/M/720P/v2.mkv", "M", "Val")],
        "filename string, label string, dataset string",
    )
    local = decode_videos(files, cloud=False).collect()
    # R4: ≤ 3 frames per video in local mode (preprocess.py:170-171,186)
    per_file: dict[str, int] = {}
    for r in local:
        per_file[r.filename] = per_file.get(r.filename, 0) + 1
    assert all(n <= LOCAL_FRAME_CAP for n in per_file.values())

    cloud = decode_videos(files, cloud=True).collect()
    assert len(cloud) >= len(local)
    one = cloud[0]
    assert one.height == 2 and one.width == 2 and one.channels == 3
    assert len(one.image) == 12
    fps, duration = _fake_video_props(one.filename)
    assert one.frame_per_sec == fps
    assert one.frame_total == duration / 1000.0 * fps
    # P8: kept frames are ≥ skip_msec apart per file
    by_file: dict[str, list[float]] = {}
    for r in cloud:
        by_file.setdefault(r.filename, []).append(r.timestamp_ms)
    for ts_list in by_file.values():
        ts_list.sort()
        # float frame positions (k·1000/fps) put gaps within an ulp of the
        # skip — same as the reference's cv2 POS_MSEC floats
        assert all(b - a >= 500.0 - 1e-6 for a, b in zip(ts_list, ts_list[1:]))


def test_sample_frames_exact_anchored_semantics(spark):
    # anchored scan ≠ bucket filter: with skip=500, frames at 0,300,900 keep
    # 0 and 900 (900 ≥ 0+500... 300 < 500 dropped, anchor stays 0)
    rows = [("f", 0.0), ("f", 300.0), ("f", 900.0), ("f", 1300.0), ("f", 1401.0)]
    df = spark.createDataFrame(rows, "filename string, timestamp_ms double")
    kept = sorted(
        r.timestamp_ms for r in sample_frames_exact(df, skip_msec=500.0).collect()
    )
    assert kept == [0.0, 900.0, 1401.0]


def test_native_predict_batch_udf_matches_iterator_path(spark):
    from videos_to_tfrecords_spark.ml.inference import batch_inference_native

    vecs = [[float(x) for x in np.linspace(-1, 1, 8)], [0.5] * 8]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)], "id long, vec array<float>")
    a = {r.id: r.logits for r in batch_inference(df, "vec", linear_stub_model(8, 3), drop_input=False).collect()}
    b = {r.id: r.logits for r in batch_inference_native(df, "vec", linear_stub_model(8, 3), input_width=8, drop_input=False).collect()}
    for i in a:
        np.testing.assert_allclose(a[i], b[i], rtol=1e-6)
