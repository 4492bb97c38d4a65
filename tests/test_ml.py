"""Inference scaffold + video decode + exact frame sampling."""

from __future__ import annotations

import numpy as np
import pytest
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


@pytest.mark.skipif(
    not __import__("videos_to_tfrecords_spark.ml.video", fromlist=["HAVE_CV2"]).HAVE_CV2,
    reason="cv2 not installed in this container",
)
def test_decode_real_cv2_roundtrip(spark, tmp_path):
    """Real cv2 path (reference preprocess.py:169-190): synthesize a tiny
    mp4 with cv2.VideoWriter, read it back through decode_videos(use_real=
    True) via binaryFile bytes, and check the sampling/cap/normalization
    contract. Skipped where cv2 is absent; the synthetic decoder covers the
    identical Spark plumbing there."""
    import cv2
    import numpy as np

    from videos_to_tfrecords_spark.ml.video import _decode_real

    path = str(tmp_path / "t.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (8, 6))
    for i in range(20):
        w.write(np.full((6, 8, 3), i * 10, dtype=np.uint8))
    w.release()
    content = open(path, "rb").read()

    kept = _decode_real(content, skip_msec=250.0, cloud=False)
    assert 1 <= len(kept) <= 3  # R4 local cap
    img, h, wd, c, ts, fps, total = kept[0]
    assert (h, wd, c) == (6, 8, 3) and fps == 10.0 and total == 20.0
    assert img.dtype == np.float32 and img.min() >= 0.0 and img.max() <= 1.0
    # timestamps honor the P8 skip predicate
    tss = [k[4] for k in kept]
    assert all(b - a >= 250.0 for a, b in zip(tss, tss[1:]))

    # corrupt bytes: no frames, no crash (documented deviation)
    assert _decode_real(b"not a video", 250.0, False) == []

    files = spark.createDataFrame(
        [("v1.avi", "lab", "train", bytearray(content))],
        "filename string, label string, dataset string, content binary",
    )
    rows = decode_videos(files, skip_msec=250.0, cloud=False, use_real=True).collect()
    assert 1 <= len(rows) <= 3 and rows[0].height == 6 and rows[0].width == 8


def test_batch_inference_by_shape_stacks_mixed_shapes(spark):
    """The reference batches per (dataset, image.shape) so np.concatenate
    never sees ragged input (preprocess.py:246-253). Mixed-shape frames
    through the shape-grouped op must stack cleanly and produce the same
    per-row results as running each shape separately through the plain op."""
    from videos_to_tfrecords_spark.ml.inference import batch_inference_by_shape

    def mean_max_model():
        def predict(batch: np.ndarray) -> np.ndarray:
            # shape-agnostic: reduces over the (homogeneous) pixel axis
            return np.stack([batch.mean(axis=1), batch.max(axis=1)], axis=1)

        return predict

    rows = []
    for i in range(10):  # 2×2×3 frames (12 px)
        rows.append((f"s{i}", "train", [float(i)] * 12, 2, 2, 3))
    for i in range(10):  # 4×4×3 frames (48 px)
        rows.append((f"b{i}", "train", [float(100 + i)] * 48, 4, 4, 3))
    df = spark.createDataFrame(
        rows,
        "filename string, dataset string, image array<double>, "
        "height int, width int, channels int",
    ).repartition(3)  # interleave shapes across partitions/batches

    out = batch_inference_by_shape(
        df,
        "image",
        shape_cols=["dataset", "height", "width", "channels"],
        model_factory=mean_max_model,
    ).collect()
    assert len(out) == 20 and all("image" not in r.asDict() for r in out)
    got = {r.filename: r.logits for r in out}
    for i in range(10):
        assert got[f"s{i}"] == [float(i), float(i)]
        assert got[f"b{i}"] == [float(100 + i), float(100 + i)]


def test_decode_videos_udtf_matches_mapinpandas(spark):
    """The Spark 4 Python UDTF variant (the literal analog of the
    reference's multi-row-yield DoFn) must produce exactly the
    mapInPandas flat-map's rows."""
    from videos_to_tfrecords_spark.ml.video import decode_videos_udtf

    files = spark.createDataFrame(
        [("gs://b/L/360P/v1.mp4", "L", "Train"), ("gs://b/M/720P/v2.mkv", "M", "Val")],
        "filename string, label string, dataset string",
    )
    a = sorted(map(tuple, decode_videos(files, cloud=True).collect()))
    b = sorted(map(tuple, decode_videos_udtf(files, cloud=True).collect()))
    assert a == b and len(a) > 0
    local = decode_videos_udtf(files, cloud=False).collect()
    per_file: dict[str, int] = {}
    for r in local:
        per_file[r.filename] = per_file.get(r.filename, 0) + 1
    assert all(n <= LOCAL_FRAME_CAP for n in per_file.values())
