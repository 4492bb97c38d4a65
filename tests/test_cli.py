"""CLI end-to-end: the reference's run_preprocess surface over a manifest,
through every --mode, producing parseable sharded TFRecords per split."""

from __future__ import annotations

import glob
import os

import pytest

from videos_to_tfrecords_spark.cli import main, parse_arguments
from videos_to_tfrecords_spark.sources.tfrecord import decode_sequence_example, read_records


def _manifest(tmp_path) -> str:
    files = [
        f"gs://bucket/videos/{label}/{res}/clip_{i}.{ext}"
        for i, (label, res, ext) in enumerate(
            [
                ("Animation", "360P", "mp4"),
                ("Gaming", "720P", "mkv"),
                ("Sports", "360P", "avi"),
                ("Vlog", "720P", "mp4"),
                ("Animation", "360P", "txt"),  # negative: filtered by P2
            ]
            * 4
        )
    ]
    path = os.path.join(tmp_path, "manifest.txt")
    with open(path, "w") as fh:
        fh.write("\n".join(files))
    return path


@pytest.mark.parametrize("mode", ["single_frame", "full_video", "crop_video"])
def test_cli_end_to_end(spark, tmp_path, mode):
    out = os.path.join(tmp_path, f"out_{mode}")
    counts = main(
        [
            "--input-manifest",
            _manifest(tmp_path),
            "--output-dir",
            out,
            "--mode",
            mode,
            "--sequence-length",
            "2000",
            "--period",
            "1000",
            "--cloud",  # lift the 3-frame local cap
        ],
        spark=spark,
    )
    assert sum(counts.values()) > 0
    files = glob.glob(os.path.join(out, "data", "*", "*.tfrecord"))
    assert files
    # every record parses; context carries the split name matching its dir
    n = 0
    for f in files:
        split_dir = os.path.basename(os.path.dirname(f))
        for rec in read_records(f):
            ctx, lists = decode_sequence_example(rec)
            assert ctx["dataset"][0].decode().lower() == split_dir
            assert ctx["label"][0].decode() in {"Animation", "Gaming", "Sports", "Vlog"}
            assert len(lists["logits"]) == len(lists["timestamp_ms"])
            n += 1
    assert n == sum(counts.values())


def test_cli_defaults_match_reference():
    a = parse_arguments(["--input-manifest", "m", "--output-dir", "o"])
    # reference run_preprocess.py defaults: mode=single_frame (:92-97),
    # sequence_length=15000 (:98-103), frame_sample_rate=500 (:87-91)
    assert a.mode == "single_frame"
    assert a.sequence_length == 15_000
    assert a.frame_sample_rate == 500.0
    assert (a.train, a.val, a.test) == (0.7, 0.15, 0.15)
