"""ml/rawavi.py — the pure-Python lossless AVI behind the env-gated
`video_decode_real_census` registry row (U1/S3 real path).

The structural tests run everywhere (a RIFF walker validates the container
byte layout the synthesizer claims); the decode leg is skipif(cv2) like the
other real-path tests — on a cv2-equipped box it hash-checks the REAL
cv2.VideoCapture loop against the pure-integer expectation.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from videos_to_tfrecords_spark.ml import rawavi
from videos_to_tfrecords_spark.ml.video import HAVE_CV2


def _walk_riff(buf: bytes):
    """Yield (fourcc, payload) for every top-level chunk inside the RIFF
    body, checking declared sizes stay in-bounds."""
    assert buf[:4] == b"RIFF"
    (total,) = struct.unpack_from("<I", buf, 4)
    assert total == len(buf) - 8
    assert buf[8:12] == b"AVI "
    pos = 12
    while pos < len(buf):
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload = buf[pos + 8 : pos + 8 + size]
        assert len(payload) == size, f"truncated chunk {fourcc!r}"
        yield fourcc, payload
        pos += 8 + size + (size & 1)
    assert pos == len(buf)


@pytest.mark.parametrize("vid", range(rawavi.N_VIDEOS))
def test_container_structure(vid):
    buf = rawavi.make_avi_bytes(vid)
    chunks = list(_walk_riff(buf))
    fourccs = [c[0] for c in chunks]
    assert fourccs == [b"LIST", b"LIST", b"idx1"]

    hdrl, movi, idx1 = (c[1] for c in chunks)
    assert hdrl[:4] == b"hdrl" and movi[:4] == b"movi"

    n = rawavi.video_frame_count(vid)
    frame_size = rawavi.WIDTH * rawavi.HEIGHT * 3

    # avih pins frame count, dims, and the 500 ms frame period
    assert hdrl[4:8] == b"avih"
    usec, _, _, flags, total, _, streams, _, w, h = struct.unpack_from(
        "<10I", hdrl, 12
    )
    assert (usec, total, streams, w, h) == (500_000, n, 1, rawavi.WIDTH, rawavi.HEIGHT)
    assert flags & 0x10  # AVIF_HASINDEX

    # movi: exactly n '00db' chunks of exactly one uncompressed frame each
    pos, seen = 4, 0
    while pos < len(movi):
        assert movi[pos : pos + 4] == b"00db"
        (size,) = struct.unpack_from("<I", movi, pos + 4)
        assert size == frame_size
        pos += 8 + size
        seen += 1
    assert seen == n

    # idx1 offsets point at each chunk header (relative to 'movi' fourcc)
    entries = [struct.unpack_from("<4sIII", idx1, i * 16) for i in range(n)]
    for f, (cc, _, off, size) in enumerate(entries):
        assert cc == b"00db" and size == frame_size
        assert movi[off : off + 4] == b"00db"


def test_frames_binary_and_deterministic():
    m1 = rawavi.frame_on_mask(3, 2)
    m2 = rawavi.frame_on_mask(3, 2)
    assert m1.shape == (rawavi.HEIGHT, rawavi.WIDTH, 3)
    assert np.array_equal(m1, m2)
    assert rawavi.make_avi_bytes(0) == rawavi.make_avi_bytes(0)
    assert rawavi.make_avi_bytes(0) != rawavi.make_avi_bytes(1)
    # expected_census on_pixels is the sum of per-frame masks
    exp = rawavi.expected_census(3)
    assert exp["on_pixels"] == sum(
        int(rawavi.frame_on_mask(3, f).sum()) for f in range(exp["n_frames"])
    )
    # every frame lit somewhere but never saturated: the census can't pass
    # on an all-zero or all-255 decode bug
    assert 0 < rawavi.on_count(3, 0) < rawavi.HEIGHT * rawavi.WIDTH * 3


@pytest.mark.skipif(not HAVE_CV2, reason="cv2 absent in this container")
def test_real_decode_census_matches_expectation(spark):
    """On a cv2-equipped box: the registry row's REAL VideoCapture decode
    reproduces the pure-integer expectation exactly."""
    from videos_to_tfrecords_spark.plans.pipeline_queries import (
        q_video_decode_real_census,
    )

    got = {
        r["filename"]: r.asDict()
        for r in q_video_decode_real_census(spark, "/unused").collect()
    }
    assert len(got) == rawavi.N_VIDEOS
    for vid in range(rawavi.N_VIDEOS):
        exp = rawavi.expected_census(vid)
        assert got[exp["filename"]] == exp
