"""Video decode → frame rows (the reference's VideoToFrames UDTF).

Reference parity (preprocess.py:156-189): per filename, open the video
(there: cv2.VideoCapture over a V4 signed URL, preprocess.py:131-153,162-166),
iterate frames keeping one per ``skip_msec`` (the read-side temporal
downsample P8, preprocess.py:172-177), normalize /255 + BGR→RGB (P7,
preprocess.py:178-180), emit one row per kept frame with timestamp_ms,
rounded fps and frame_total (preprocess.py:181-187); in local mode cap at 3
frames (R4, preprocess.py:170-171,186).

Spark design: a ``mapInPandas`` flat-map over (filename[, content]) rows —
1 row in, N frame rows out, Arrow-batched. OpenCV is optional (not in this
container): when absent, ``decode`` falls back to a deterministic synthetic
decoder that fabricates fps/duration from the filename hash and constant
pixel frames — the Spark-side plumbing (schema, batching, flat-map shape,
sampling predicate, local cap) is identical and fully tested; swap
``_decode_real`` in when cv2 + real bytes exist.

Scale: decode is embarrassingly parallel and I/O bound; feed it from
``spark.read.format("binaryFile")`` (distributed listing + streaming reads —
the signed-URL machinery of preprocess.py:131-153 is storage-connector
territory in Spark) and repartition by file count before decoding so each
task holds O(1) videos.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - cv2 not present in this container
    import cv2  # type: ignore

    HAVE_CV2 = True
except ImportError:
    cv2 = None
    HAVE_CV2 = False

FRAME_SCHEMA = (
    "filename string, label string, dataset string, image array<float>, "
    "height int, width int, channels int, "
    "timestamp_ms double, frame_per_sec double, frame_total double"
)

DEFAULT_SKIP_MSEC = 500.0  # reference run_preprocess.py:87-91
LOCAL_FRAME_CAP = 3  # reference preprocess.py:170-171


def _fake_video_props(filename: str) -> tuple[float, float]:
    """Deterministic (fps, duration_ms) from the filename hash."""
    h = int(hashlib.md5(filename.encode()).hexdigest()[:8], 16)
    fps = [24.0, 30.0, 60.0][h % 3]
    duration_ms = 2_000.0 + (h % 8) * 1_000.0
    return fps, duration_ms


def _decode_fake(filename: str, skip_msec: float, cloud: bool):
    """Synthetic decoder with the reference's exact control flow: advance
    pos_msec at 1000/fps per frame, keep one per skip_msec, cap in local."""
    fps, duration_ms = _fake_video_props(filename)
    frame_total = duration_ms / 1000.0 * fps
    kept, last_ts = [], None
    pos_msec, frame_idx = 0.0, 0
    while pos_msec < duration_ms:
        if last_ts is None or pos_msec >= last_ts + skip_msec:  # P8 predicate
            last_ts = pos_msec
            # 2×2×3 constant frame: value = (hash ⊕ frame_idx) scaled to [0,1]
            v = ((int(hashlib.md5(filename.encode()).hexdigest()[:8], 16) ^ frame_idx) % 256) / 255.0
            image = np.full(2 * 2 * 3, v, dtype=np.float32)
            kept.append((image, pos_msec, fps, frame_total))
            if not cloud and len(kept) >= LOCAL_FRAME_CAP:  # R4 local cap
                break
        frame_idx += 1
        pos_msec = frame_idx * (1000.0 / fps)
    return kept


def _decode_real(content: bytes, skip_msec: float, cloud: bool):  # pragma: no cover
    """cv2 path — the reference's VideoCapture loop (preprocess.py:162-187),
    operating on in-memory bytes from binaryFile instead of a signed URL."""
    raise NotImplementedError(
        "real video decode requires cv2 + codecs not present in this "
        "container; the fake decoder exercises identical Spark plumbing"
    )


def decode_videos(
    df: DataFrame,
    skip_msec: float = DEFAULT_SKIP_MSEC,
    cloud: bool = False,
    use_real: bool = False,
) -> DataFrame:
    """UDTF-style flat map: one input row per video → one output row per
    sampled frame (reference preprocess.py:156-189). Expects columns
    filename, label, dataset (+ optional content binary for the real path)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                if use_real and HAVE_CV2:
                    kept = _decode_real(getattr(rec, "content", None), skip_msec, cloud)
                else:
                    kept = _decode_fake(rec.filename, skip_msec, cloud)
                for image, ts, fps, total in kept:
                    rows.append(
                        {
                            "filename": rec.filename,
                            "label": getattr(rec, "label", None),
                            "dataset": getattr(rec, "dataset", None),
                            "image": image.tolist(),
                            "height": 2,
                            "width": 2,
                            "channels": 3,
                            "timestamp_ms": float(ts),
                            "frame_per_sec": float(fps),
                            "frame_total": float(total),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "filename",
                    "label",
                    "dataset",
                    "image",
                    "height",
                    "width",
                    "channels",
                    "timestamp_ms",
                    "frame_per_sec",
                    "frame_total",
                ],
            )

    return df.mapInPandas(decode, FRAME_SCHEMA)
