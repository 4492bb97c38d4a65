"""Multimodal column conventions + media ops (SURVEY §7.1 M5).

Convention (schema.MULTIMODAL_META_SCHEMA): a media asset is an opaque
``payload: binary`` column + a typed ``meta`` struct (media_type, codec,
dims, duration, n_bytes). Image/audio/video all ride this shape; decode /
resize / frame-sample are Arrow-batched Python over ``mapInPandas`` because
codecs are opaque to Catalyst — everything *around* them (metadata
projection, filtering, grouping by shape for homogeneous batches) stays
relational and pushes down.

The decode bodies are deterministic fakes (this container has no image/audio
codecs — see ml/video.py for the same stance); the Spark-side plumbing —
schemas, UDF signatures, batch shapes, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_media_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize the binary payload + meta struct from a text column (the
    testdata has no real media; payload = md5 bytes of the text, which is
    deterministic and oracle-checkable)."""
    payload = F.unhex(F.md5(F.col(text_col)))
    return df.select(
        id_col,
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake/raw").alias("codec"),
            F.lit(2).alias("width"),
            F.lit(2).alias("height"),
            F.lit(None).cast("double").alias("duration_ms"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


DECODED_FRAME_SCHEMA = "doc_id long, frame_idx long, timestamp_ms double, checksum long"


def decode_media_frames(df: DataFrame, frames_per_doc_mod: int = 4) -> DataFrame:
    """Fake media decode as a flat map (1 asset → N frames), mirroring the
    video decoder's UDTF shape: n_frames = 1 + (id % mod), frame i at
    i*500 ms with checksum (id*31+i) % 1000.

    The formula is closed-form so this Python-boundary operator is STILL
    hash-checkable against a SQL oracle — the plumbing is what's under test."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                doc_id = int(rec.doc_id)
                for i in range(1 + doc_id % frames_per_doc_mod):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "timestamp_ms": i * 500.0,
                            "checksum": (doc_id * 31 + i) % 1000,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "timestamp_ms", "checksum"]
            )

    return df.select("doc_id").mapInPandas(decode, DECODED_FRAME_SCHEMA)


PHASH_SCHEMA = "doc_id long, ph long"


def phash_signatures(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "doc_id") -> DataFrame:
    """Perceptual average-hash over the binary payload, Arrow-batched:
    each asset's (fake-decoded) 4×4 grayscale plane is the payload's 16
    bytes; bit i of the 16-bit hash is the EXACT integer comparison
    16·pixel_i > Σpixels (cross-multiplied — no float mean). The decode
    + hash runs in one mapInPandas pass over the raw bytes (numpy
    frombuffer, no Python-per-pixel loop); because the pixel plane is a
    deterministic function of the payload, the whole signature is
    reproducible in SQL, keeping even this Python-boundary operator
    hash-checkable. Real codecs drop into the same pass (decode → resize
    to 4×4 → same comparison) without touching the plan shape."""
    import numpy as np

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.frombuffer(
                b"".join(bytes(p[:16]) for p in pdf[payload_col]), dtype=np.uint8
            ).reshape(len(pdf), 16).astype(np.int64)
            s = mat.sum(axis=1, keepdims=True)
            bits = (16 * mat > s).astype(np.int64)
            ph = (bits << np.arange(16, dtype=np.int64)).sum(axis=1)
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "ph": ph})

    return df.select(id_col, payload_col).mapInPandas(hash_batches, PHASH_SCHEMA)
