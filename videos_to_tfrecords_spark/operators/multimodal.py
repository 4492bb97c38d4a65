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
    payload = F.unhex(F.sha2(F.col(text_col), 256))
    return df.select(
        id_col,
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake/raw").alias("codec"),
            F.lit(8).alias("width"),
            F.lit(4).alias("height"),
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


def phash_signatures(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Perceptual average-hash signatures, Arrow-batched. The deterministic
    "decode" renders each document as a 4×8 luminance thumbnail the way a
    real media decode would (resize → luma plane): pixel j is the sum of
    the tokens' md5 lead bytes at stream positions ≡ j (mod 32), mod 256 —
    a STRUCTURAL thumbnail, so near-duplicate documents (a few token
    edits) land in nearby pixel planes exactly as near-duplicate images
    land in nearby thumbnails. Bit j of the 32-bit hash is the EXACT
    integer comparison 32·pixel_j > Σpixels (cross-multiplied, no float
    mean). The whole decode+hash runs in one mapInPandas pass (numpy,
    no per-pixel Python); every step is a deterministic function of the
    token stream, so the signature — Python boundary included — is
    reproducible in SQL and hash-checkable. A real codec drops into the
    same pass (decode → resize 4×8 → same comparison) without touching
    the plan shape. Hash width is the collision budget: the sf1 probe
    measured a 16-bit variant going superlinear (exponent 1.41) as
    band buckets saturated — same lesson as the 60-bit simhash rework.
    """
    import hashlib

    import numpy as np

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # md5 lead bytes memoized per distinct token (Zipf vocabulary ⇒
        # the cache, not the corpus, bounds Python-hash work — the same
        # per-distinct-token reasoning as the BPE dictionary join)
        memo: dict[str, int] = {}

        def lead(t: str) -> int:
            b = memo.get(t)
            if b is None:
                b = memo[t] = hashlib.md5(t.encode()).digest()[0]
            return b

        weights = 1 << np.arange(32, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            phs = np.zeros(len(pdf), dtype=np.int64)
            for r, text in enumerate(pdf[text_col]):
                hb = np.fromiter(
                    (lead(t) for t in text.split(" ")), dtype=np.int64
                )
                px = np.zeros(32, dtype=np.int64)
                np.add.at(px, np.arange(len(hb)) % 32, hb)
                px %= 256
                phs[r] = int(((32 * px > px.sum()) * weights).sum())
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "ph": phs})

    return df.select(id_col, text_col).mapInPandas(hash_batches, PHASH_SCHEMA)


AUDIO_WINDOW_SCHEMA = "doc_id long, win_idx long, energy long, is_silence boolean"


def audio_energy_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    win: int = 16,
    hop: int = 8,
    silence_energy: int = 36_864,  # RMS < 48 over 16 samples
) -> DataFrame:
    """Audio-modality framing: decode a waveform, slide overlapping
    windows (win=16, hop=8 — the STFT frame/hop pattern), emit per-window
    integer energy Σs² and a silence flag — the voice-activity /
    silence-trim primitive an audio pipeline runs before feature
    extraction. 1 asset → N windows, the same flat-map shape as the video
    frame decoder (ml/video.py).

    The "decode" is the deterministic fake (container has no codecs):
    sample_t = md5-lead-byte(token_{t mod n_toks}) − 128, n_samples =
    64 + id % 64 — closed-form, so energies are exact int64 and the WHOLE
    Python boundary hash-checks against SQL. A real PCM decode drops into
    the same mapInPandas pass (decode → frame → Σs²) with the plan shape,
    schema, and windowing arithmetic unchanged. Vectorized: per-doc numpy
    gather + square-sum over a (n_windows, win) index grid; md5 memoized
    per distinct token (the phash cache argument)."""
    import hashlib

    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def lead(t: str) -> int:
            b = memo.get(t)
            if b is None:
                b = memo[t] = hashlib.md5(t.encode()).digest()[0]
            return b

        for pdf in batches:
            out = {"doc_id": [], "win_idx": [], "energy": []}
            for rec in pdf.itertuples(index=False):
                doc_id = int(getattr(rec, id_col))
                toks = getattr(rec, text_col).split(" ")
                leads = (
                    np.fromiter((lead(t) for t in toks), dtype=np.int64) - 128
                )
                ns = 64 + doc_id % 64
                samples = leads[np.arange(ns) % len(leads)]
                nwin = (ns - win) // hop + 1
                idx = np.arange(nwin)[:, None] * hop + np.arange(win)[None, :]
                en = (samples[idx] ** 2).sum(axis=1)
                out["doc_id"].extend([doc_id] * nwin)
                out["win_idx"].extend(range(nwin))
                out["energy"].extend(int(e) for e in en)
            pd_out = pd.DataFrame(out)
            pd_out["is_silence"] = pd_out["energy"] < silence_energy
            yield pd_out

    return df.select(id_col, text_col).mapInPandas(gen, AUDIO_WINDOW_SCHEMA)
