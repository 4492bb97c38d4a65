"""Pure-Python rawvideo AVI synthesis: deterministic, LOSSLESS video bytes
for hash-checking the REAL cv2 decode path (U1/S3, reference
preprocess.py:156-190) without shipping binary fixtures or depending on a
lossy codec.

The container is RIFF/AVI with a single 'vids' stream, handler 'DIB ',
BI_RGB 24-bit frames (uncompressed bottom-up BGR) — the one video format
whose decode is bit-exact by definition, so what `_decode_real` reads back
IS the frame we wrote and an integer pixel census can be pinned as oracle
literals. Every pixel is binary (0 or 255): after the engine's /255
normalization (P7) each value is exactly 0.0 or 1.0 in float32, so
frame-level pixel sums are exact integers with no float-order sensitivity.

Census design constraint (why no timestamps): CAP_PROP_POS_MSEC's frame
convention (time of the just-decoded frame vs the next one) differs across
OpenCV/FFmpeg builds. At fps=2 with the reference's 500 ms sampling skip
the KEEP decision is convention-invariant (every frame keeps under either
reading — the frame period equals the skip), but the recorded timestamps
are not, so the census pins n_frames / dims / fps / frame_total /
on-pixel mass and deliberately never a POS_MSEC-derived value.

Everything here is pure integer math — the same functions both build the
bytes on executors and replay the expected census for the DuckDB oracle's
literal table.
"""

from __future__ import annotations

import struct

import numpy as np

N_VIDEOS = 6
FPS = 2          # frame period 1000/FPS = 500 ms == DEFAULT_SKIP_MSEC
WIDTH = 32       # multiple of 4: no BMP row padding at 24 bpp
HEIGHT = 24
CHANNELS = 3
# the writer below relies on (a) 4-byte-aligned BMP rows at 24 bpp (no
# per-row padding emitted) and (b) even RIFF chunk sizes (no pad byte
# emitted after 00db chunks). Editing the constants could silently emit
# spec-violating files that our own walker tolerates but real demuxers
# reject — fail loudly at import instead (ADVICE r09).
assert (WIDTH * CHANNELS) % 4 == 0, "BMP rows must be 4-byte aligned"
assert (WIDTH * HEIGHT * CHANNELS) % 2 == 0, "RIFF chunks must be even-sized"
assert CHANNELS == 3, "BI_RGB 24 bpp writer: exactly 3 channels"


def video_frame_count(vid: int) -> int:
    """5..8 frames, varying per video so frame_total is not a constant."""
    return 5 + (vid % 4)


def frame_on_mask(vid: int, frame: int) -> np.ndarray:
    """(H, W, 3) bool mask of lit pixels — deterministic integer mixing,
    identical on executors (bytes) and at import (oracle literals)."""
    y = np.arange(HEIGHT, dtype=np.int64)[:, None, None]
    x = np.arange(WIDTH, dtype=np.int64)[None, :, None]
    c = np.arange(CHANNELS, dtype=np.int64)[None, None, :]
    v = (
        x * 73856093
        + y * 19349663
        + c * 83492791
        + int(vid) * 2654435761
        + int(frame) * 97003
    ) % 7
    return v < 3


def on_count(vid: int, frame: int) -> int:
    return int(frame_on_mask(vid, frame).sum())


def expected_census(vid: int) -> dict:
    """The row `video_decode_real_census` must produce for this video —
    replayed from the same pure functions that build the bytes."""
    n = video_frame_count(vid)
    return {
        "filename": f"synth://rawavi/{vid}.avi",
        "n_frames": n,
        "fps": FPS,
        "frame_total": n,
        "height": HEIGHT,
        "width": WIDTH,
        "channels": CHANNELS,
        "on_pixels": sum(on_count(vid, f) for f in range(n)),
    }


def make_avi_bytes(vid: int) -> bytes:
    """Single-stream rawvideo AVI (RIFF → hdrl(avih, strl(strh, strf)) →
    movi('00db' frames) → idx1). biHeight > 0 ⇒ bottom-up rows, so frames
    are written flipped; the census is orientation- and channel-order-
    invariant (whole-frame sums), so storage order never matters."""
    n = video_frame_count(vid)
    frame_size = WIDTH * HEIGHT * 3

    frames = []
    for f in range(n):
        bgr = (frame_on_mask(vid, f).astype(np.uint8) * 255)
        frames.append(bgr[::-1].tobytes())  # bottom-up DIB rows

    avih = struct.pack(
        "<4sI10I",
        b"avih", 56,
        1_000_000 // FPS,   # dwMicroSecPerFrame
        0, 0,
        0x10,               # AVIF_HASINDEX
        n, 0, 1, frame_size,
        WIDTH, HEIGHT,
    ) + b"\x00" * 16        # dwReserved[4]

    strh = struct.pack(
        "<4sI4s4sIHHIIIIIIII4H",
        b"strh", 56,
        b"vids", b"DIB ",
        0, 0, 0, 0,
        1, FPS,             # dwScale, dwRate: fps = rate/scale
        0, n, frame_size, 0, 0,
        0, 0, WIDTH, HEIGHT,
    )
    strf = struct.pack(
        "<4sIIiiHHIIiiII",
        b"strf", 40,
        40, WIDTH, HEIGHT,  # biHeight > 0: bottom-up
        1, 24, 0,           # planes, bpp, BI_RGB
        frame_size, 0, 0, 0, 0,
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl

    movi_chunks = b""
    offsets = []
    for data in frames:
        offsets.append(4 + len(movi_chunks))  # relative to 'movi' fourcc
        movi_chunks += b"00db" + struct.pack("<I", len(data)) + data
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_chunks)) + b"movi" + movi_chunks

    idx_entries = b"".join(
        struct.pack("<4sIII", b"00db", 0x10, off, frame_size) for off in offsets
    )
    idx1 = b"idx1" + struct.pack("<I", len(idx_entries)) + idx_entries

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
