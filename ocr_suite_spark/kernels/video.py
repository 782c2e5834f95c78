"""Synthetic video: encode / decode / meta — the video leg of the
multimodal layer (images: render.py, audio: audio.py).

OCSVID1 is a trivial private multi-frame container: magic + u16 frame
count + per-frame length-prefixed OCSIMG1 payloads — the closest local
analog of the reference's demux → per-frame decode loop
(/root/reference src/ffmpeg/decoder.cpp:313-335: pull a packet, decode a
frame, hand the pixel buffer downstream). A real MP4/H.264 demuxer+codec
would slot in behind ``decode_video`` at the clearly-marked seam below
(video codec libs are absent from this environment; the Spark-side
plumbing — binary column, Arrow batches, chained mapInPandas, per-frame
explode — is identical).

The frame pixels are chosen deliberately, like audio's square wave:
frame ``f`` of a clip is a CONSTANT-gray image whose value, dimensions
and frame count all derive from md5(doc_id) hex digits. A constant frame
makes mean == min == max == gray exactly and the pixel sum an integer
product, so a DuckDB oracle predicts the decoder's per-frame output
ANALYTICALLY (md5-hex digit arithmetic + generate_series, no bytes) —
a green driver row value-gates the whole binary round trip including
every pixel byte (any corrupt byte moves pixel_sum).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .render import MAGIC as IMG_MAGIC
from .render import decode_image, encode_image

VIDEO_MAGIC = b"OCSVID1\x00"
FPS = 10  # fixed frame rate: ts_ms = frame_idx * 100
_MIN_FRAMES, _FRAME_SPAN = 2, 4  # 2-5 frames per clip
_MIN_DIM, _DIM_SPAN = 16, 48  # frame edge 16-63 px
_MIN_GRAY, _GRAY_SPAN = 10, 200
_GRAY_STEP = 7  # per-frame gray increment (mod 256)


def video_params(doc_id: int) -> tuple[int, int, int, int]:
    """(n_frames, width, height, base_gray) from md5(doc_id) hex digits
    [8:16) — disjoint from the digits audio_params consumes, so one doc
    can carry both legs. The SQL oracle mirrors this digit-for-digit."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    n_frames = _MIN_FRAMES + int(h[8:10], 16) % _FRAME_SPAN
    width = _MIN_DIM + int(h[10:12], 16) % _DIM_SPAN
    height = _MIN_DIM + int(h[12:14], 16) % _DIM_SPAN
    base_gray = _MIN_GRAY + int(h[14:16], 16) % _GRAY_SPAN
    return n_frames, width, height, base_gray


def frame_gray(base_gray: int, frame_idx: int) -> int:
    return (base_gray + _GRAY_STEP * frame_idx) % 256


def render_video(doc_id: int) -> list[np.ndarray]:
    """Deterministic clip: n_frames constant-gray uint8 frames."""
    n, w, h, base = video_params(doc_id)
    return [
        np.full((h, w), frame_gray(base, f), dtype=np.uint8) for f in range(n)
    ]


def encode_video(frames: list[np.ndarray]) -> bytes:
    """frames -> OCSVID1 bytes: magic + u16 count + per-frame u32
    length-prefixed OCSIMG1 payloads."""
    assert frames and all(f.dtype == np.uint8 and f.ndim == 2 for f in frames)
    parts = [VIDEO_MAGIC, struct.pack("<H", len(frames))]
    for f in frames:
        payload = encode_image(f)
        parts.append(struct.pack("<I", len(payload)))
        parts.append(payload)
    return b"".join(parts)


def decode_video(data: bytes) -> list[np.ndarray]:
    """bytes -> decoded frames, in stream order.

    Only the private OCSVID1 container is implemented; a real demuxer +
    codec would decode at this exact seam."""
    if not data.startswith(VIDEO_MAGIC):
        # STUB: real-codec decode requires video libs absent from this
        # environment. Bytes are opaque until this point.
        raise NotImplementedError("only OCSVID1 synthetic container supported")
    (n_frames,) = struct.unpack_from("<H", data, len(VIDEO_MAGIC))
    frames = []
    pos = len(VIDEO_MAGIC) + 2
    for _ in range(n_frames):
        (plen,) = struct.unpack_from("<I", data, pos)
        pos += 4
        payload = data[pos : pos + plen]
        assert payload.startswith(IMG_MAGIC), "corrupt frame payload"
        frames.append(decode_image(payload))
        pos += plen
    assert pos == len(data), "trailing bytes after last frame"
    return frames


def resolve_video(doc_id: int) -> bytes:
    """doc_id -> encoded clip (the 'fetch + demux' stand-in)."""
    return encode_video(render_video(doc_id))
