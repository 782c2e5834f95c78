"""Synthetic media: render / encode / decode.

`media_ref` fully encodes the media content, e.g.

    img://v1/fast_merge_scan?skew=4&noise=17

so media bytes never need to live in the documents table — the resolver
renders them deterministically (grayscale canvas, glyph text, rotation by
`skew` degrees, seeded pixel noise). This mirrors the reference, where a
frame's OCR output is a pure function of the decoded pixel buffer
(/root/reference src/ffmpeg/decoder.cpp:213-244 produces the buffer;
tesseract.cpp consumes it).

The byte container is a trivial private format (magic + u16 h/w + raw
grayscale). Real PNG/JPEG/video-frame decode would slot in behind
``decode_image`` — see the NotImplementedError branch (codec libs are not
available in this environment; the Spark-side plumbing is identical).
"""

from __future__ import annotations

import re
import struct

import numpy as np

from .font import GLYPH_H, GLYPH_W, GLYPHS

MAGIC = b"OCSIMG1\x00"
SCALE = 3  # glyph upscaling factor (2 is too coarse to survive skew round-trips)
CHAR_GAP = 2 * SCALE  # px between chars
WORD_GAP = 8 * SCALE  # px between words (must exceed char gap for segmentation)
INK = 30  # foreground gray level
PAPER = 220  # background gray level
NOISE_AMP = 15  # +/- uniform noise on background

# Discrete skew set shared by renderer and deskew search (degrees).
SKEW_SET = (-8, -6, -4, -2, 0, 2, 4, 6, 8)

_REF_RE = re.compile(r"^img://v1/([a-z_]+)\?skew=(-?\d+)&noise=(\d+)$")


def make_media_ref(words: list[str], skew: int, noise: int) -> str:
    assert all(re.fullmatch(r"[a-z]+", w) for w in words), words
    assert skew in SKEW_SET, skew
    return f"img://v1/{'_'.join(words)}?skew={skew}&noise={noise}"


def parse_media_ref(ref: str) -> tuple[list[str], int, int]:
    m = _REF_RE.match(ref)
    if not m:
        raise ValueError(f"unrecognized media_ref: {ref!r}")
    return m.group(1).split("_"), int(m.group(2)), int(m.group(3))


def rotate_nn(img: np.ndarray, deg: float, fill: int | float = PAPER) -> np.ndarray:
    """Nearest-neighbor rotation about the image center (same output size).

    Inverse-mapped and fully vectorized; deterministic across platforms.
    """
    if deg == 0:
        return img.copy()
    h, w = img.shape
    theta = np.deg2rad(deg)
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # inverse rotation: source coords for each dest pixel
    xs = cos_t * (xx - cx) + sin_t * (yy - cy) + cx
    ys = -sin_t * (xx - cx) + cos_t * (yy - cy) + cy
    xi = np.rint(xs).astype(np.int64)
    yi = np.rint(ys).astype(np.int64)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.full((h, w), fill, dtype=img.dtype)
    out[valid] = img[yi[valid], xi[valid]]
    return out


def rotate_bilinear(img: np.ndarray, deg: float, fill: float) -> np.ndarray:
    """Bilinear rotation about the center (same output size), float output.

    Used on the *deskew* side: bilinear resampling smooths the staircase
    artifacts that nearest-neighbor forward rotation introduced, so glyph
    shapes survive the rotate/unrotate round trip.
    """
    if deg == 0:
        return img.astype(np.float64)
    h, w = img.shape
    theta = np.deg2rad(deg)
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xs = cos_t * (xx - cx) + sin_t * (yy - cy) + cx
    ys = -sin_t * (xx - cx) + cos_t * (yy - cy) + cy
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = xs - x0
    fy = ys - y0
    imgf = img.astype(np.float64)

    def sample(yi: np.ndarray, xi: np.ndarray) -> np.ndarray:
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        out = np.full(yi.shape, float(fill))
        out[valid] = imgf[yi[valid], xi[valid]]
        return out

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _draw_words(words: list[str]) -> np.ndarray:
    """Render words on one text line as a boolean ink mask (no margins)."""
    char_w = GLYPH_W * SCALE
    char_h = GLYPH_H * SCALE
    widths = [len(w) * char_w + (len(w) - 1) * CHAR_GAP for w in words]
    total_w = sum(widths) + WORD_GAP * (len(words) - 1)
    mask = np.zeros((char_h, total_w), dtype=bool)
    x = 0
    for w, wd in zip(words, widths):
        cx = x
        for ch in w:
            g = np.kron(GLYPHS[ch], np.ones((SCALE, SCALE), dtype=bool))
            mask[:, cx : cx + char_w] |= g
            cx += char_w + CHAR_GAP
        x += wd + WORD_GAP
    return mask


def render_image(words: list[str], skew: int, noise: int) -> np.ndarray:
    """Deterministic grayscale uint8 image containing `words`, rotated by
    `skew` degrees, with seeded background noise."""
    ink = _draw_words(words)
    h, w = ink.shape
    # Margins sized so rotation never clips ink: displacement <= r * tan(|deg|).
    max_t = np.tan(np.deg2rad(max(abs(s) for s in SKEW_SET)))
    pad_y = int(np.ceil(w / 2 * max_t)) + 4
    pad_x = int(np.ceil(h / 2 * max_t)) + 4
    canvas = np.full((h + 2 * pad_y, w + 2 * pad_x), PAPER, dtype=np.uint8)
    canvas[pad_y : pad_y + h, pad_x : pad_x + w][ink] = INK
    canvas = rotate_nn(canvas, skew, fill=PAPER)
    rng = np.random.RandomState(noise % (2**31))  # legacy RandomState: frozen algorithm
    jitter = rng.randint(-NOISE_AMP, NOISE_AMP + 1, size=canvas.shape)
    noisy = canvas.astype(np.int32)
    noisy[canvas == PAPER] += jitter[canvas == PAPER]
    return np.clip(noisy, 0, 255).astype(np.uint8)


def encode_image(img: np.ndarray) -> bytes:
    h, w = img.shape
    return MAGIC + struct.pack("<HH", h, w) + img.tobytes()


def decode_image(data: bytes) -> np.ndarray:
    """Decode media bytes to a grayscale array.

    Only the private OCSIMG1 container is implemented here; PNG/JPEG/video
    frames would be decoded by a codec library at this exact seam.
    """
    if not data.startswith(MAGIC):
        # STUB: real-codec decode requires image/video libs absent from this
        # environment. The pipeline treats bytes as opaque until this point.
        raise NotImplementedError("only OCSIMG1 synthetic container supported")
    h, w = struct.unpack_from("<HH", data, len(MAGIC))
    arr = np.frombuffer(data, dtype=np.uint8, offset=len(MAGIC) + 4)
    return arr.reshape(h, w)


def resolve_media(ref: str) -> bytes:
    """media_ref -> encoded bytes (the 'fetch + demux' stand-in)."""
    words, skew, noise = parse_media_ref(ref)
    return encode_image(render_image(words, skew, noise))
