"""Synthetic audio: encode / decode / meta — the audio leg of the
multimodal layer (images: render.py).

Same convention as the OCSIMG1 image container: `audio_ref` fully encodes
the content (`aud://v1/<doc_id>` → a deterministic square wave whose
sample count and amplitude derive from md5(doc_id)), so payloads are
synthesized on the fly, the byte container is a trivial private format
(magic + u32 sample rate + raw little-endian i16 PCM), and a real
WAV/FLAC/Opus decoder would slot in behind ``decode_audio`` at the
clearly-marked seam below (audio codec libs are absent from this
environment; the Spark-side plumbing — binary column, Arrow batches, UDF
signature — is identical).

The square waveform is chosen deliberately: every sample is ±amplitude,
so RMS == amplitude and peak == amplitude EXACTLY (sqrt(a²) is exact in
float64 for integer a < 2²⁶), and duration is integer arithmetic — which
lets a DuckDB oracle predict the decoder's output analytically without
touching bytes, value-gating the full binary round trip.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

AUDIO_MAGIC = b"OCSAUD1\x00"
SAMPLE_RATE = 16_000
_MIN_SAMPLES, _SAMPLE_SPAN = 8_000, 8_000  # 0.5-1.0 s clips
_MIN_AMP, _AMP_SPAN = 1_000, 20_000
_PERIOD = 64  # samples per square-wave period


def audio_params(doc_id: int) -> tuple[int, int]:
    """(n_samples, amplitude) from md5(doc_id) — the derivation the SQL
    oracle mirrors digit-for-digit (hex prefixes as integers)."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    n_samples = _MIN_SAMPLES + int(h[:4], 16) % _SAMPLE_SPAN
    amp = _MIN_AMP + int(h[4:8], 16) % _AMP_SPAN
    return n_samples, amp


def render_audio(doc_id: int) -> np.ndarray:
    """Deterministic square wave, i16 samples."""
    n, amp = audio_params(doc_id)
    t = np.arange(n)
    wave = np.where((t // (_PERIOD // 2)) % 2 == 0, amp, -amp)
    return wave.astype(np.int16)


def encode_audio(samples: np.ndarray, rate: int = SAMPLE_RATE) -> bytes:
    assert samples.dtype == np.int16 and samples.ndim == 1
    return AUDIO_MAGIC + struct.pack("<I", rate) + samples.astype("<i2").tobytes()


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    """bytes -> (sample_rate, i16 samples).

    Only the private OCSAUD1 container is implemented; real codecs would
    decode at this exact seam."""
    if not data.startswith(AUDIO_MAGIC):
        # STUB: real-codec decode requires audio libs absent from this
        # environment. Bytes are opaque until this point.
        raise NotImplementedError("only OCSAUD1 synthetic container supported")
    (rate,) = struct.unpack_from("<I", data, len(AUDIO_MAGIC))
    samples = np.frombuffer(data, dtype="<i2", offset=len(AUDIO_MAGIC) + 4)
    return rate, samples


def resolve_audio(doc_id: int) -> bytes:
    """doc_id -> encoded payload (the 'fetch + demux' stand-in)."""
    return encode_audio(render_audio(doc_id))
