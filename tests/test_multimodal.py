"""Multimodal binary-column operators: Spark output == Spark-free kernel
oracle, plus the frame-sample relational op vs its DuckDB oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from ocr_suite_spark.kernels import render
from ocr_suite_spark.kernels.ocr import binarize
from ocr_suite_spark.queries import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def meta_rows(spark):
    return {
        (r["doc_id"], r["offset"]): r for r in M.media_decode_meta(spark, SF).collect()
    }


def test_decode_meta_matches_kernels(spark, meta_rows):
    refs = {
        (r["doc_id"], r["offset"]): r["media_ref"]
        for r in M._media_bytes(spark, SF).select("doc_id", "offset", "media_ref").collect()
    }
    assert meta_rows and len(meta_rows) == len(refs)
    for key, ref in list(refs.items())[:50]:
        img = render.decode_image(render.resolve_media(ref))
        r = meta_rows[key]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert r["n_bytes"] == len(render.MAGIC) + 4 + img.size
        assert r["ink_frac"] == round(float(binarize(img).mean()), 4)


def test_resize_halves_dims(spark, meta_rows):
    for r in M.media_resize_meta(spark, SF).collect():
        full = meta_rows[(r["doc_id"], r["offset"])]
        assert r["width"] == full["width"] // 2
        assert r["height"] == full["height"] // 2
        assert r["n_bytes"] == len(render.MAGIC) + 4 + r["width"] * r["height"]


def test_features_shape_and_range(spark):
    rows = M.media_feature_vectors(spark, SF).collect()
    assert rows
    for r in rows[:100]:
        v = np.array(r["feature"])
        assert v.shape == (35,)
        assert 0.0 <= v.min() and v.max() <= 1.0
        assert v.max() > 0.0  # first word cell has ink


def test_frame_sample_vs_duckdb(spark):
    got = {
        (r["doc_id"], r["offset"], r["media_ref"], r["frame_idx"])
        for r in M.media_frame_sample(spark, SF).collect()
    }
    want = {
        tuple(t)
        for t in duckdb.sql(M.MEDIA_FRAME_SAMPLE_SQL).fetchall()
    }
    assert got == want and got


def test_audio_kernel_roundtrip():
    """OCSAUD1 encode/decode roundtrip + the square-wave exactness the
    analytic oracle relies on (rms == peak == amplitude, duration integer)."""
    import numpy as np

    from ocr_suite_spark.kernels import audio

    for doc_id in (0, 7, 12345):
        n, amp = audio.audio_params(doc_id)
        data = audio.resolve_audio(doc_id)
        assert len(data) == 12 + 2 * n
        rate, s = audio.decode_audio(data)
        assert rate == audio.SAMPLE_RATE and s.size == n
        assert int(np.abs(s).max()) == amp
        sq = s.astype(np.int64)
        assert float(np.sqrt(int((sq * sq).sum()) / n)) == float(amp)


def test_audio_decode_rejects_foreign_formats():
    import pytest as _pytest

    from ocr_suite_spark.kernels import audio

    with _pytest.raises(NotImplementedError):
        audio.decode_audio(b"RIFF....WAVEfmt ")


def test_video_kernel_roundtrip():
    """OCSVID1 encode/decode roundtrip + the constant-frame exactness the
    analytic oracle relies on (mean == min == max == gray, integer pixel
    sum, byte count closed-form)."""
    import numpy as np

    from ocr_suite_spark.kernels import video

    for doc_id in (0, 7, 12345, 999999):
        n, w, h, base = video.video_params(doc_id)
        data = video.resolve_video(doc_id)
        assert len(data) == 10 + n * (16 + w * h)
        frames = video.decode_video(data)
        assert len(frames) == n
        for f, fr in enumerate(frames):
            assert fr.shape == (h, w) and fr.dtype == np.uint8
            gv = video.frame_gray(base, f)
            assert int(fr.min()) == int(fr.max()) == gv
            assert int(fr.sum()) == gv * w * h


def test_video_decode_rejects_foreign_formats():
    import pytest as _pytest

    from ocr_suite_spark.kernels import video

    with _pytest.raises(NotImplementedError):
        video.decode_video(b"\x00\x00\x00\x18ftypmp42....")


def test_video_frames_compose_frame_sample(spark):
    """media_video_frames == every 2nd decoded frame per clip, in ts
    order — the stride semantics of frame_sample applied to real decoded
    frames (not the relational span analog)."""
    from ocr_suite_spark.kernels import video
    from ocr_suite_spark.queries.multimodal import media_video_frames

    rows = media_video_frames(spark, "/root/testdata/sf0.001").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), []).append(r)
    some_multi = 0
    for doc_id, rs in list(by_doc.items())[:50]:
        n, _, _, _ = video.video_params(doc_id)
        want_idx = list(range(0, n, 2))
        got = sorted(rs, key=lambda r: r["offset"])
        assert [int(r["frame_idx"]) for r in got] == want_idx
        assert [int(r["offset"]) for r in got] == [i * 100 for i in want_idx]
        some_multi += n > 2
    assert some_multi  # the slice exercises clips with > 2 frames
