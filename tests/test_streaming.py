"""Streaming semantics: incremental file-source extraction with checkpointed
resume (watcher analog, SURVEY.md S8/T1/T2) and the windowed rate meter."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ocr_suite_spark import datagen
from ocr_suite_spark.operators import extract as X
from ocr_suite_spark.streaming.incremental import (
    stream_extract_available_now,
    stream_rate_meter,
)


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="ocs-stream-")
    yield f"{d}/in", f"{d}/out", f"{d}/ckpt"
    shutil.rmtree(d, ignore_errors=True)


def _sequences(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        for r in df.collect()
    }


def test_incremental_extraction_resumes_without_recompute(spark, sf_dir, dirs):
    in_dir, out_dir, ckpt = dirs
    docs = datagen.interleaved_from_documents(spark, sf_dir).limit(80).cache()
    part1 = docs.where(F.xxhash64("doc_id") % 2 == 0)
    part2 = docs.where(F.xxhash64("doc_id") % 2 != 0)

    # drop part 1, stream it ("still-recording file appears")
    part1.write.mode("overwrite").parquet(f"{in_dir}/p1")
    stream_extract_available_now(spark, in_dir + "/*", out_dir, ckpt)
    got1 = _sequences(spark.read.parquet(out_dir))
    assert set(got1) == {r["doc_id"] for r in part1.collect()}

    # drop part 2, re-run the same checkpointed query: only NEW files process
    part2.write.mode("overwrite").parquet(f"{in_dir}/p2")
    stream_extract_available_now(spark, in_dir + "/*", out_dir, ckpt)
    got_all = _sequences(spark.read.parquet(out_dir))
    assert len(got_all) == 80  # no duplicates from part 1

    # equality with the one-shot batch pipeline
    want = _sequences(X.extract(docs))
    assert got_all == want

    # third run with nothing new: output unchanged
    stream_extract_available_now(spark, in_dir + "/*", out_dir, ckpt)
    assert len(_sequences(spark.read.parquet(out_dir))) == 80


def test_stream_dedup_exact_drops_rearrivals(spark, dirs):
    """Streaming exact dedup: identical content re-arriving within the
    watermark window is dropped (one survivor per content hash), across
    micro-batches and source files; distinct content all survives."""
    import datetime as dt

    from ocr_suite_spark.streaming.incremental import stream_dedup_exact

    in_dir, _, ckpt = dirs
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows1 = [
        ("a", "alpha bravo", t0),
        ("b", "charlie delta", t0 + dt.timedelta(seconds=10)),
        ("a2", "alpha bravo", t0 + dt.timedelta(seconds=20)),  # dup of a
    ]
    rows2 = [
        ("c", "echo foxtrot", t0 + dt.timedelta(seconds=30)),
        ("b2", "charlie delta", t0 + dt.timedelta(seconds=40)),  # dup of b
        ("d", "golf hotel", t0 + dt.timedelta(seconds=50)),
    ]
    schema = "doc_id string, text string, ts timestamp"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(in_dir)

    out = stream_dedup_exact(spark, in_dir, ckpt).collect()
    by_text = {}
    for r in out:
        by_text.setdefault(r["text"], []).append(r["doc_id"])
    assert set(by_text) == {"alpha bravo", "charlie delta", "echo foxtrot", "golf hotel"}
    assert all(len(v) == 1 for v in by_text.values()), by_text


def test_rate_meter_windows(spark, sf_dir):
    out = stream_rate_meter(spark, f"{sf_dir}/events.parquet")
    rows = out.collect()
    assert rows
    total = sum(r["n"] for r in rows)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events  # windowed counts partition the stream


def test_stateful_watermark_accumulates_across_restarts(spark, dirs):
    """applyInPandasWithState per-doc watermark: state survives the
    checkpoint across two AvailableNow drains (reference
    last_processed_frame semantics, database.cpp:110-150)."""
    import os

    from ocr_suite_spark.streaming.stateful import stream_doc_watermarks

    in_dir, _out, ckpt = dirs
    os.makedirs(in_dir, exist_ok=True)
    rows1 = [("d1", 0), ("d1", 4), ("d2", 2)]
    rows2 = [("d1", 6), ("d2", 1), ("d3", 10)]
    spark.createDataFrame(rows1, "doc_id string, offset int").write.mode("append").parquet(in_dir)

    first = {
        r["doc_id"]: (r["max_offset"], r["n_spans"])
        for r in stream_doc_watermarks(spark, in_dir, ckpt).collect()
    }
    assert first == {"d1": (4, 2), "d2": (2, 1)}

    spark.createDataFrame(rows2, "doc_id string, offset int").write.mode("append").parquet(in_dir)
    second = {
        r["doc_id"]: (r["max_offset"], r["n_spans"])
        for r in stream_doc_watermarks(spark, in_dir, ckpt).collect()
    }
    # d2's new offset (1) is BELOW its watermark: max stays 2 (monotone
    # guard), count still advances; d1 climbs; d3 appears fresh
    assert second["d1"] == (6, 3)
    assert second["d2"] == (2, 2)
    assert second["d3"] == (10, 1)


def test_stream_sessionize_matches_batch_closed_sessions(spark, dirs):
    """Streaming session_window vs the batch sessionize_gap oracle: every
    emitted (closed) session must match a batch session exactly on
    (user_id, start, end, n_events), and the only batch sessions NOT
    emitted are ones the final watermark could not close — each user's
    trailing session, plus any whose close point (end + gap) lies past
    max(ts) - delay."""
    from ocr_suite_spark.queries.temporal import SESSION_GAP_US, sessionize_gap
    from ocr_suite_spark.streaming.incremental import stream_sessionize

    _, _, ckpt = dirs
    sf = "/root/testdata/sf0.001"
    got = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in stream_sessionize(spark, f"{sf}/events.parquet", ckpt).collect()
    }
    batch = sessionize_gap(spark, sf).collect()
    want_all = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"]) for r in batch
    }
    assert got <= want_all, got - want_all
    max_us = max(r["end_us"] for r in batch)
    delay_us = 60 * 1_000_000  # the 1-minute default watermark
    closeable = {
        k for k in want_all if k[2] + SESSION_GAP_US < max_us - delay_us
    }
    # append mode must have emitted every closeable session
    assert closeable <= got, closeable - got
    assert len(got) > 0


def test_stream_quality_gopher_matches_batch(spark, tmp_path):
    """The stateless ingest-path quality gate must grade every document
    identically to the batch quality_gopher_rules operator (explode+agg
    vs row-local array exprs — same integer sums, same floors)."""
    from ocr_suite_spark.queries.curation import quality_gopher_rules
    from ocr_suite_spark.streaming.incremental import stream_quality_gopher

    sf = "/root/testdata/sf0.001"
    src_dir = str(tmp_path / "docs_in")
    spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    ).write.parquet(src_dir)

    got = {
        (r["doc_id"], r["n_words"], r["mean_word_len"], r["alpha_frac"],
         r["n_stop"], bool(r["keep"]))
        for r in stream_quality_gopher(
            spark, src_dir, str(tmp_path / "ckpt")
        ).collect()
    }
    want = {
        (r["doc_id"], r["n_words"], r["mean_word_len"], r["alpha_frac"],
         r["n_stop"], bool(r["keep"]))
        for r in quality_gopher_rules(spark, sf).collect()
    }
    assert got == want
