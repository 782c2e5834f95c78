"""Resume semantics: a killed run resumes without recomputing finished
buckets and without duplicating output (SURVEY.md §5 item 3)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ocr_suite_spark import datagen
from ocr_suite_spark.progress import ProgressStore, extract_resumable


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="ocs-progress-")
    yield f"{d}/out", f"{d}/ckpt"
    shutil.rmtree(d, ignore_errors=True)


def _sequences(df):
    rows = df.collect()
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        for r in rows
    }


def test_full_run_then_noop_resume(spark, sf_dir, tmpdirs):
    out_dir, ckpt_dir = tmpdirs
    docs = datagen.interleaved_from_documents(spark, sf_dir).limit(120).cache()
    res1 = extract_resumable(spark, docs, out_dir, ckpt_dir, n_buckets=8)
    seq1 = _sequences(res1)
    assert len(seq1) == 120

    store = ProgressStore(spark, ckpt_dir)
    n_done = store.done_buckets("run-1").count()
    assert n_done == 8

    # second run: everything done -> no new progress rows, identical output
    res2 = extract_resumable(spark, docs, out_dir, ckpt_dir, n_buckets=8)
    assert _sequences(res2) == seq1
    assert store.read().where(F.col("status") == "done").count() == n_done


def test_resume_after_simulated_kill(spark, sf_dir, tmpdirs):
    out_dir, ckpt_dir = tmpdirs
    docs = datagen.interleaved_from_documents(spark, sf_dir).limit(120).cache()
    full = extract_resumable(spark, docs, out_dir, f"{ckpt_dir}-ref", n_buckets=8)
    want = _sequences(full)

    # simulate a mid-run kill: run fully, then surgically mark half the
    # buckets as never-completed (drop their progress rows AND their output)
    extract_resumable(spark, docs, out_dir + "-b", ckpt_dir, n_buckets=8)
    store = ProgressStore(spark, ckpt_dir)
    kept = store.read().where(F.col("bucket") < 4)
    tmp = ckpt_dir + "/progress-tmp"
    kept.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(store.path)
    for b in range(4, 8):
        shutil.rmtree(f"{out_dir}-b/bucket={b}", ignore_errors=True)

    assert store.done_buckets("run-1").count() == 4

    res = extract_resumable(spark, docs, out_dir + "-b", ckpt_dir, n_buckets=8)
    assert _sequences(res) == want
    # finished buckets were NOT recomputed: still exactly one progress row each
    per_bucket = (
        store.read()
        .where(F.col("status") == "done")
        .groupBy("bucket")
        .count()
        .collect()
    )
    counts = {r["bucket"]: r["count"] for r in per_bucket}
    assert all(v == 1 for v in counts.values()), counts
    assert set(counts) == set(range(8))


def test_lineage_fingerprint_recorded(spark, sf_dir, tmpdirs):
    out_dir, ckpt_dir = tmpdirs
    docs = datagen.interleaved_from_documents(spark, sf_dir).limit(50)
    extract_resumable(spark, docs, out_dir, ckpt_dir, n_buckets=4)
    rows = ProgressStore(spark, ckpt_dir).read().collect()
    assert all(r["lineage"] is not None for r in rows)
    assert all(r["n_docs"] > 0 and r["docs_per_sec"] > 0 for r in rows)
    assert all(r["max_offset"] is not None for r in rows)
    # per-stage split (speed_meter analog) recorded from worker accumulators
    assert sum(r["ocr_s"] for r in rows) > 0
    assert sum(r["decode_s"] for r in rows) > 0
