"""Source/sink coverage: S5 binary-file scan, S13/S15 JSON round-trip, and
physical-plan audits (pushdown + broadcast evidence — SURVEY.md §4)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ocr_suite_spark.kernels import render
from ocr_suite_spark.kernels.ocr import Recognizer


def test_s5_binaryfile_scan_roundtrip(spark):
    """S5 still-image scan (ocr-cli.cpp:93-115): write encoded synthetic
    images as files, scan with binaryFile, decode + recognize in a UDF-free
    driver check (the mapInPandas path shares the same kernels)."""
    d = tempfile.mkdtemp(prefix="ocs-bin-")
    cases = {
        "a.img": ["alpha", "bravo"],
        "b.img": ["charlie"],
        "c.img": ["delta", "echo", "golf"],
    }
    for name, words in cases.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(render.encode_image(render.render_image(words, 4, 7)))
    df = spark.read.format("binaryFile").load(d)
    rows = df.select(F.element_at(F.split("path", "/"), -1).alias("name"), "content").collect()
    eng = Recognizer()
    got = {
        r["name"]: [w.text for w in eng.recognize(render.decode_image(bytes(r["content"])))]
        for r in rows
    }
    assert got == cases


def test_s13_s15_json_roundtrip(spark, sf_dir):
    """JSON sink then source with explicit schema + defaulted confidence
    (print_json ocr-cli.cpp:131-162; load_json ocr-results-viewer.cpp:167-207)."""
    src = spark.createDataFrame(
        [("d1", "alpha", 98.5), ("d2", "bravo", None)],
        "doc_id string, word string, confidence double",
    )
    js = src.select(F.to_json(F.struct("doc_id", "word", "confidence")).alias("j"))
    parsed = js.select(
        F.from_json(
            "j", "doc_id string, word string, confidence double"
        ).alias("s")
    ).select(
        "s.doc_id",
        "s.word",
        F.coalesce(F.col("s.confidence"), F.lit(100.0)).alias("confidence"),
    )
    rows = {r["doc_id"]: (r["word"], r["confidence"]) for r in parsed.collect()}
    assert rows == {"d1": ("alpha", 98.5), "d2": ("bravo", 100.0)}  # default, viewer:167-207


def test_s12_debug_bitmap_sink(spark, sf_dir):
    """S12 (bmp.cpp:52-87): the debug sink writes REAL 8bpp BMPs — valid
    header fields, bottom-up padded scanlines — whose pixels equal the
    requested stage output, one file per media span, written executor-side."""
    import numpy as np

    from ocr_suite_spark import datagen
    from ocr_suite_spark.debug_sink import write_debug_bitmaps
    from ocr_suite_spark.kernels.ocr import binarize
    from ocr_suite_spark.operators.extract import explode_media_meta

    docs = datagen.interleaved_from_documents(spark, sf_dir).limit(8)
    media = explode_media_meta(docs)
    refs = {(r["doc_id"], r["offset"]): r["media_ref"] for r in media.collect()}
    d = tempfile.mkdtemp(prefix="ocs-bmp-")
    write_debug_bitmaps(media, d, stage="binarized")
    files = sorted(os.listdir(d))
    assert len(files) == len(refs) and all(f.endswith(".bmp") for f in files)
    # spot-check: header magic + roundtrip equals the binarized stage
    name = files[0]
    doc_id, offset = name.split("_")[0], int(name.split("_")[1])
    data = open(os.path.join(d, name), "rb").read()
    assert data[:2] == b"BM"
    img = render.decode_image(render.resolve_media(refs[(doc_id, offset)]))
    want = np.where(binarize(img), 0, 255).astype(np.uint8)
    got = render.decode_bmp(data)
    assert np.array_equal(got, want)


def test_plan_filter_pushdown_to_parquet(spark, sf_dir):
    """P-filters must reach the scan: PushedFilters in the parquet node."""
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_shipdate") <= "1998-09-02")
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: scan schema holds only the needed columns
    assert "l_comment" not in plan


def test_plan_dictionary_join_is_broadcast(spark, sf_dir):
    """J1: the dictionary side must go broadcast, not sort-merge."""
    from ocr_suite_spark.queries.relational import j1_dict_like_join

    plan = j1_dict_like_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_plan_ocr_filter_upstream_of_udf(spark, sf_dir):
    """The kind=='media' route filter must sit below (executed before) the
    Python UDF node — Catalyst can't push through mapInPandas, so the plan
    author has to (SURVEY.md §4)."""
    from ocr_suite_spark import datagen
    from ocr_suite_spark.operators import extract as X

    docs = datagen.interleaved_from_documents(spark, sf_dir)
    flat = X.extract_flat(docs)
    plan = flat._jdf.queryExecution().executedPlan().toString()
    udf_pos = plan.find("MapInPandas")
    assert udf_pos > 0
    # the media-kind filter appears in the subtree below the UDF
    assert "kind#" in plan[udf_pos:] or "= media" in plan[udf_pos:]


def test_text_path_is_jvm_side(spark, sf_dir):
    """The normalizer is pure Column expressions — JVM-side, never Python.

    (Higher-order functions like filter(..., lambda) are CodegenFallback in
    Spark — interpreted but still JVM-side — so the assertion is 'no Python
    eval nodes', not 'inside WholeStageCodegen'.)"""
    from ocr_suite_spark.operators.extract import normalize_text_col

    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(normalize_text_col(F.col("text")).alias("t"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    # column pruning held: only `text` is read
    assert "ReadSchema: struct<text:string>" in plan


def test_plan_w1_topk_is_take_ordered(spark, sf_dir):
    """W1: the global top-100 must plan as TakeOrderedAndProject (distributed
    per-partition top-k + k-row merge), and the rank window must sit ABOVE
    the limit so it only ever sees 100 rows — never a full-table single-task
    global window (the r1 anti-pattern)."""
    from ocr_suite_spark.queries.relational import w1_global_sort

    plan = w1_global_sort(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    take_pos = plan.find("TakeOrderedAndProject")
    win_pos = plan.find("Window")
    assert take_pos > 0, plan
    # executed plans print top-down: the Window node appears before (above)
    # the TakeOrderedAndProject feeding it
    assert 0 < win_pos < take_pos, plan


def test_plan_pack_sequences_no_per_source_window(spark):
    """pack_sequences' prefix sum must be the two-pass distributed form:
    every window ordering per-doc rows (ORDER BY doc_id) must also
    partition by `chunk` — a window partitioned by source alone over the
    full corpus is the single-task-per-source funnel the r2 verdict flagged.
    (The one source-only window allowed is the chunk-level cumulative, which
    orders by `chunk`, not doc_id, and runs over n/PACK_CHUNK rows.)"""
    import re

    from ocr_suite_spark.queries.curation import pack_sequences

    sf = "/root/testdata/sf0.001"
    plan = pack_sequences(spark, sf)._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        if "doc_id" in spec:  # the per-doc prefix window
            assert "chunk" in spec, f"per-doc window not chunk-partitioned: {spec}"


def test_plan_html_main_content_jvm_side(spark):
    """The DOM-heuristic extraction is pure Column exprs: no Python eval
    nodes anywhere in its plan, and the only window partitions per doc."""
    import re

    from ocr_suite_spark.queries.webextract import html_main_content

    plan = (
        html_main_content(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "doc_id" in spec  # every window is per-document


def test_plan_ann_broadcasts_query_side(spark):
    """ANN joins must build (broadcast) the tiny QUERY side, never the
    corpus: BuildLeft with queries on the left is the only shape that
    survives a 10^12-vector corpus."""
    from ocr_suite_spark.queries.similarity import ann_lsh_topk, ann_topk_bruteforce

    sf = "/root/testdata/sf0.001"
    p1 = ann_topk_bruteforce(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin BuildLeft" in p1
    p2 = ann_lsh_topk(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p2 and "BuildLeft" in p2
