"""Table-format seam: parquet semantics the pipeline relies on (idempotent
dynamic partition overwrite, append) + the iceberg branch's fail-fast."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from ocr_suite_spark import tableio


def test_dynamic_partition_overwrite_is_idempotent_per_bucket(spark):
    """Rewriting one bucket must replace exactly that bucket — the resume
    primitive (reference is_frame_processed idempotence, database.cpp:122-133)."""
    d = tempfile.mkdtemp(prefix="ocs-tio-") + "/t"
    v1 = spark.createDataFrame([(0, "a"), (0, "b"), (1, "c")], "bucket int, v string")
    tableio.write_table(v1, d, mode="overwrite", partition_by=["bucket"])
    # rewrite bucket 0 only, with different content
    v2 = spark.createDataFrame([(0, "a2")], "bucket int, v string")
    tableio.write_table(v2, d, mode="overwrite", partition_by=["bucket"])
    got = {(r["bucket"], r["v"]) for r in tableio.read_table(spark, d).collect()}
    assert got == {(0, "a2"), (1, "c")}  # bucket 1 untouched, bucket 0 replaced


def test_append_accumulates(spark):
    d = tempfile.mkdtemp(prefix="ocs-tio-") + "/t"
    df = spark.range(3).select(F.col("id"))
    tableio.write_table(df, d, mode="overwrite")
    tableio.append_table(df, d)
    assert tableio.read_table(spark, d).count() == 6


def test_iceberg_branch_fails_fast_without_catalog(spark):
    df = spark.range(1)
    with pytest.raises(NotImplementedError, match="spark.sql.catalog"):
        tableio.write_table(df, "/tmp/nope", fmt="iceberg")
    with pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
        tableio.read_table(spark, "/tmp/nope", fmt="iceberg")


def test_iceberg_ident_unique_per_path():
    """Distinct directories must map to distinct Iceberg identifiers —
    run1/out and run2/out colliding onto one table would let two runs
    silently overwrite each other (ADVICE r2)."""
    a = tableio._ident("/data/run1/out")
    b = tableio._ident("/data/run2/out")
    assert a != b
    # bare table names pass through to the catalog untouched
    assert tableio._ident("progress") == f"{tableio.ICEBERG_CATALOG}.progress"
    # idents are valid dotted identifiers (sanitized, no stray chars)
    import re

    assert re.fullmatch(r"[A-Za-z0-9_.]+", a), a


def test_iceberg_ident_injective_under_sanitization():
    """Sanitizing alone collapses run-1 / run_1 / run.1 — the hash suffix
    must keep distinct raw paths on distinct tables."""
    idents = {
        tableio._ident(p)
        for p in ("/data/run-1/out", "/data/run_1/out", "/data/run.1/out")
    }
    assert len(idents) == 3, idents
