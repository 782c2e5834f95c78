#!/usr/bin/env python3
"""Regenerate the committed golden fixtures for UDF-backed queries.

For each name in queries.GOLDEN_QUERIES, runs the registered Spark query at
sf0.01 and writes its exact output to tests/fixtures/golden/<name>.parquet
(single file, via pandas/pyarrow so dtypes — int32/float32 — survive
byte-identically into what DuckDB's read_parquet returns). The driver then
grades Spark-at-sf0.01 against these via `SELECT * FROM read_parquet(...)`.

Safety rails:
- asserts the derived corpus matches the committed interleaved fixture
  (tests/fixtures/interleaved_sf0.01.parquet) content-exactly first, so a
  datagen drift can never silently bake wrong goldens;
- prints a row count + content hash per golden for the commit message.

Run after any change to datagen or the kernels:

    python tests/gen_goldens.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "interleaved_sf0.01.parquet")


def corpus_identity_check(spark) -> None:
    from pyspark.sql import functions as F

    from ocr_suite_spark import datagen
    from ocr_suite_spark.queries.common import GOLDEN_SF_DIR

    derived = datagen.materialized_corpus(spark, GOLDEN_SF_DIR).select(
        "doc_id", F.to_json("spans").alias("j")
    )
    committed = spark.read.parquet(FIXTURE).select("doc_id", F.to_json("spans").alias("j"))
    extra = derived.exceptAll(committed).count()
    missing = committed.exceptAll(derived).count()
    assert extra == 0 and missing == 0, (
        f"derived corpus != committed fixture (extra={extra} missing={missing}); "
        "datagen drifted — regenerate tests/fixtures/interleaved_sf0.01.parquet "
        "together with the goldens and say so in the commit"
    )


def main() -> None:
    from ocr_suite_spark.queries import GOLDEN_QUERIES, REGISTRY
    from ocr_suite_spark.queries.common import (
        GOLDEN_DIR,
        GOLDEN_DIR_SMALL,
        GOLDEN_SF_DIR,
        GOLDEN_SMALL_SF_DIR,
    )
    from ocr_suite_spark.session import get_spark

    spark = get_spark(cores=16, shuffle_partitions=16, app="gen-goldens")
    # corpus identity is asserted at the driver's grading SF; the sf0.001
    # goldens inherit datagen's purity (same deterministic Column exprs)
    corpus_identity_check(spark)
    for sf_dir, out_dir in ((GOLDEN_SF_DIR, GOLDEN_DIR), (GOLDEN_SMALL_SF_DIR, GOLDEN_DIR_SMALL)):
        os.makedirs(out_dir, exist_ok=True)
        for name in sorted(GOLDEN_QUERIES):
            fn, _ = REGISTRY[name]
            pdf = fn(spark, sf_dir).toPandas()
            path = os.path.join(out_dir, f"{name}.parquet")
            pdf.to_parquet(path, index=False)
            canon = pdf.reindex(sorted(pdf.columns), axis=1).astype(str)
            h = hashlib.md5(
                "\n".join(sorted("\x00".join(r) for r in canon.itertuples(index=False))).encode()
            ).hexdigest()[:12]
            print(f"{sf_dir.rsplit('/', 1)[-1]} {name}: {len(pdf)} rows, hash {h}, {os.path.getsize(path)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
