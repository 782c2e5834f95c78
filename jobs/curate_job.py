#!/usr/bin/env python3
"""Cluster entry point: the corpus-curation funnel, packaged for
spark-submit (same artifact discipline as extract_job).

    python -m zipfile -c ocr_suite_spark.zip ocr_suite_spark
    spark-submit --py-files ocr_suite_spark.zip jobs/curate_job.py \
        --input <testdata sf dir> --output <curated tables dir> \
        [--decon-min-shared 3] [--max-top-tok 0.12] [--max-dup-bigram 0.08]

Runs dedup → decontamination → quality → mixture → packing and prints a
one-line JSON funnel summary (counts per stage).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="testdata sf dir (documents.parquet inside)")
    p.add_argument("--output", required=True)
    p.add_argument("--decon-min-shared", type=int, default=None)
    p.add_argument("--max-top-tok", type=float, default=None)
    p.add_argument("--max-dup-bigram", type=float, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from ocr_suite_spark import curate as C

    spark = SparkSession.builder.appName("ocs-curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    kwargs = {}
    if args.decon_min_shared is not None:
        kwargs["decon_min_shared"] = args.decon_min_shared
    if args.max_top_tok is not None:
        kwargs["max_top_tok"] = args.max_top_tok
    if args.max_dup_bigram is not None:
        kwargs["max_dup_bigram"] = args.max_dup_bigram

    t0 = time.time()
    _, _, stages = C.curate(spark, args.input, out_dir=args.output, **kwargs)
    print(json.dumps({**stages, "wall_sec": round(time.time() - t0, 2), "output": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
