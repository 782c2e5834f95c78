"""Extraction-domain queries (the flagship pipeline and its views).

These run the OCR UDF, so they are not SQL-expressible — registered without
oracle_sql; the driver records rows-only checks. Their real correctness gate
is tests/test_extract.py: exact span-sequence equality against the pandas
oracle that shares the kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import datagen
from ..operators import extract as X


def extract_merged(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship: per-doc (kind, text, media_ref, order) sequences."""
    return X.extract(datagen.materialized_corpus(spark, sf))


def extract_flat(spark: SparkSession, sf: str) -> DataFrame:
    """Flat extracted spans (the text_instances analog)."""
    return X.extract_flat(datagen.materialized_corpus(spark, sf))


def extract_media_words(spark: SparkSession, sf: str) -> DataFrame:
    """Word-level OCR output with bboxes + confidence (ocr_result entries)."""
    return X.extract_words(datagen.materialized_corpus(spark, sf))


def extract_like_search(spark: SparkSession, sf: str) -> DataFrame:
    """The viewer's LIKE search over extracted spans (J1 on pipeline output):
    which documents contain 'alpha%' words in recognized media text."""
    flat = X.extract_flat(datagen.materialized_corpus(spark, sf))
    words = flat.where(F.col("kind") == "media").select(
        "doc_id", "order", F.explode(F.split("text", " ")).alias("word")
    )
    return (
        words.where(F.col("word").like("alpha%"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"), F.min("order").alias("first_order"))
    )


QUERIES = {
    "extract_merged": (extract_merged, None),
    "extract_flat": (extract_flat, None),
    "extract_media_words": (extract_media_words, None),
    "extract_like_search": (extract_like_search, None),
}
