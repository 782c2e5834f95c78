"""Extraction-domain queries (the flagship pipeline and its views).

These run the OCR UDF, so DuckDB cannot recompute them — instead each is
graded against a committed GOLDEN fixture (see common.golden_sql): the
expected sf0.01 output, generated once by `python tests/gen_goldens.py`
and re-read by DuckDB at driver time. The deeper correctness gate stays
tests/test_extract.py: exact span-sequence equality against the pandas
oracle that shares the kernels (reference semantics: word ordering +
trim/min-3, /root/reference src/recognition/provider/tesseract.cpp:95-117).

`extract_merged` is registered as a hashable projection — the nested
`spans: array<struct<...>>` API stays on operators.extract.extract() (and
__spark_entry__.entry()), but the driver's canonicalizer cannot hash
Python lists, so the graded output serializes each ordered span sequence
with to_json. Same information, stable field order, hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import datagen
from ..operators import extract as X
from .common import golden_sql


def extract_merged(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship: per-doc (kind, text, media_ref, order) sequences,
    serialized to JSON per document for driver hashing."""
    merged = X.extract(datagen.materialized_corpus(spark, sf))
    return merged.select("doc_id", F.to_json("spans").alias("spans_json"))


def extract_flat(spark: SparkSession, sf: str) -> DataFrame:
    """Flat extracted spans (the text_instances analog)."""
    return X.extract_flat(datagen.materialized_corpus(spark, sf))


def extract_media_words(spark: SparkSession, sf: str) -> DataFrame:
    """Word-level OCR output with bboxes + confidence (ocr_result entries)."""
    return X.extract_words(datagen.materialized_corpus(spark, sf))


MIN_QUERY_LEN = 3  # reference search guard: /root/reference src/viewer/search.cpp:169-172


def like_search(flat: DataFrame, pattern: str) -> DataFrame:
    """The viewer's LIKE search over extracted media spans, with the
    reference's minimum-query-length guard (search.cpp:169-172): queries
    shorter than 3 chars (excluding a trailing %) are rejected before any
    scan is scheduled — at 10^12 docs a 1-char LIKE is a full-corpus
    regex, so the guard is a scale defense, not just UX."""
    effective = pattern[:-1] if pattern.endswith("%") else pattern
    if len(effective) < MIN_QUERY_LEN:
        raise ValueError(
            f"search query {effective!r} shorter than {MIN_QUERY_LEN} chars "
            "(reference guard, search.cpp:169-172)"
        )
    words = flat.where(F.col("kind") == "media").select(
        "doc_id", "order", F.explode(F.split("text", " ")).alias("word")
    )
    return (
        words.where(F.col("word").like(pattern))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"), F.min("order").alias("first_order"))
    )


def extract_like_search(spark: SparkSession, sf: str) -> DataFrame:
    """The LIKE search applied to pipeline output (J1 over extraction):
    which documents contain 'alpha%' words in recognized media text."""
    flat = X.extract_flat(datagen.materialized_corpus(spark, sf))
    return like_search(flat, "alpha%")


# Golden-backed: oracle valid at sf0.01 only (driver correctness SF);
# regenerate fixtures with tests/gen_goldens.py after kernel/datagen changes.
QUERIES = {
    "extract_merged": (extract_merged, golden_sql("extract_merged")),
    "extract_flat": (extract_flat, golden_sql("extract_flat")),
    "extract_media_words": (extract_media_words, golden_sql("extract_media_words")),
    "extract_like_search": (extract_like_search, golden_sql("extract_like_search")),
}

# names whose oracle is a sf0.01-pinned golden fixture (tests use this to
# route them to the sf0.01 parity check instead of the sf0.001 one)
GOLDEN_QUERIES = set(QUERIES)
