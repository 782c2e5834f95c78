"""Remaining SURVEY §2 scalar/projection/lookup operators (P6-P10, J4, A8)
as oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

# ---------------------------------------------------------------------------
# P6 — sentence->word split preserving order (vision_kit.swift:43-55
# enumerateSubstrings byWords; posexplode keeps the order authoritative)


def p6_word_split_pos(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split("text", r"\s+"), lambda x: F.length(x) >= 1)
        ).alias("pos", "word"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "word")


P6_SQL = r"""
SELECT doc_id,
       CAST(unnest(range(len(toks))) AS BIGINT) AS pos,
       unnest(toks) AS word
FROM (SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f\x0b]+'), x -> length(x) >= 1) AS toks FROM documents)
"""

# ---------------------------------------------------------------------------
# P7 — coordinate normalization: clamp 0..1, flip bottom-left origin, scale
# to pixels (vision_kit.swift:7-18, 70-91)


def p7_coord_normalize(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    width, height = 1920, 1080
    # synthetic unit-rect from event value (the shape of the computation is
    # what's under test: clamp -> flip -> scale)
    x = F.least(F.greatest(F.col("value") / 1000.0, F.lit(0.0)), F.lit(1.0))
    y = F.least(F.greatest(F.col("value") / 500.0 - 0.1, F.lit(0.0)), F.lit(1.0))
    h = F.lit(0.05)
    flipped = F.lit(1.0) - y - h  # bottom-left -> top-left origin
    return ev.select(
        "event_id",
        F.floor(x * width).cast("long").alias("px_left"),
        F.floor(flipped * height).cast("long").alias("px_top"),
    )


P7_SQL = """
SELECT event_id,
       CAST(FLOOR(least(greatest(value / 1000.0, 0.0), 1.0) * 1920) AS BIGINT) AS px_left,
       CAST(FLOOR((1.0 - least(greatest(value / 500.0 - 0.1, 0.0), 1.0) - 0.05) * 1080) AS BIGINT) AS px_top
FROM events
"""

# ---------------------------------------------------------------------------
# P8 — confidence scaling + 2-decimal floor-truncation (vision_kit.swift:90
# x100; ocr-cli.cpp:132-135 floor to 2dp)


def p8_confidence_scale(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    conf = F.col("value") / 1000.0 * 100.0
    return ev.select(
        "event_id",
        (F.floor(conf * 100) / 100).alias("conf2"),
    )


P8_SQL = """
SELECT event_id, FLOOR(value / 1000.0 * 100.0 * 100) / 100 AS conf2
FROM events
"""

# ---------------------------------------------------------------------------
# P10 — filename -> start-time parse ("%Y-%m-%d %H-%M-%S",
# results.cpp:129-150): build the basename from ts, parse it back


def p10_filename_ts(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    name = F.concat(F.lit("video "), F.date_format("ts", "yyyy-MM-dd HH-mm-ss"))
    parsed = F.to_timestamp(
        F.regexp_extract(name, r"video (.+)$", 1), "yyyy-MM-dd HH-mm-ss"
    )
    return ev.select(
        "event_id",
        name.alias("video_file"),
        F.unix_timestamp(parsed).alias("start_epoch_s"),
    )


P10_SQL = """
SELECT event_id,
       'video ' || strftime(ts, '%Y-%m-%d %H-%M-%S') AS video_file,
       CAST(FLOOR(epoch(strptime(regexp_extract('video ' || strftime(ts, '%Y-%m-%d %H-%M-%S'), 'video (.+)$', 1), '%Y-%m-%d %H-%M-%S'))) AS BIGINT) AS start_epoch_s
FROM events
"""

# ---------------------------------------------------------------------------
# J4 — point lookup / frame re-fetch (frame_view.cpp:22-37): predicate-pushed
# single-row select


def j4_point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    return docs.where(F.col("doc_id") == 42).select("doc_id", "lang", "source", "n_chars")


J4_SQL = "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42"

# ---------------------------------------------------------------------------
# A8 — progress % by remaining bytes (search.h:80-85: 100 - 100*remaining/total)


def a8_progress_pct(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    done = F.sum(F.when(F.col("lang") == "en", F.col("n_chars")).otherwise(F.lit(0)))
    total = F.sum("n_chars")
    return docs.select(F.lit(1).alias("_g"), "lang", "n_chars").groupBy().agg(
        F.floor(F.lit(100.0) - F.lit(100.0) * (total - done) / total).cast("long").alias("pct_done")
    )


A8_SQL = """
SELECT CAST(FLOOR(100.0 - 100.0 * (SUM(n_chars) - SUM(CASE WHEN lang = 'en' THEN n_chars ELSE 0 END)) / SUM(n_chars)) AS BIGINT) AS pct_done
FROM documents
"""


QUERIES = {
    "p6_word_split_pos": (p6_word_split_pos, P6_SQL),
    "p7_coord_normalize": (p7_coord_normalize, P7_SQL),
    "p8_confidence_scale": (p8_confidence_scale, P8_SQL),
    "p10_filename_ts": (p10_filename_ts, P10_SQL),
    "j4_point_lookup": (j4_point_lookup, J4_SQL),
    "a8_progress_pct": (a8_progress_pct, A8_SQL),
}
