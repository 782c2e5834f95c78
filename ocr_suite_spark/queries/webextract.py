"""Main-content extraction over markup — the north rule's named text
side (HTML boilerplate strip + DOM heuristics), as pure Column exprs.

The testdata corpus carries plain text, so the markup is SYNTHESIZED
deterministically inside the query from the documents table (nav header,
a link-farm block on every 3rd doc, the document text as the content
block, a footer) — both engines construct byte-identical HTML from the
same rows, so the oracle grades the EXTRACTION, not the synthesis. With
a real crawl the synthesis disappears and the same pipeline runs on the
stored HTML column.

The heuristic is the public boilerpipe/Readability family's core signal:
split the DOM into blocks, score each by text length minus a link-density
penalty, keep the argmax block. Tags are stripped AFTER scoring (link
counts need them). No UDFs — regexp split/replace stay JVM-side and
whole-stage-codegen'd; the only window partitions per document over a
handful of block rows.

Reference tie-in: this is the text-span analog of the media path's
preprocess→recognize→keep pipeline (the reference's boilerplate strip is
the trim/min-len normalizer, util.h:13-26; DOM scoring generalizes it to
structured markup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t

# link-density penalty: chars of clean text one anchor tag must "pay for"
LINK_PENALTY = 40

_BLOCK_SPLIT = "</nav>|</div>|</footer>"
_TAG = "<[^>]*>"
_WS = "[ \t\n\r\f\x0b]+"  # explicit ASCII class — RE2's \s excludes \x0b


def _html_col() -> F.Column:
    """Deterministic synthetic markup from (doc_id, source, text)."""
    return F.concat(
        F.lit('<html><body><nav><a>home</a> <a>about</a> <a>'),
        F.col("source"),
        F.lit("</a></nav>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("<div><a>buy</a> <a>now</a> <a>deal</a> sale</div>"),
        ).otherwise(F.lit("")),
        F.lit("<div><p>"),
        F.col("text"),
        F.lit("</p></div><footer><a>contact</a> legal terms</footer></body></html>"),
    )


def html_main_content(spark: SparkSession, sf: str) -> DataFrame:
    """Per document: the extracted main-content text, its block score, and
    the boilerplate stats (block count, total anchors).

    Scale: one posexplode (≤ blocks-per-page rows per doc), a per-document
    window over those few rows, one aggregation — everything keyed on
    doc_id, no corpus-sized window, no UDF, no extra shuffle beyond the
    doc_id hash the explode's downstream aggs share.
    """
    docs = t(spark, sf, "documents").select(
        F.col("doc_id"), _html_col().alias("html")
    )
    blocks = docs.select(
        "doc_id", F.posexplode(F.split("html", _BLOCK_SPLIT)).alias("pos", "blk")
    )
    clean = F.trim(
        F.regexp_replace(F.regexp_replace(F.col("blk"), _TAG, " "), _WS, " ")
    )
    n_links = (F.size(F.split(F.col("blk"), "<a>")) - 1).cast("long")
    scored = blocks.select(
        "doc_id",
        "pos",
        clean.alias("clean"),
        n_links.alias("n_links"),
        (F.length(clean) - LINK_PENALTY * n_links).cast("long").alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("pos"))
    winners = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("clean").alias("main_text"), F.col("score").alias("main_score"))
    )
    stats = scored.groupBy("doc_id").agg(
        F.sum(F.when(F.col("clean") != "", 1).otherwise(0)).cast("long").alias("n_blocks"),
        F.sum("n_links").cast("long").alias("n_links_total"),
    )
    return winners.join(stats, "doc_id")


HTML_MAIN_SQL = f"""
WITH html AS (
  SELECT doc_id,
    '<html><body><nav><a>home</a> <a>about</a> <a>' || source || '</a></nav>' ||
    (CASE WHEN doc_id % 3 = 0 THEN '<div><a>buy</a> <a>now</a> <a>deal</a> sale</div>' ELSE '' END) ||
    '<div><p>' || text || '</p></div><footer><a>contact</a> legal terms</footer></body></html>' AS html
  FROM documents
),
blocks AS (
  SELECT doc_id,
         generate_subscripts(string_split_regex(html, '{_BLOCK_SPLIT}'), 1) - 1 AS pos,
         unnest(string_split_regex(html, '{_BLOCK_SPLIT}')) AS blk
  FROM html
),
scored AS (
  SELECT doc_id, pos,
    trim(regexp_replace(regexp_replace(blk, '{_TAG}', ' ', 'g'), '{_WS}', ' ', 'g')) AS clean,
    CAST(len(string_split(blk, '<a>')) - 1 AS BIGINT) AS n_links,
    CAST(length(trim(regexp_replace(regexp_replace(blk, '{_TAG}', ' ', 'g'), '{_WS}', ' ', 'g')))
         - {LINK_PENALTY} * (len(string_split(blk, '<a>')) - 1) AS BIGINT) AS score
  FROM blocks
),
winners AS (
  SELECT doc_id, clean AS main_text, score AS main_score
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, pos) AS rn FROM scored)
  WHERE rn = 1
),
stats AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN clean != '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blocks,
         CAST(SUM(n_links) AS BIGINT) AS n_links_total
  FROM scored GROUP BY doc_id
)
SELECT w.doc_id, w.main_text, w.main_score, s.n_blocks, s.n_links_total
FROM winners w JOIN stats s ON w.doc_id = s.doc_id
"""


QUERIES = {
    "html_main_content": (html_main_content, HTML_MAIN_SQL),
}
