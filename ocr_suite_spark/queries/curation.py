"""Corpus-curation operators: eval-set decontamination and sequence
packing — the two pipeline stages that sit between dedup and training.

Both are pure relational formulations (no UDFs) with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t
from .dedup import shingle_rows
from .sampling import _DUCK_KEY, _hash_key

# deterministic held-out eval slice: same hash-membership trick as the
# sampling operators ('08' = 8/256 ≈ 3%; 29 docs at sf0.01)
EVAL_THRESHOLD = "08"

# DuckDB twin of the distinct-shingle relation (reuses dedup's shingles)
from .dedup import DUCK_SHINGLES  # noqa: E402


def decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Eval-set decontamination: training documents sharing any 3-token
    shingle with the held-out eval slice, with the overlap size — the list
    a curation run drops before training (n-gram decontamination à la
    GPT-3/C4, public methodology).

    Scale: the eval side is tiny by construction, so its distinct shingle
    set is the build side of a broadcast-able equi-join (an inverted index
    keyed by shingle) — the training corpus streams past it once; at
    10^12 docs you'd compile the eval shingles into a broadcast Bloom
    filter and keep the same one-pass shape. Never all-pairs.
    """
    docs = t(spark, sf, "documents")
    is_eval = _hash_key(F.col("doc_id")) < EVAL_THRESHOLD
    # split BEFORE shingling: the eval slice (~3%) is shingled alone —
    # never shingle-the-corpus-then-filter (which would also make the two
    # sides share a subplan Spark would compute twice)
    eval_sh = (
        shingle_rows(docs.where(is_eval)).select("sh").distinct()
    )
    train_sh = shingle_rows(docs.where(~is_eval)).select("doc_id", "sh").distinct()
    return (
        train_sh.join(eval_sh, "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_shingles"))
    )


DECONTAMINATE_SQL = f"""
WITH eval_sh AS (
  SELECT DISTINCT sh FROM (
    SELECT unnest(list_distinct({DUCK_SHINGLES})) AS sh
    FROM documents WHERE {_DUCK_KEY} < '{EVAL_THRESHOLD}'
  )
),
train_sh AS (
  SELECT doc_id, unnest(list_distinct({DUCK_SHINGLES})) AS sh
  FROM documents WHERE NOT ({_DUCK_KEY} < '{EVAL_THRESHOLD}')
)
SELECT doc_id, COUNT(*) AS n_shared_shingles
FROM train_sh WHERE sh IN (SELECT sh FROM eval_sh)
GROUP BY doc_id
"""

PACK_CAP = 4096  # chars per packed sequence (stand-in for the token budget)


def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy sequence packing: concatenate documents (per source, in
    deterministic doc_id order) into ~PACK_CAP-char bins — the pretraining
    packing step that turns ragged documents into fixed-budget training
    sequences. bin = floor(exclusive_prefix_sum / CAP): a doc starts in
    the bin its running offset falls in (docs may straddle a boundary —
    the standard greedy approximation).

    Scale note: the window partitions by source; with few giant sources
    that is a per-source funnel, so at 10^12 docs you'd compute the
    prefix sum in two passes (range-partition by (source, doc_id),
    per-partition sums, broadcast the per-partition offsets, add) — same
    bin assignment, fully distributed. The per-source window is kept here
    for oracle bit-parity; the two-pass variant changes no output.
    """
    docs = t(spark, sf, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    prev = F.coalesce(
        F.sum("n_chars").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
    )
    assigned = docs.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.floor(prev / PACK_CAP).cast("long").alias("bin_id"),
    )
    return assigned.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.min("doc_id").alias("first_doc"),
    )


PACK_SQL = f"""
WITH a AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(FLOOR(COALESCE(SUM(n_chars) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {PACK_CAP})
           AS BIGINT) AS bin_id
  FROM documents
)
SELECT source, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars, MIN(doc_id) AS first_doc
FROM a GROUP BY source, bin_id
"""


QUERIES = {
    "decontaminate": (decontaminate, DECONTAMINATE_SQL),
    "pack_sequences": (pack_sequences, PACK_SQL),
}
