"""Deterministic sampling operators — training-data pipeline layer.

A 100 TB training-data pipeline samples constantly (eval holdouts, per-
language rebalancing, debug slices). The non-negotiable at scale is
DETERMINISM: `df.sample()` is seed-and-partitioning dependent, so the
same logical sample cannot be reproduced across runs, cluster sizes or
engines. These operators key every decision on a content hash instead —
a doc is in or out of the sample regardless of partitioning, executor
count or engine, and the sample is stable across reruns (the same
property datagen and the progress buckets rely on).

Engine parity trick: thresholds compare md5-hex PREFIXES as strings
(fixed-length hex ⇒ lexicographic order == numeric order), because Spark
and DuckDB share md5 but no integer hash. '1a' < threshold over 2 hex
chars gives k/256 fractions — granular enough for rate control and
bit-exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import DUCK_TOKENS, floor3, t


def _hash_key(doc_id: Column) -> Column:
    """2-hex-char sampling key in [00, ff], uniform, partition-independent."""
    return F.substring(F.md5(doc_id.cast("string")), 1, 2)


# SQL twin of _hash_key
_DUCK_KEY = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)"

SAMPLE_THRESHOLD = "1a"  # 26/256 ≈ 10.2% corpus sample


def sample_hash_fraction(spark: SparkSession, sf: str) -> DataFrame:
    """~10% deterministic corpus sample: membership is a pure function of
    doc_id — reproducible across runs, partitionings and engines. One
    narrow filter, no shuffle; the predicate is NOT pushable to the scan
    (md5 of a column), which is fine — it's cheap and row-local."""
    docs = t(spark, sf, "documents")
    return docs.where(_hash_key(F.col("doc_id")) < SAMPLE_THRESHOLD).select(
        "doc_id", "lang", "n_chars"
    )


SAMPLE_HASH_SQL = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {_DUCK_KEY} < '{SAMPLE_THRESHOLD}'
"""

# per-language target rates (hex-256ths): rebalance a multilingual corpus
# by downsampling the dominant language — the canonical pretraining-mix op
STRATA = {"en": "80"}  # en: 128/256 = 50%
STRATA_DEFAULT = "e0"  # others: 224/256 = 87.5%


def sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language deterministic rates: en 50%, others 87.5%. Same
    hash-threshold membership, threshold chosen per stratum — still one
    narrow row-local filter, no shuffle, no per-group state."""
    docs = t(spark, sf, "documents")
    thr = F.when(F.col("lang") == "en", F.lit(STRATA["en"])).otherwise(
        F.lit(STRATA_DEFAULT)
    )
    return docs.where(_hash_key(F.col("doc_id")) < thr).select(
        "doc_id", "lang", "source"
    )


SAMPLE_STRAT_SQL = f"""
SELECT doc_id, lang, source FROM documents
WHERE {_DUCK_KEY} < (CASE WHEN lang = 'en' THEN '{STRATA["en"]}' ELSE '{STRATA_DEFAULT}' END)
"""


def nchars_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language size quantiles (p50/p90 of n_chars) — the profiling
    aggregate a sampling policy is tuned against. Exact `percentile`
    (linear interpolation, same formula as DuckDB's quantile_cont); at
    10^12 rows you'd flip to percentile_approx and drop the oracle to a
    tolerance check — the exact form is kept because the driver gate is
    bit-exact."""
    docs = t(spark, sf, "documents")
    f3 = lambda c: F.floor(c * 1000) / 1000
    return docs.groupBy("lang").agg(
        f3(F.percentile("n_chars", F.lit(0.5))).alias("p50_chars"),
        f3(F.percentile("n_chars", F.lit(0.9))).alias("p90_chars"),
        F.count("*").alias("n_docs"),
    )


NCHARS_QUANTILES_SQL = """
SELECT lang,
       FLOOR(quantile_cont(n_chars, 0.5) * 1000) / 1000 AS p50_chars,
       FLOOR(quantile_cont(n_chars, 0.9) * 1000) / 1000 AS p90_chars,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
"""


# target mixture weights per source for sample_mixture (unlisted -> 1.0)
MIX_WEIGHTS = {"src0": 3.0, "src1": 2.0}
_HASH_SCALE = 4294967296.0  # 2^32: first 8 md5 hex chars as a uniform u32


def sample_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Source-mixture sampling: downsample each source so the output hits
    target proportions MIX_WEIGHTS without upsampling — the data-mixing
    step of a pretraining pipeline (e.g. 3:2:1:… source ratios).

    λ = min_s(n_s / w_s) is the largest feasible scale; source s keeps
    rate_s = λ·w_s / n_s of its docs. Membership is the same
    partition-independent hash trick as the other sampling ops, but with a
    DYNAMIC per-source rate: the first 8 md5 hex chars (a uniform u32 as a
    hex string) compared against lpad(hex(floor(rate·2^32))) — pure string
    comparison, bit-identical across engines, no df.sample() anywhere.

    Scale: one count aggregation per source, a 1-row λ broadcast, a
    source-keyed broadcast join of the tiny rates relation (bounded by the
    number of sources), then a row-local filter over the streaming corpus.
    """
    docs = t(spark, sf, "documents")
    w_col = F.lit(1.0)
    for src, w in MIX_WEIGHTS.items():
        w_col = F.when(F.col("source") == src, F.lit(w)).otherwise(w_col)
    counts = (
        docs.groupBy("source").agg(F.count("*").alias("n_s")).withColumn("w_s", w_col)
    )
    lam = counts.agg(F.min(F.col("n_s") / F.col("w_s")).alias("lam"))
    rates = counts.crossJoin(F.broadcast(lam)).select(
        "source", (F.col("lam") * F.col("w_s") / F.col("n_s")).alias("rate")
    )
    hash8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    thr = F.lpad(
        F.lower(F.hex(F.floor(F.col("rate") * F.lit(_HASH_SCALE)))), 8, "0"
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .where((F.col("rate") >= 1.0) | (hash8 < thr))
        .select("doc_id", "source", "lang")
    )


_DUCK_W = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {w}" for s, w in MIX_WEIGHTS.items()
) + " ELSE 1.0 END"

SAMPLE_MIXTURE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_s, {_DUCK_W} AS w_s
  FROM documents GROUP BY source
),
lam AS (SELECT MIN(n_s / w_s) AS lam FROM counts),
rates AS (SELECT source, (lam.lam * w_s / n_s) AS rate FROM counts, lam)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN rates r ON d.source = r.source
WHERE r.rate >= 1.0 OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
      < lpad(lower(hex(CAST(FLOOR(r.rate * {_HASH_SCALE}) AS BIGINT))), 8, '0')
"""


SHUFFLE_EPOCH = 1  # varying the epoch re-derives a fresh permutation


def epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic epoch shuffle: assign every document a reproducible
    (shard, position) for training-order randomization WITHOUT
    `orderBy(rand())` (seed-and-partitioning dependent, irreproducible
    across runs/engines/cluster sizes). The permutation is a pure
    function of (epoch, doc_id): sort key = md5('epoch<N>|' + doc_id),
    shard = its first hex char, position = rank within shard.

    Scale: the only window partitions per shard (n/16 rows here; at
    10^12 docs widen the shard prefix — 4 hex chars = 65536 shards —
    and the same construction holds; a training loader consumes shards
    independently anyway, so a global position is never needed).
    """
    from pyspark.sql import Window as W

    docs = t(spark, sf, "documents")
    key = F.md5(
        F.concat(F.lit(f"epoch{SHUFFLE_EPOCH}|"), F.col("doc_id").cast("string"))
    )
    sel = docs.select("doc_id", key.alias("key")).withColumn(
        "shard", F.substring("key", 1, 1)
    )
    w = W.partitionBy("shard").orderBy("key", "doc_id")
    return sel.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    ).select("doc_id", "shard", "pos")


EPOCH_SHUFFLE_SQL = f"""
WITH k AS (
  SELECT doc_id, md5('epoch{SHUFFLE_EPOCH}|' || CAST(doc_id AS VARCHAR)) AS key
  FROM documents
)
SELECT doc_id, substr(key, 1, 1) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY substr(key, 1, 1)
                               ORDER BY key, doc_id) - 1 AS BIGINT) AS pos
FROM k
"""


def source_divergence(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source total-variation distance from the corpus token
    distribution — the mixture diagnostic that tells you which sources
    are distributionally unusual before weighting them
    (TVD = 0.5·Σ_t |p_s(t) − q(t)|; chosen over KL because it needs no
    log, so it is exactly computable cross-engine).

    Tokens absent from a source still contribute their corpus mass q(t);
    rather than outer-joining the vocabulary per source, that tail is
    folded in algebraically: TVD = 0.5·(Σ_{t∈S}|p−q| + 1 − Σ_{t∈S} q).

    Per the repo's float convention, the per-token |p−q| terms are
    summed as DECIMAL(38,18) (exact, order-independent — a naive double
    SUM differs between engines' fold orders) and converted to double
    once at the end, then floor3'd.

    Scale: two token aggregations (per-source+token, per-token) and one
    equi-join on the token — vocabulary-sized relations, never all-pairs.
    """
    docs = t(spark, sf, "documents")
    from .common import tokens_col

    tok = docs.select("source", F.explode(tokens_col(F.col("text"))).alias("tok"))
    st = tok.groupBy("source", "tok").agg(F.count("*").alias("c_st"))
    n_s = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    ct = tok.groupBy("tok").agg(F.count("*").alias("c_t"))
    n = tok.count()  # scalar total (one job; a literal in the expression)
    j = st.join(n_s, "source").join(ct, "tok")
    p = F.col("c_st") / F.col("n_s")
    q = F.col("c_t") / F.lit(float(n))
    agg = j.groupBy("source").agg(
        F.sum(F.abs(p - q).cast("decimal(38,18)")).cast("double").alias("sum_abs"),
        F.sum(q.cast("decimal(38,18)")).cast("double").alias("sum_q"),
    )
    return agg.select(
        "source",
        floor3((F.col("sum_abs") + 1.0 - F.col("sum_q")) * 0.5).alias("tvd3"),
    )


SOURCE_DIVERGENCE_SQL = f"""
WITH tok AS (
  SELECT source, unnest({DUCK_TOKENS}) AS tok FROM documents
),
st AS (SELECT source, tok, COUNT(*) AS c_st FROM tok GROUP BY source, tok),
ns AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY source),
ct AS (SELECT tok, COUNT(*) AS c_t FROM tok GROUP BY tok),
n AS (SELECT COUNT(*) AS n FROM tok)
SELECT st.source,
       FLOOR((CAST(SUM(CAST(ABS(st.c_st / ns.n_s - ct.c_t / CAST(n.n AS DOUBLE)) AS DECIMAL(38,18))) AS DOUBLE)
              + 1.0
              - CAST(SUM(CAST(ct.c_t / CAST(n.n AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)) * 0.5 * 1000) / 1000
       AS tvd3
FROM st JOIN ns ON st.source = ns.source JOIN ct ON st.tok = ct.tok, n
GROUP BY st.source
"""


# ---------------------------------------------------------------------------
# Corpus stats via ROLLUP — the job-summary analytics every curation run
# ends with: per-(source, lang) doc/token/char totals PLUS per-source
# subtotals PLUS the grand total, in ONE aggregation pass (Spark expands
# the grouping sets inside the same shuffle — three scans collapsed into
# one map-side-combined agg). Rollup null-markers are coalesced to a
# sentinel so the graded relation is hash-stable across engines.

ROLLUP_ALL = "<all>"


def corpus_stats_rollup(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    from .common import tokens_col

    base = docs.select(
        "source",
        "lang",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tok"),
        F.col("n_chars").cast("long").alias("nc"),
    )
    return (
        base.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("nc").cast("long").alias("n_chars"),
        )
        .select(
            F.coalesce("source", F.lit(ROLLUP_ALL)).alias("source"),
            F.coalesce("lang", F.lit(ROLLUP_ALL)).alias("lang"),
            "n_docs",
            "n_tokens",
            "n_chars",
        )
    )


CORPUS_ROLLUP_SQL = f"""
SELECT COALESCE(source, '{ROLLUP_ALL}') AS source,
       COALESCE(lang, '{ROLLUP_ALL}') AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len({DUCK_TOKENS})) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM documents
GROUP BY ROLLUP(source, lang)
"""


# ---------------------------------------------------------------------------
# Snapshot diff (CDC over corpus versions) — incremental curation's first
# step: given two corpus snapshots, emit what was added / removed /
# modified, so downstream stages reprocess only the delta. The classic
# shape: FULL OUTER join on the key comparing a content hash — one
# co-partitioned shuffle join at any corpus size (at 10^12 docs both
# sides bucket on doc_id and the join is exchange-free; Iceberg snapshot
# diffs read the manifest delta instead, same output contract). The "v2"
# snapshot is synthesized deterministically in-query (the pii_scrub
# convention): ~1/16 of docs deleted, ~1/4 of survivors text-revised,
# ~1/16 spawn a brand-new doc id — both engines derive the identical v2.
# New ids are NEGATED (-(doc_id+1)): corpus doc_ids are non-negative, so
# synthetic ids can never collide with a survivor at ANY corpus size
# (ADVICE r4: the old +10M offset collided once real ids passed 10M).


def corpus_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").select("doc_id", "text")
    h = F.md5(F.concat(F.lit("v2:"), F.col("doc_id").cast("string")))
    survivors = docs.where(F.substring(h, 1, 1) >= "1")
    modified_text = F.when(
        F.substring(h, 2, 1) < "4", F.concat(F.col("text"), F.lit(" rev2"))
    ).otherwise(F.col("text"))
    v2_core = survivors.select("doc_id", modified_text.alias("text"))
    v2_new = docs.where(F.substring(h, 3, 1) == "0").select(
        (-(F.col("doc_id") + 1)).alias("doc_id"),
        F.concat(F.lit("new "), F.col("text")).alias("text"),
    )
    v2 = v2_core.unionByName(v2_new)
    a = docs.select("doc_id", F.md5("text").alias("h1"))
    b = v2.select("doc_id", F.md5("text").alias("h2"))
    j = a.join(b, "doc_id", "full_outer")
    change = (
        F.when(F.col("h1").isNull(), "added")
        .when(F.col("h2").isNull(), "removed")
        .when(F.col("h1") != F.col("h2"), "modified")
    )
    return (
        j.select(F.col("doc_id").cast("long").alias("doc_id"), change.alias("change"))
        .where(F.col("change").isNotNull())
    )


SNAPSHOT_DIFF_SQL = f"""
WITH h AS (
  SELECT doc_id, text, md5('v2:' || CAST(doc_id AS VARCHAR)) AS hh
  FROM documents
),
v2 AS (
  SELECT doc_id,
         CASE WHEN substr(hh, 2, 1) < '4' THEN text || ' rev2' ELSE text END AS text
  FROM h WHERE substr(hh, 1, 1) >= '1'
  UNION ALL
  SELECT -(doc_id + 1), 'new ' || text FROM h WHERE substr(hh, 3, 1) = '0'
),
a AS (SELECT doc_id, md5(text) AS h1 FROM documents),
b AS (SELECT doc_id, md5(text) AS h2 FROM v2)
SELECT CAST(COALESCE(a.doc_id, b.doc_id) AS BIGINT) AS doc_id,
       CASE WHEN a.h1 IS NULL THEN 'added'
            WHEN b.h2 IS NULL THEN 'removed'
            WHEN a.h1 <> b.h2 THEN 'modified' END AS change
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE (CASE WHEN a.h1 IS NULL THEN 'added'
            WHEN b.h2 IS NULL THEN 'removed'
            WHEN a.h1 <> b.h2 THEN 'modified' END) IS NOT NULL
"""


QUERIES = {
    "corpus_stats_rollup": (corpus_stats_rollup, CORPUS_ROLLUP_SQL),
    "corpus_snapshot_diff": (corpus_snapshot_diff, SNAPSHOT_DIFF_SQL),
    "sample_hash_fraction": (sample_hash_fraction, SAMPLE_HASH_SQL),
    "sample_stratified": (sample_stratified, SAMPLE_STRAT_SQL),
    "nchars_quantiles": (nchars_quantiles, NCHARS_QUANTILES_SQL),
    "sample_mixture": (sample_mixture, SAMPLE_MIXTURE_SQL),
    "epoch_shuffle": (epoch_shuffle, EPOCH_SHUFFLE_SQL),
    "source_divergence": (source_divergence, SOURCE_DIVERGENCE_SQL),
}
