"""SURVEY.md §2 relational operators as (Spark plan, DuckDB oracle) pairs.

Each query is the idiomatic-Spark re-expression of a reference operator
(file:line cites are /root/reference); the oracle SQL states identical
semantics for the driver's DuckDB comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import DUCK_TOKENS, t, tokens_col

# ---------------------------------------------------------------------------
# A1/A2 — watermark max + counts (database.cpp:110-120, v2.inl:14-32)


def a1_watermark_max(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.max("doc_id").alias("last_processed"),
            F.count("*").alias("n_docs"),
        )
    )


A1_SQL = """
SELECT source, MAX(doc_id) AS last_processed, COUNT(*) AS n_docs
FROM documents GROUP BY source
"""

# ---------------------------------------------------------------------------
# A3 — existence check / resume anti-join (database.cpp:122-133, main.cpp:144-151)


def a3_resume_antijoin(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    processed = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    return (
        ev.join(processed, "user_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("event_id").alias("max_event_id"))
    )


A3_SQL = """
SELECT user_id, COUNT(*) AS n_events, MAX(event_id) AS max_event_id
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM events p
                  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id)
GROUP BY user_id
"""

# ---------------------------------------------------------------------------
# J1/J2/A4/U1 — dedup dictionary + id mint + LIKE search join
# (database.cpp:190-194 LEFT JOIN ... LIKE; v3.inl:15-20 dictionary)


def j1_dict_like_join(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("value")
    )
    # A4: distinct dictionary; J2: deterministic id mint via dense_rank.
    # The unpartitioned window funnels the distinct vocabulary through one
    # task — acceptable because vocabulary is sublinear in corpus size
    # (the reference's text_entries table is exactly this dictionary); at
    # web scale you'd mint ids with xxhash64(value) or zipWithIndex and
    # give up the dense 1..V numbering (kept here for oracle parity).
    dictionary = (
        toks.select("value")
        .distinct()
        .withColumn("text_entry_id", F.dense_rank().over(W.orderBy("value")).cast("long"))
    )
    # J1: instances JOIN dictionary ... LIKE — dictionary is tiny => broadcast
    return (
        toks.join(F.broadcast(dictionary), "value")
        .where(F.col("value").like("s%"))
        .groupBy("text_entry_id", "value")
        .agg(F.count("*").alias("n_inst"))
    )


J1_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS value FROM documents
), dict AS (
  SELECT value, CAST(dense_rank() OVER (ORDER BY value) AS BIGINT) AS text_entry_id
  FROM (SELECT DISTINCT value FROM toks)
)
SELECT d.text_entry_id, tk.value, COUNT(*) AS n_inst
FROM toks tk JOIN dict d ON tk.value = d.value
WHERE tk.value LIKE 's%'
GROUP BY 1, 2
"""

# J2b — the shipped-path id mint: dictionary ids as 64-bit hash prefixes.
# j1's dense_rank mint funnels the distinct vocabulary through one task
# (kept there for the reference's dense 1..V numbering); THIS is the
# variant you'd ship at 10^12 docs — the id is minted during the distinct
# groupBy itself, embarrassingly parallel, no window anywhere. md5 rather
# than xxhash64 only so DuckDB can mirror the mint bit-exactly; the
# dataflow is identical. Collision odds at 64 bits ~ n^2/2^65 — negligible
# below ~10^9 distinct tokens; widen to the full md5 beyond.


def j2_hash_id_mint(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("value"))
    return (
        toks.groupBy("value")
        .agg(F.count("*").alias("n_inst"))
        .select(
            F.substring(F.md5("value"), 1, 16).alias("text_entry_id"),
            "value",
            "n_inst",
        )
    )


J2_HASH_SQL = f"""
WITH toks AS (SELECT unnest({DUCK_TOKENS}) AS value FROM documents)
SELECT substr(md5(value), 1, 16) AS text_entry_id, value, COUNT(*) AS n_inst
FROM toks GROUP BY value
"""

# ---------------------------------------------------------------------------
# J3 — pairing by derived key (search.cpp:139-143) as join vs per-key totals


def j3_pair_by_key(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    totals = docs.groupBy("source").agg(F.sum("n_chars").alias("total_chars"))
    return docs.join(F.broadcast(totals), "source").select(
        "doc_id", "source", "total_chars"
    )


J3_SQL = """
SELECT d.doc_id, d.source, s.total_chars
FROM documents d
JOIN (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY source) s
  USING (source)
"""

# ---------------------------------------------------------------------------
# A5 — group words->frame preserving order (tesseract.cpp:95-117)


def a5_group_collect_ordered(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    item = F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list(item)), lambda s: s["event_type"]),
            " ",
        ).alias("seq"),
        F.count("*").alias("n_events"),
    )


A5_SQL = """
SELECT user_id,
       string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""

# ---------------------------------------------------------------------------
# A6 — per-group match counts (search_results_view.cpp:63-68)


def a6_match_count(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )


A6_SQL = "SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2"

# ---------------------------------------------------------------------------
# W1 — global sort by timestamp (results.cpp:123-126). Top-K via
# orderBy().limit(k): Spark plans a distributed TakeOrderedAndProject
# (per-partition top-k, then a k-row merge on the driver) — no row ever
# funnels through a single-task global window. The rank column the oracle
# needs is computed AFTER the limit, so its unpartitioned window sees only
# the 100 survivors (plan-audited in tests/test_sources.py).


def w1_global_sort(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    top = ev.select("event_id", "ts").orderBy("ts", "event_id").limit(100)
    rn = F.row_number().over(W.orderBy("ts", "event_id"))
    return top.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        rn.alias("rn"),
    )


W1_SQL = """
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, rn
FROM (SELECT event_id, ts,
             CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT) AS rn
      FROM events)
WHERE rn <= 100
"""

# ---------------------------------------------------------------------------
# W2/P12 — day/hour/minute rollup tree (search_results_view.cpp:74-137)


def w2_time_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.hour("ts").cast("long").alias("hour"),
            F.minute("ts").cast("long").alias("minute"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value")).cast("long")).alias("sum_value_floor"),
        )
    )


W2_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       CAST(EXTRACT(minute FROM ts) AS BIGINT) AS minute,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_value_floor
FROM events GROUP BY 1, 2, 3
"""

# W2b — the viewer's NESTED rollup tree (search_results_view.cpp:74-137
# builds a strictly nested day -> hour -> minute hierarchy, each node
# carrying its subtree count). Built the way the viewer builds it: minute
# leaves first, then collect_list into sorted hour nodes, then into sorted
# day nodes — each level is a map-side-partial shuffle on a strictly
# coarser key, so the tree costs two extra cheap shuffles over the flat
# rollup and the collected arrays are bounded (<=60 minutes/hour,
# <=24 hours/day) regardless of corpus size.
#
# The driver's canonicalizer cannot hash nested arrays, so the GRADED
# output explodes the finished tree back to annotated leaves
# (day, day_n, hour, hour_n, minute, n): every parent total appears on its
# leaves, which pins the nesting numerically while staying hashable. The
# nested DataFrame itself is the public API (w2_tree, below).


def w2_tree(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    m = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("long").alias("hour"),
        F.minute("ts").cast("long").alias("minute"),
    ).agg(F.count("*").alias("n"))
    h = m.groupBy("day", "hour").agg(
        F.sort_array(F.collect_list(F.struct("minute", "n"))).alias("minutes"),
        F.sum("n").alias("hour_n"),
    )
    return h.groupBy("day").agg(
        F.sort_array(F.collect_list(F.struct("hour", "hour_n", "minutes"))).alias("hours"),
        F.sum("hour_n").alias("day_n"),
    )


def w2_tree_rollup(spark: SparkSession, sf: str) -> DataFrame:
    tree = w2_tree(spark, sf)
    return (
        tree.select("day", "day_n", F.explode("hours").alias("h"))
        .select(
            "day",
            "day_n",
            F.col("h.hour").alias("hour"),
            F.col("h.hour_n").alias("hour_n"),
            F.explode("h.minutes").alias("m"),
        )
        .select(
            "day", "day_n", "hour", "hour_n",
            F.col("m.minute").alias("minute"), F.col("m.n").alias("n"),
        )
    )


W2_TREE_SQL = """
WITH m AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
         CAST(EXTRACT(minute FROM ts) AS BIGINT) AS minute,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT day,
       CAST(SUM(n) OVER (PARTITION BY day) AS BIGINT) AS day_n,
       hour,
       CAST(SUM(n) OVER (PARTITION BY day, hour) AS BIGINT) AS hour_n,
       minute, n
FROM m
"""

# ---------------------------------------------------------------------------
# P11 — video-relative hour/minute (results.cpp:52-57: components of the
# offset from the *file start*, not wall clock)


def p11_relative_time(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    w = W.partitionBy("user_id")
    rel = F.unix_timestamp("ts") - F.min(F.unix_timestamp("ts")).over(w)
    return ev.select(
        "event_id",
        F.floor(rel / 3600).cast("long").alias("rel_hour"),
        F.floor((rel % 3600) / 60).cast("long").alias("rel_minute"),
    )


P11_SQL = """
WITH m AS (SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id)
SELECT e.event_id,
       CAST(FLOOR(date_diff('second', m.t0, e.ts) / 3600) AS BIGINT) AS rel_hour,
       CAST(FLOOR((date_diff('second', m.t0, e.ts) % 3600) / 60) AS BIGINT) AS rel_minute
FROM events e JOIN m USING (user_id)
"""

# ---------------------------------------------------------------------------
# W3 — monotone running max (speed_meter.cpp:18-33)


def w3_running_max(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t(spark, sf, "events").select(
        "event_id", F.max("value").over(w).alias("run_max")
    )


W3_SQL = """
SELECT event_id,
       MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
FROM events
"""

# ---------------------------------------------------------------------------
# W4 — neighbor navigation lead/lag (frame_view.cpp:98-238)


def w4_lead_lag(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    return t(spark, sf, "events").select(
        "event_id",
        (F.lead(sec).over(w) - sec).alias("next_gap_s"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


W4_SQL = """
SELECT event_id,
       LEAD(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w - CAST(FLOOR(epoch(ts)) AS BIGINT) AS next_gap_s,
       LAG(event_type) OVER w AS prev_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

# ---------------------------------------------------------------------------
# O1/O2 — size-sorted worker assignment (LPT approximation; search.cpp:117-163)


def o1_size_ranked_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Round-robin over the size-sorted sources — the fully-relational
    APPROXIMATION of LPT (intended as such; `o1_lpt_assign` below is the
    reference's exact greedy). On near-uniform sizes the two coincide; on
    skewed inputs round-robin can diverge from LPT's least-loaded choice."""
    docs = t(spark, sf, "documents")
    totals = docs.groupBy("source").agg(F.sum("n_chars").alias("total_chars"))
    rnk = F.row_number().over(W.orderBy(F.col("total_chars").desc(), F.col("source")))
    return totals.select(
        "source",
        "total_chars",
        rnk.cast("long").alias("rnk"),
    ).withColumn("worker", (F.col("rnk") - 1) % 4)


O1_SQL = """
SELECT source, total_chars, rnk, (rnk - 1) % 4 AS worker
FROM (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(ROW_NUMBER() OVER (ORDER BY SUM(n_chars) DESC, source) AS BIGINT) AS rnk
      FROM documents GROUP BY source)
"""

O1_NUM_WORKERS = 4


def o1_lpt_assign(spark: SparkSession, sf: str) -> DataFrame:
    """TRUE LPT (longest-processing-time-first): sort sources by total size
    descending, assign each to the currently LEAST-LOADED worker — exactly
    the reference's per-file greedy (`min_element` over worker loads,
    /root/reference/src/viewer/search.cpp:155-163; ties -> lowest index).

    Scale shape: the heavy part (summing 10^12 rows into per-source totals)
    is a distributed aggregation; the greedy itself runs driver-side over
    the AGGREGATED relation, which is bounded by the number of files/
    sources being assigned (thousands at production scale — the same list
    the reference's viewer loops over in memory). LPT is inherently
    sequential (each choice depends on all prior loads), so a driver loop
    over the bounded totals is the honest formulation, not a scale hole.
    """
    docs = t(spark, sf, "documents")
    totals = (
        docs.groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("total_chars"))
        .orderBy(F.col("total_chars").desc(), "source")
    )
    rows = totals.collect()  # bounded: one row per source (not per doc)
    loads = [0] * O1_NUM_WORKERS
    out = []
    for i, r in enumerate(rows, 1):
        w = min(range(O1_NUM_WORKERS), key=lambda k: loads[k])
        loads[w] += r["total_chars"]
        out.append((r["source"], r["total_chars"], i, w))
    return spark.createDataFrame(
        out, "source string, total_chars bigint, rnk bigint, worker bigint"
    )


# the greedy as a recursive CTE: the accumulator row carries the four worker
# loads; each step picks the least-loaded (lowest index on ties), mirroring
# the python loop exactly
O1_LPT_SQL = f"""
WITH RECURSIVE ranked AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(ROW_NUMBER() OVER (ORDER BY SUM(n_chars) DESC, source) AS BIGINT) AS rnk
  FROM documents GROUP BY source
),
a AS (
  SELECT rnk, source, total_chars, CAST(0 AS BIGINT) AS worker,
         total_chars AS l0, CAST(0 AS BIGINT) AS l1,
         CAST(0 AS BIGINT) AS l2, CAST(0 AS BIGINT) AS l3
  FROM ranked WHERE rnk = 1
  UNION ALL
  SELECT r.rnk, r.source, r.total_chars,
         CAST(CASE WHEN a.l0 <= a.l1 AND a.l0 <= a.l2 AND a.l0 <= a.l3 THEN 0
                   WHEN a.l1 <= a.l2 AND a.l1 <= a.l3 THEN 1
                   WHEN a.l2 <= a.l3 THEN 2 ELSE 3 END AS BIGINT) AS worker,
         a.l0 + CASE WHEN a.l0 <= a.l1 AND a.l0 <= a.l2 AND a.l0 <= a.l3 THEN r.total_chars ELSE 0 END AS l0,
         a.l1 + CASE WHEN NOT (a.l0 <= a.l1 AND a.l0 <= a.l2 AND a.l0 <= a.l3)
                      AND a.l1 <= a.l2 AND a.l1 <= a.l3 THEN r.total_chars ELSE 0 END AS l1,
         a.l2 + CASE WHEN NOT (a.l0 <= a.l1 AND a.l0 <= a.l2 AND a.l0 <= a.l3)
                      AND NOT (a.l1 <= a.l2 AND a.l1 <= a.l3)
                      AND a.l2 <= a.l3 THEN r.total_chars ELSE 0 END AS l2,
         a.l3 + CASE WHEN NOT (a.l0 <= a.l1 AND a.l0 <= a.l2 AND a.l0 <= a.l3)
                      AND NOT (a.l1 <= a.l2 AND a.l1 <= a.l3)
                      AND NOT (a.l2 <= a.l3) THEN r.total_chars ELSE 0 END AS l3
  FROM ranked r JOIN a ON r.rnk = a.rnk + 1
)
SELECT source, total_chars, rnk, worker FROM a
"""

# ---------------------------------------------------------------------------
# O3/W5 — top-1 per group (frame_view.cpp:27-33 stop-after-one;
# vision_kit.swift:36 topCandidates(1))


def o3_top1_per_group(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


O3_SQL = """
SELECT user_id, event_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# P2/P3 — the core normalizer (util.h:13-26 + tesseract.cpp:113-115)


def p23_normalize(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    toks = tokens_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.array_join(toks, " ").alias("norm_text"),
        F.size(toks).cast("long").alias("n_kept"),
    )


P23_SQL = f"""
SELECT doc_id,
       array_to_string({DUCK_TOKENS}, ' ') AS norm_text,
       CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_kept
FROM documents
"""

# ---------------------------------------------------------------------------
# P9 — frame->time conversion at fps=30 (decoder.cpp:160-168)


def p9_frame_time(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    ms = F.floor(F.col("event_id") * 1000 / 30).cast("long")
    return ev.select(
        "event_id", ms.alias("frame_ms"), F.floor(ms / 1000).cast("long").alias("frame_s")
    )


P9_SQL = """
SELECT event_id,
       CAST(FLOOR(event_id * 1000 / 30) AS BIGINT) AS frame_ms,
       CAST(FLOOR(CAST(FLOOR(event_id * 1000 / 30) AS BIGINT) / 1000) AS BIGINT) AS frame_s
FROM events
"""

# ---------------------------------------------------------------------------
# P12 — date bucketing / julian-style day number (search_results_view.cpp:77-87)


def p12_date_format(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day_label"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("day_num"),
    )


P12_SQL = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS day_label,
       CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_num
FROM events
"""

# ---------------------------------------------------------------------------
# S13 — JSON sink line format (ocr-cli.cpp:131-162)


def s13_json_line(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("json_line"),
    )


S13_SQL = """
SELECT event_id,
       printf('{"event_id":%d,"event_type":"%s"}', event_id, event_type) AS json_line
FROM events
"""

# ---------------------------------------------------------------------------
# S14 — raw/CSV sink with 2-decimal confidence (ocr-cli.cpp:119-135)


def s14_csv_line(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.format_string("%s,%d,%.2f", F.col("event_type"), F.col("event_id"), F.col("value")).alias("csv_line"),
    )


S14_SQL = """
SELECT event_id, printf('%s,%d,%.2f', event_type, event_id, value) AS csv_line
FROM events
"""

# ---------------------------------------------------------------------------
# S15 — JSON source with defaulted field (ocr-results-viewer.cpp:167-207,
# confidence optional -> default)


def s15_json_parse(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", F.coalesce(k, F.lit(100)).alias("k_val"))


S15_SQL = """
SELECT event_id,
       COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 100) AS k_val
FROM events
"""

# ---------------------------------------------------------------------------
# TPC-H-style benchmarks exercising scan+agg and multi-join paths
# (decimal-cast sums for cross-engine determinism)


def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    # Decimal discipline: factor precisions chosen so every product is EXACT
    # (no decimal rounding anywhere — Spark rounds HALF_UP, DuckDB half-even,
    # so any lossy cast diverges). price (9,4) x (1-disc) (6,4) -> (16,8)
    # exact; x (1+tax) (6,4) -> (23,12) exact; convert to double only after
    # the exact decimal SUM.
    li = t(spark, sf, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    d94 = lambda c: F.col(c).cast("decimal(9,4)")
    d124 = lambda c: F.col(c).cast("decimal(12,4)")
    one = F.lit(1).cast("decimal(5,4)")
    disc_price = d124("l_extendedprice") * (one - d94("l_discount"))
    charge = disc_price * (one + d94("l_tax"))
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(d94("l_quantity")).alias("_sq"),
        F.sum(d124("l_extendedprice")).alias("_sbp"),
        F.sum(disc_price).alias("_sdp"),
        F.sum(charge).alias("_sc"),
        F.count("*").alias("count_order"),
    )
    # floor at 2 decimals after the double conversion: decimal->double
    # conversion can differ by 1 ulp between engines (correctly-rounded
    # BigDecimal.doubleValue vs hugeint/10^s division); flooring collapses it
    f2 = lambda c: F.floor(c.cast("double") * 100) / 100
    return g.select(
        "l_returnflag",
        "l_linestatus",
        f2(F.col("_sq")).alias("sum_qty"),
        f2(F.col("_sbp")).alias("sum_base_price"),
        f2(F.col("_sdp")).alias("sum_disc_price"),
        f2(F.col("_sc")).alias("sum_charge"),
        f2(F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
        f2(F.col("_sbp").cast("double") / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(9,4))) AS DOUBLE) * 100) / 100 AS sum_qty,
       FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) * 100) / 100 AS sum_base_price,
       FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) * 100) / 100 AS sum_disc_price,
       FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(9,4))) * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(9,4)))) AS DOUBLE) * 100) / 100 AS sum_charge,
       FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(9,4))) AS DOUBLE) / COUNT(*) * 100) / 100 AS avg_qty,
       FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) * 100) / 100 AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_revenue(spark: SparkSession, sf: str) -> DataFrame:
    cust = t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf, "orders").where(F.col("o_orderdate") < "1998-01-01")
    li = t(spark, sf, "lineitem").where(F.col("l_shipdate") > "1998-01-01")
    d94 = lambda c: F.col(c).cast("decimal(9,4)")
    d124 = lambda c: F.col(c).cast("decimal(12,4)")
    one = F.lit(1).cast("decimal(5,4)")
    rev = d124("l_extendedprice") * (one - d94("l_discount"))  # (19,8) exact
    # no broadcast hints: orders/customer are corpus-sized tables, so the
    # build side must stay AQE's choice (broadcast below threshold at
    # sample SF, shuffled hash / sort-merge above it at real scale)
    j = li.join(
        orders.join(cust, orders.o_custkey == cust.c_custkey),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    g = j.groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate")).agg(
        F.sum(rev).alias("_rev")
    )
    return (
        g.select("l_orderkey", (F.floor(F.col("_rev").cast("double") * 100) / 100).alias("revenue"), "orderdate")
        .orderBy(F.col("_rev").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) * 100) / 100 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(9,4)))) DESC, l_orderkey
LIMIT 10
"""




def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + single agg.

    Scale: every predicate reaches the parquet scan (PushedFilters) and
    only 3 columns are read — the canonical pushdown/pruning showcase.
    """
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.02, 0.04))
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(12,4)") * F.col("l_discount").cast("decimal(9,4)")
    return li.agg(
        (F.floor(F.sum(rev).cast("double") * 100) / 100).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


Q6_SQL = """
SELECT FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) * 100) / 100 AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24
"""


def q12_shipmode_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation by group
    (adapted to the testdata's reduced lineitem schema: l_linestatus plays
    the shipmode role).

    Scale: lineitem filter pushes to the scan before the join; the join
    key is orders' PK so AQE picks broadcast-vs-shuffle by actual size.
    """
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = t(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
GROUP BY l_linestatus
"""


QUERIES = {
    "a1_watermark_max": (a1_watermark_max, A1_SQL),
    "a3_resume_antijoin": (a3_resume_antijoin, A3_SQL),
    "j1_dict_like_join": (j1_dict_like_join, J1_SQL),
    "j2_hash_id_mint": (j2_hash_id_mint, J2_HASH_SQL),
    "j3_pair_by_key": (j3_pair_by_key, J3_SQL),
    "a5_group_collect_ordered": (a5_group_collect_ordered, A5_SQL),
    "a6_match_count": (a6_match_count, A6_SQL),
    "w1_global_sort": (w1_global_sort, W1_SQL),
    "w2_time_rollup": (w2_time_rollup, W2_SQL),
    "w2_tree_rollup": (w2_tree_rollup, W2_TREE_SQL),
    "p11_relative_time": (p11_relative_time, P11_SQL),
    "w3_running_max": (w3_running_max, W3_SQL),
    "w4_lead_lag": (w4_lead_lag, W4_SQL),
    "o1_size_ranked_assign": (o1_size_ranked_assign, O1_SQL),
    "o1_lpt_assign": (o1_lpt_assign, O1_LPT_SQL),
    "o3_top1_per_group": (o3_top1_per_group, O3_SQL),
    "p23_normalize": (p23_normalize, P23_SQL),
    "p9_frame_time": (p9_frame_time, P9_SQL),
    "p12_date_format": (p12_date_format, P12_SQL),
    "s13_json_line": (s13_json_line, S13_SQL),
    "s14_csv_line": (s14_csv_line, S14_SQL),
    "s15_json_parse": (s15_json_parse, S15_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_top_revenue": (q3_top_revenue, Q3_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q12_shipmode_priority": (q12_shipmode_priority, Q12_SQL),
}
