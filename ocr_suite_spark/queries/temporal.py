"""Temporal operators over the events table — the four event-time
primitives Spark lacks as built-ins, each expressed shuffle-minimally:

- as-of join (latest marker at-or-before each probe) — the dataflow form
  of the reference's seek-to-closest-preceding-frame
  (/root/reference/src/ffmpeg/decoder.cpp:178-205: a requested frame
  resolves to the nearest decodable frame at or before it);
- gap sessionization (the temporal generalization of the reference's
  per-video hour/minute grouping, viewer results view — see
  w2_time_rollup's citations);
- range join (events within ±W of each anchor), bucketized so it runs
  as an equi-join, never an inequality/cartesian plan;
- rolling event-time range frame (sliding totals per user).

Scale shapes (all verified by the registry plan lint):
- asof: ONE shuffle on user_id; the union+carry-forward trick replaces
  the naive range join (probe × all-earlier-markers, quadratic per key)
  with a single ordered window whose state is one carried value. This is
  the standard distributed as-of formulation (same shape kdb aj / Flink
  temporal join use); at 100 TB it scales with events, not events².
- sessionize: one shuffle on user_id; the follow-up groupBy(user_id,
  session_id) reuses the same hash partitioning (user_id clusters cover
  the finer key), so Catalyst plans NO second exchange.
- range join: the anchor side (errors, ~20% and in general the small
  side) is exploded ×3 into adjacent buckets; the big side keeps exactly
  one row per event. Each qualifying pair meets in exactly one bucket
  (neighbor bucket is unique; the 3 probe buckets are distinct), so no
  dedup pass is needed. Cost: one equi-join shuffle on (user_id, bucket).
- rolling: one shuffle on user_id; frame state is bounded by events per
  user per day, not corpus size.

Determinism: (user_id, ts) is unique at every SF (verified), timestamps
flow as epoch micros (BIGINT, exact), and the rolling sum uses the
registry's floor->BIGINT convention for the double `value` column — no
float fold-order drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import fsec, t

# gap that closes a session: 1 day (median per-user inter-event gap in the
# synthetic corpus is ~7.3 h, p90 ~25 h -> sessions average a few events)
SESSION_GAP_US = 86_400 * 1_000_000

# half-width of the range join / rolling frame: 12 h
NEARBY_US = 43_200 * 1_000_000

# rolling range frame: 1 day, in whole seconds (range frames order by
# epoch seconds; micro ties collapse into the same frame either way)
ROLL_FRAME_S = 86_400


def _ev_us(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id", "user_id", "event_type", "value",
        # parquet ts is TIMESTAMP_NTZ; the cast reinterprets the wall clock
        # in the session tz (pinned UTC, session.py:61), matching DuckDB's
        # epoch_us on the same naive value
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )


def asof_join_prior_view(spark: SparkSession, sf: str) -> DataFrame:
    """Each click joined to the user's most recent view at or before it
    (NULL when no prior view exists) — an as-of LEFT join.

    Implementation: tag markers (views) side=0 and probes (clicks) side=1,
    union, and carry the last non-null marker forward within a per-user
    ordered window; rows with side=1 read the carried value. Ordering by
    (ts_us, side) makes an exactly-simultaneous marker visible to its
    probe, matching ASOF's >= semantics.
    """
    ev = _ev_us(spark, sf)
    views = ev.where(F.col("event_type") == "view")
    clicks = ev.where(F.col("event_type") == "click")
    tagged = views.select(
        "user_id", "ts_us", F.lit(0).alias("side"),
        F.col("event_id").alias("view_id"),
        F.col("ts_us").alias("view_ts_us"),
        F.lit(None).cast("long").alias("click_id"),
    ).unionByName(
        clicks.select(
            "user_id", "ts_us", F.lit(1).alias("side"),
            F.lit(None).cast("long").alias("view_id"),
            F.lit(None).cast("long").alias("view_ts_us"),
            F.col("event_id").alias("click_id"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged
        .withColumn("prior_view_id", F.last("view_id", ignorenulls=True).over(w))
        .withColumn("prior_view_us", F.last("view_ts_us", ignorenulls=True).over(w))
        .where(F.col("side") == 1)
        .select(
            F.col("click_id").alias("event_id"),
            "user_id",
            "ts_us",
            "prior_view_id",
            (F.col("ts_us") - F.col("prior_view_us")).alias("lag_us"),
        )
    )


ASOF_SQL = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
clicks AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
views AS (SELECT event_id AS prior_view_id, user_id, ts_us AS view_us
          FROM e WHERE event_type = 'view')
SELECT c.event_id, c.user_id, c.ts_us, v.prior_view_id,
       c.ts_us - v.view_us AS lag_us
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts_us >= v.view_us
"""


def sessionize_gap(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessions per user: a gap >= SESSION_GAP_US starts a new
    session; session_id is the running count of session starts. One row
    per session with its size and extent.

    The boundary is half-open (gap == GAP splits) to match Spark's native
    `session_window` exactly — windows [t, t+gap) don't overlap at
    distance gap — so `stream_sessionize` is this query's true streaming
    twin on any input, not just gap-free-of-the-boundary data."""
    e = _ev_us(spark, sf).select("user_id", "ts_us")
    wo = W.partitionBy("user_id").orderBy("ts_us")
    gap = F.col("ts_us") - F.lag("ts_us").over(wo)
    starts = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap >= SESSION_GAP_US), 1).otherwise(0)
    )
    sess = starts.withColumn(
        "session_id",
        F.sum("is_new")
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )


SESSIONIZE_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
starts AS (
  SELECT user_id, ts_us,
         CASE WHEN ts_us - LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w >= {SESSION_GAP_US} THEN 1
              ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
sess AS (
  SELECT user_id, ts_us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM starts
)
SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM sess GROUP BY user_id, session_id
"""


def range_join_nearby(spark: SparkSession, sf: str) -> DataFrame:
    """For every error event: how many of the same user's events fall
    within ±NEARBY_US of it (self excluded). The inequality predicate is
    turned into an equi-join by bucketing time at the range width and
    probing the 3 adjacent buckets from the (small) anchor side; the
    |Δt| <= W filter then runs per bucket-local pair."""
    ev = _ev_us(spark, sf)
    bucket = (F.col("ts_us") / F.lit(NEARBY_US)).cast("long")
    nbrs = ev.select(
        "user_id",
        F.col("event_id").alias("nbr_id"),
        F.col("ts_us").alias("nbr_us"),
        bucket.alias("bucket"),
    )
    anchors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us",
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bucket"),
    )
    hit = (F.abs(F.col("nbr_us") - F.col("ts_us")) <= NEARBY_US) & (
        F.col("nbr_id") != F.col("event_id")
    )
    # inner join is total: every anchor meets at least itself in its own
    # bucket, so no anchor row is lost; self is excluded by the count
    return (
        anchors.join(nbrs, ["user_id", "bucket"])
        .groupBy("event_id", "user_id", "ts_us")
        .agg(F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_nearby"))
    )


RANGE_JOIN_SQL = f"""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events)
SELECT a.event_id, a.user_id, a.ts_us,
       CAST(SUM(CASE WHEN n.event_id != a.event_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nearby
FROM (SELECT * FROM e WHERE event_type = 'error') a
JOIN e n ON n.user_id = a.user_id AND ABS(n.ts_us - a.ts_us) <= {NEARBY_US}
GROUP BY a.event_id, a.user_id, a.ts_us
"""


def rolling_range_1d(spark: SparkSession, sf: str) -> DataFrame:
    """Per event: the user's event count and floored-value total over the
    trailing 1-day event-time range frame (inclusive of the current row)."""
    e = t(spark, sf, "events").select(
        "event_id", "user_id",
        fsec(F.col("ts")).alias("ts_s"),
        F.floor("value").cast("long").alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-ROLL_FRAME_S, 0)
    )
    return e.select(
        "event_id", "user_id", "ts_s",
        F.count(F.lit(1)).over(w).cast("long").alias("n_1d"),
        F.sum("v").over(w).cast("long").alias("sum_floor_1d"),
    )


ROLLING_SQL = f"""
SELECT event_id, user_id, ts_s,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1d,
       CAST(SUM(v) OVER w AS BIGINT) AS sum_floor_1d
FROM (SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
             CAST(FLOOR(value) AS BIGINT) AS v
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN {ROLL_FRAME_S} PRECEDING AND CURRENT ROW)
"""


QUERIES = {
    "asof_join_prior_view": (asof_join_prior_view, ASOF_SQL),
    "sessionize_gap": (sessionize_gap, SESSIONIZE_SQL),
    "range_join_nearby": (range_join_nearby, RANGE_JOIN_SQL),
    "rolling_range_1d": (rolling_range_1d, ROLLING_SQL),
}
