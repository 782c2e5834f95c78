"""Structured-Streaming incremental extraction — the ocs-watcher analog.

Reference behavior being re-expressed (/root/reference tools/ocs-watcher):
- S8 change-data source: watchdog FS events + periodic full rescan every
  `checking_frequency` minutes (ocsw/watcher.py:10-37, runner.py:25-42)
  -> Spark file streaming source; `Trigger.AvailableNow` is the "periodic
  rescan" mode (process everything new, then stop), a processing-time
  trigger is the "stay resident" mode.
- T1 resumable incremental processing: the checkpointLocation replaces the
  SQLite `last_processed_frame` watermark — a restarted query picks up
  exactly the unseen files, no recomputation, no duplicates.
- The reference re-runs the whole recognizer binary per video
  (executor.py:112-143, one subprocess per file); here each micro-batch
  runs the same `extract()` used in batch mode, so stream and batch paths
  share one implementation (the reference shares semantics the same way:
  ocr-cli and the pipeline share provider code).

foreachBatch + append parquet gives at-least-once file output with
exactly-once source accounting; an Iceberg/Delta sink would make the write
itself transactional at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import extract as X
from ..schema import DOCUMENTS


def stream_extract_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> int:
    """Process all documents files not yet seen by this checkpoint, then
    stop (the watcher's periodic-rescan semantics). Returns batches run."""
    reader = spark.readStream.schema(DOCUMENTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(input_dir)

    n_batches = {"n": 0}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        n_batches["n"] += 1
        if batch_df.isEmpty():
            return
        X.extract(batch_df).write.mode("append").parquet(output_dir)

    q = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def stream_dedup_exact(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — the ingest-time counterpart of the batch
    `dedup_exact` query: drop re-arrivals of identical content (same
    md5(text)) within an event-time watermark window.

    Spark-native statefulness: `dropDuplicatesWithinWatermark` keeps one
    state row per content hash and EVICTS it once the watermark passes —
    bounded state on an unbounded stream, which a batch `distinct` cannot
    provide. At crawl scale this is the dedup you run in the ingest path
    (re-crawls of an unchanged page arrive near each other in time), with
    the batch MinHash/LSH sweep downstream for long-range near-dups.

    Input: parquet files of (doc_id string, text string, ts timestamp).
    Returns the deduped rows drained via AvailableNow (test/smoke path;
    a resident pipeline would writeStream to the corpus table instead).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    src = spark.readStream.schema(schema).parquet(input_dir)
    # NULL text and empty text are distinct contents: prefix real values
    # so md5('t:') (empty string) never collides with the NULL marker
    content_key = F.coalesce(
        F.concat(F.lit("t:"), F.col("text")), F.lit("null:")
    )
    deduped = (
        src.withColumn("content_hash", F.md5(content_key))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    name = "stream_dedup_out"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT doc_id, text, ts, content_hash FROM {name}")


def stream_rate_meter(spark: SparkSession, events_dir: str, window: str = "5 seconds") -> DataFrame:
    """The speed_meter analog (reference speed_meter.cpp:35-58, 5s interval):
    windowed per-event-type rates over a streamed events table. Returns the
    result DataFrame after draining the source (memory sink smoke path)."""
    from pyspark.sql import functions as F

    import os

    schema = spark.read.parquet(events_dir).schema
    # the streaming file source needs a directory; accept a single file via
    # its parent dir + a glob filter
    reader = spark.readStream.schema(schema)
    if events_dir.endswith(".parquet") and not os.path.isdir(events_dir):
        reader = reader.option("pathGlobFilter", os.path.basename(events_dir))
        events_dir = os.path.dirname(events_dir)
    ev = reader.parquet(events_dir)
    # parquet ts is TIMESTAMP_NTZ; event-time semantics require TIMESTAMP
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        ev.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    name = "rate_meter_out"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT win.start AS win_start, event_type, n FROM {name}"
    )


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    gap: str = "86400 seconds",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming gap-sessionization — the ingest-time counterpart of the
    batch `sessionize_gap` query, built on Spark's native
    `session_window` aggregate.

    Spark-native statefulness: one state row per OPEN session per user;
    a session closes (and its row is emitted + evicted) once the
    event-time watermark passes session_end + gap. Bounded state on an
    unbounded stream — the batch window formulation needs the whole
    history, this needs only the open sessions. Append mode therefore
    emits exactly the CLOSED sessions; the trailing still-open session
    per user stays in state (tested against the batch oracle).

    Output columns mirror sessionize_gap minus the per-user ordinal
    (a global ordinal is unknowable mid-stream): user_id, n_events,
    start_us (first event), end_us (last event), duration_us.
    """
    import os

    from pyspark.sql import functions as F

    schema = spark.read.parquet(events_dir).schema
    # the streaming file source needs a directory; accept a single file via
    # its parent dir + a glob filter (same seam as stream_rate_meter)
    reader = spark.readStream.schema(schema)
    if events_dir.endswith(".parquet") and not os.path.isdir(events_dir):
        reader = reader.option("pathGlobFilter", os.path.basename(events_dir))
        events_dir = os.path.dirname(events_dir)
    ev = reader.parquet(events_dir)
    # parquet ts is TIMESTAMP_NTZ; event-time semantics require TIMESTAMP
    # (UTC session tz -> no wall-clock shift, session.py:61)
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    sess = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )
    name = "stream_sessionize_out"
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT user_id, n_events, start_us, end_us, duration_us FROM {name}"
    )


def stream_quality_gopher(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Ingest-path quality gate: the Gopher §A1.1 rules (word-count bounds,
    mean-word-length band, alphabetic fraction, distinct-stopword floor —
    queries/curation.quality_gopher_rules) as a STATELESS row-local map
    over a document stream.

    Quality filtering belongs in the ingest path precisely because it
    needs no state: unlike streaming dedup/sessionization (watermarked
    state rows), every signal here is a pure function of the row, so the
    operator is just Column expressions over readStream — infinite
    throughput scaling, no watermark, no state store. The batch operator
    computes the same signals via explode + map-side-combined aggregation
    (the right shape when the signals feed further corpus-level
    aggregation); this form computes them with array higher-order
    functions in place. Both produce IDENTICAL values — integer
    sums/counts then one double division then the same fixed-precision
    floor — asserted value-level in tests/test_streaming.py.

    Input: parquet files of (doc_id long, text string). Returns the
    graded rows drained via AvailableNow (smoke path; a resident pipeline
    would writeStream the keep=1 rows into the corpus table).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..queries.common import floor3, tokens_col
    from ..queries.curation import (
        GOPHER_MAX_MWL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA,
        GOPHER_MIN_MWL,
        GOPHER_MIN_STOP,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    src = spark.readStream.schema(schema).parquet(input_dir)
    toks = tokens_col(F.col("text"))
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_alpha = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.when(x.rlike("[a-zA-Z]"), 1).otherwise(0),
    )
    n_stop = F.size(
        F.array_distinct(F.filter(toks, lambda x: x.isin(GOPHER_STOPWORDS)))
    ).cast("long")
    graded = (
        src.select(
            "doc_id",
            n_words.alias("n_words"),
            floor3(sum_len / n_words).alias("mean_word_len"),
            floor3(n_alpha / n_words).alias("alpha_frac"),
            n_stop.alias("n_stop"),
        )
        .where(F.col("n_words") > 0)  # zero-token docs yield no row (batch convention)
        .withColumn(
            "keep",
            (F.col("n_words") >= GOPHER_MIN_WORDS)
            & (F.col("n_words") <= GOPHER_MAX_WORDS)
            & (F.col("mean_word_len") >= GOPHER_MIN_MWL)
            & (F.col("mean_word_len") <= GOPHER_MAX_MWL)
            & (F.col("alpha_frac") >= GOPHER_MIN_ALPHA)
            & (F.col("n_stop") >= GOPHER_MIN_STOP),
        )
    )
    name = "stream_quality_out"
    q = (
        graded.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
