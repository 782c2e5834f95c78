"""Custom stateful streaming operator: per-document extraction watermark.

The reference keeps one monotone watermark per video DB —
``metadata.last_processed_frame``, advanced under a process-wide max guard
(/root/reference src/common/database.cpp:135-150, speed_meter.cpp:18-33).
Streaming analog: as span batches arrive for a document, carry
``(max_offset, n_spans)`` per doc_id across micro-batches in group state —
``applyInPandasWithState`` is Spark's primitive for exactly this
keyed-state-outliving-the-batch shape (no window can express "monotone
max so far, forever").

State is a tiny tuple per key; at 10^12 docs the state store shards by
the doc_id grouping key across executors and checkpoints incrementally —
the same key-partitioning story as the batch pipeline's buckets.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id string, max_offset int, n_spans long"
STATE_SCHEMA = "max_offset int, n_spans long"


def _advance_watermark(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's spans into the per-doc watermark state and emit the
    updated (doc_id, max_offset, n_spans). Monotone: the stored max never
    decreases (database.cpp:138-141's static-guard semantics)."""
    max_off, n = state.get if state.exists else (-1, 0)
    for pdf in pdfs:
        if len(pdf):
            batch_max = int(pdf["offset"].max())
            max_off = max(max_off, batch_max)
            n += len(pdf)
    state.update((max_off, n))
    yield pd.DataFrame({"doc_id": [key[0]], "max_offset": [max_off], "n_spans": [n]})


def stream_doc_watermarks(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str | None = None,
) -> DataFrame:
    """Stream span files from `input_dir` (parquet of doc_id, offset, ...),
    maintain per-doc watermarks in group state, drain with AvailableNow and
    return the final per-doc snapshot.

    Restarting with the same checkpoint resumes the SAME state: watermarks
    keep climbing across restarts, never reset — the streaming twin of the
    batch resume anti-join (progress.py). The sink is a foreachBatch
    parquet update log (the memory sink cannot recover from a checkpoint);
    the snapshot is the latest update per doc across all epochs.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    out_dir = out_dir or f"{checkpoint_dir.rstrip('/')}_updates"
    schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    updates = stream.groupBy("doc_id").applyInPandasWithState(
        _advance_watermark,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn("_epoch", F.lit(epoch_id)).write.mode("append").parquet(out_dir)

    q = (
        updates.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    raw = spark.read.parquet(out_dir)
    w = W.partitionBy("doc_id").orderBy(F.col("_epoch").desc())
    return (
        raw.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("doc_id", "max_offset", "n_spans")
    )
