"""Structured Streaming form of the incremental pipeline (SURVEY §2.8
T4 note): checkpoint replaces the watermark JSON, ``foreachBatch`` +
idempotent merge replaces the ordered task graph — the canonical Spark
pattern for the reference's effectively-once contract.

Also provides the windowed-aggregation building block
(``windowed_counts``) with an event-time watermark for late data —
capability the reference lacks (T5) but a streaming engine needs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def incremental_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    *,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source stream with ``Trigger.AvailableNow`` + foreachBatch.

    ``batch_fn(df, epoch_id)`` must be idempotent per epoch (merge on a
    key) — Spark replays the epoch after failure, the checkpoint
    records completion: at-least-once + idempotent sink =
    effectively-once, the same contract the reference builds by hand
    (embeddings-pipeline.py:480).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    slide_duration: str | None = None,
) -> DataFrame:
    """Event-time windowed aggregation with lateness control —
    ``withWatermark`` drops data later than the delay and lets state
    age out (bounded state at 100 TB/day event volumes).  A
    ``slide_duration`` shorter than the window makes the windows
    overlap (each event lands in window/slide buckets); state stays
    bounded the same way, just ×(window/slide) entries."""
    win = (
        F.window(ts_col, window_duration, slide_duration)
        if slide_duration
        else F.window(ts_col, window_duration)
    )
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )
