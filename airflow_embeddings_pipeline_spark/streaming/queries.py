"""Catalog entries that exercise the Structured Streaming path
end-to-end (SURVEY §2.8): a real ``readStream`` file source run with
``Trigger.AvailableNow`` into a memory sink, returned as a batch
DataFrame so the driver's oracle harness can hash it.

The tumbling-window aggregation is deterministic under AvailableNow
(every fixture row is on time relative to the final watermark), so the
streaming result is SQL-expressible and gets a full DuckDB oracle —
stronger than the rows-only check streaming ops usually settle for.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import Query, register
from .structured import windowed_counts


def t_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-time windows over the events stream.

    File-source stream (one micro-batch under AvailableNow at fixture
    scale, many at 100 TB via maxFilesPerTrigger), event-time watermark
    for bounded state, complete-mode memory sink.  The ns-timestamp
    fixture column is declared as long (nanosAsLong) and truncated to
    µs in-stream — same convention as the batch registry
    (sources/registry.py).
    """
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema

    # File stream source lists a directory; fixtures are single files
    # (read-only), so stage a symlink dir — zero copy at any scale.
    stage_dir = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(path, os.path.join(stage_dir, "events.parquet"))

    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(stage_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = windowed_counts(stream, window_duration="1 hour", watermark_delay="30 minutes")

    name = f"t_stream_wc_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_stream_wc_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return (
        spark.table(name)
        .select(
            "window_start",
            "window_end",
            "event_type",
            "n_events",
            F.round("total_value", 4).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


register(
    Query(
        name="t_stream_windowed_counts",
        build=t_stream_windowed_counts,
        oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY window_start, event_type
        """,
        doc="Structured Streaming tumbling-window agg (readStream → AvailableNow → memory sink), T5/§2.8",
        tags=("streaming", "T5"),
    )
)
