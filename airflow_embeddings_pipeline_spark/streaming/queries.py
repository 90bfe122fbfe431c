"""Catalog entries that exercise the Structured Streaming path
end-to-end (SURVEY §2.8): a real ``readStream`` file source run with
``Trigger.AvailableNow`` into a memory sink, returned as a batch
DataFrame so the driver's oracle harness can hash it.

The windowed aggregations are deterministic under AvailableNow (every
fixture row is on time relative to the final watermark), so the
streaming results are SQL-expressible and get full DuckDB oracles —
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


def _stream_windowed(
    spark: SparkSession,
    sf_dir: str,
    *,
    window_duration: str,
    slide_duration: str | None = None,
) -> DataFrame:
    """Run the events file-source stream (one micro-batch under
    AvailableNow at fixture scale, many at 100 TB via
    maxFilesPerTrigger) through ``windowed_counts`` into a memory
    sink, and hand back the settled table.  Timestamp physical type is
    probed per file, not assumed: TIMESTAMP(NANOS) fixtures are
    declared as long (nanosAsLong) and truncated to µs in-stream, µs
    fixtures stream as-is — same convention as the batch registry
    (sources/registry.py)."""
    from ..sources.registry import _nanos_timestamp_columns

    path = os.path.join(sf_dir, "events.parquet")
    ns_cols = _nanos_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema

    # File stream source lists a directory; fixtures are single files
    # (read-only), so stage a symlink dir — zero copy at any scale.
    stage_dir = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(path, os.path.join(stage_dir, "events.parquet"))

    stream = spark.readStream.schema(raw_schema).parquet(stage_dir)
    for c in ns_cols:
        stream = stream.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # µs fixtures arrive as TIMESTAMP_NTZ; event-time watermarks require
    # TIMESTAMP (session tz is UTC, so the cast is value-preserving).
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = windowed_counts(
        stream,
        window_duration=window_duration,
        watermark_delay="30 minutes",
        slide_duration=slide_duration,
    )

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


def t_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling event-time windows over the events stream."""
    return _stream_windowed(spark, sf_dir, window_duration="1 hour")


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


def t_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour: every event contributes to two
    overlapping windows.  Streaming state doubles (window/slide
    entries per key) but stays watermark-bounded; the oracle replays
    the overlap by fanning each event out to its two window starts."""
    return _stream_windowed(
        spark, sf_dir, window_duration="2 hours", slide_duration="1 hour"
    )


register(
    Query(
        name="t_stream_sliding_counts",
        build=t_stream_sliding_counts,
        oracle="""
        SELECT ws AS window_start,
               ws + INTERVAL 2 HOUR AS window_end,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM (
            SELECT date_trunc('hour', ts) - o.off * INTERVAL 1 HOUR AS ws,
                   event_type, value
            FROM events, (SELECT unnest([0, 1]) AS off) o
        )
        GROUP BY 1, 2, 3
        ORDER BY window_start, event_type
        """,
        doc="Structured Streaming sliding-window agg (2h window / 1h slide, overlap fan-out oracle), T5/§2.8",
        tags=("streaming", "T5"),
    )
)
