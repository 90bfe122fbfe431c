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


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (one micro-batch
    under AvailableNow at fixture scale, many at 100 TB via
    maxFilesPerTrigger).  Timestamp physical type is probed per file,
    not assumed: TIMESTAMP(NANOS) fixtures are declared as long
    (nanosAsLong) and truncated to µs in-stream, µs fixtures stream
    as-is — same convention as the batch registry
    (sources/registry.py)."""
    from ..sources.registry import _nanos_timestamp_columns

    spark.conf.set("spark.sql.session.timeZone", "UTC")
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
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_memory_sink(agg: DataFrame, prefix: str) -> DataFrame:
    """AvailableNow → complete-mode memory sink → settled batch table."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{prefix}_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(name)


def _stream_windowed(
    spark: SparkSession,
    sf_dir: str,
    *,
    window_duration: str,
    slide_duration: str | None = None,
) -> DataFrame:
    """Windowed counts over the events stream into a memory sink."""
    stream = _events_stream(spark, sf_dir)
    agg = windowed_counts(
        stream,
        window_duration=window_duration,
        watermark_delay="30 minutes",
        slide_duration=slide_duration,
    )

    return (
        _run_to_memory_sink(agg, "t_stream_wc")
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


# ------------------------------------------- streaming dedup (T5 / W1)
def t_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming dedup: ``dropDuplicatesWithinWatermark`` on
    (user_id, event_type) — the reference's duplicate suppression
    (embeddings-pipeline.py:323) under streaming delivery, with state
    BOUNDED by the watermark instead of growing forever like a plain
    ``dropDuplicates``.

    Determinism contract: which physical row survives per key depends
    on arrival order, so only the KEY columns are projected — the key
    set is exact and SQL-expressible.  Under AvailableNow the staged
    single-file source is one micro-batch, state never expires
    mid-batch, so the output is exactly the distinct key set."""
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = f"t_stream_ddww_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_ddww_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("user_id", "event_type")


register(
    Query(
        name="t_stream_dedup_watermark",
        build=t_stream_dedup_watermark,
        oracle="""
        SELECT user_id, event_type
        FROM events
        GROUP BY user_id, event_type
        ORDER BY user_id, event_type
        """,
        doc=(
            "streaming dedup via dropDuplicatesWithinWatermark: "
            "watermark-bounded key state, keys-only deterministic "
            "projection (T5/W1, embeddings-pipeline.py:323)"
        ),
        tags=("streaming", "T5", "W1"),
    )
)


# ---------------------------------------------------- stream-static join
# Stream-static enrichment: the events stream joins a STATIC dimension
# (per-user activity tier, derived once from the batch table) before
# the windowed aggregation.  This is the standard serving topology —
# facts stream, dims sit in the lake — and in Spark the static side is
# simply re-read per micro-batch with no streaming state; a small dim
# broadcasts.  Deterministic under AvailableNow, so the whole
# stream-join-window pipeline gets a full SQL oracle.
_TIER_MIN_EVENTS = 70  # >= this many events in the batch ⇒ "heavy"


def t_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import load_table

    batch = load_table(spark, sf_dir, "events")
    tiers = (
        batch.groupBy("user_id")
        .agg(F.count("*").alias("__n"))
        .select(
            "user_id",
            F.when(F.col("__n") >= _TIER_MIN_EVENTS, F.lit("heavy"))
            .otherwise(F.lit("light"))
            .alias("tier"),
        )
    )
    stream = _events_stream(spark, sf_dir)
    enriched = stream.join(F.broadcast(tiers), "user_id")
    agg = (
        enriched.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 day").alias("w"), "tier")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("tier_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "tier",
            "n_events",
            "tier_value",
        )
    )
    return _run_to_memory_sink(agg, "t_stream_enrich").orderBy(
        "window_start", "tier"
    )


register(
    Query(
        name="t_stream_static_enrich",
        build=t_stream_static_enrich,
        oracle=f"""
        WITH tiers AS (
            SELECT user_id,
                   CASE WHEN count(*) >= {_TIER_MIN_EVENTS}
                        THEN 'heavy' ELSE 'light' END AS tier
            FROM events GROUP BY user_id
        )
        SELECT date_trunc('day', e.ts) AS window_start, t.tier,
               count(*) AS n_events,
               CAST(round(sum(CAST(e.value AS DECIMAL(18,6))), 4) AS DOUBLE)
                   AS tier_value
        FROM events e JOIN tiers t ON e.user_id = t.user_id
        GROUP BY 1, 2 ORDER BY window_start, tier
        """,
        doc=(
            "stream-static enrichment join: broadcast batch-derived dim "
            "into the stream before daily windowed agg (T5/§2.8)"
        ),
        tags=("streaming", "T5"),
    )
)


# ------------------------------------------------- stateful custom agg
# applyInPandasWithState as an oracle-checked catalog entry: per-user
# running (count, exact-integer value sum, max event second) held in
# the state store, settled under AvailableNow and compared against the
# plain batch aggregation.  The update-mode memory sink keeps the LAST
# row per key, which after the final micro-batch is the complete total.
def t_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .stateful import stateful_user_stats

    stream = _events_stream(spark, sf_dir).select(
        "user_id",
        "value",
        F.col("ts").cast("long").alias("sec"),
    )
    out = stateful_user_stats(stream)

    name = f"t_stateful_us_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_stateful_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per key per batch; the final state is
    # the last row per key (events-count tiebreak — totals only grow).
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"), F.desc("last_sec"))
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", "total_value", "last_sec")
        .orderBy("user_id")
    )


register(
    Query(
        name="t_stateful_user_stats",
        build=t_stateful_user_stats,
        oracle="""
        SELECT user_id,
               count(*) AS n_events,
               round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
                     / 1000000.0, 4) AS total_value,
               CAST(max(floor(epoch(ts))) AS BIGINT) AS last_sec
        FROM events GROUP BY user_id ORDER BY user_id
        """,
        doc=(
            "custom stateful aggregation (applyInPandasWithState): "
            "per-key running totals in the state store, oracled against "
            "the batch aggregation (T1/T3/§2.8)"
        ),
        tags=("streaming", "stateful", "pandas-udf"),
    )
)


# transformWithStateInPandas (Spark 4 arbitrary-state API) as an
# oracle-checked catalog entry: the same order-independent per-user
# totals as t_stateful_user_stats, held in named RocksDB state
# variables.  The RocksDB provider is required by transformWithState;
# it is set only for this query's lifetime and restored after.
#
# Dependency probe (same pattern as the multimodal codec tier): the
# transformWithState Python worker speaks a protobuf protocol to the
# JVM state server, so the entry only registers when google.protobuf
# is importable — this container ships without it, in which case the
# operator stays available as library code (tws_user_stats) and the
# applyInPandasWithState entry (t_stateful_user_stats) carries the
# stateful-streaming oracle.
try:  # pragma: no cover - environment probe
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:  # pragma: no cover
    _HAS_PROTOBUF = False


def t_tws_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .stateful import tws_user_stats

    stream = _events_stream(spark, sf_dir).select(
        "user_id",
        "value",
        F.col("ts").cast("long").alias("sec"),
    )
    out = tws_user_stats(stream)

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    name = f"t_tws_us_{uuid.uuid4().hex[:8]}"
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_tws_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"), F.desc("last_sec"))
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", "total_value", "last_sec")
        .orderBy("user_id")
    )


if _HAS_PROTOBUF:
    register(
        Query(
            name="t_tws_user_stats",
            build=t_tws_user_stats,
            oracle="""
            SELECT user_id,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
                         / 1000000.0, 4) AS total_value,
                   CAST(max(floor(epoch(ts))) AS BIGINT) AS last_sec
            FROM events GROUP BY user_id ORDER BY user_id
            """,
            doc=(
                "Spark 4 transformWithStateInPandas: named RocksDB state "
                "variables, per-key running totals oracled against the "
                "batch aggregation (T1/T3/§2.8 successor API)"
            ),
            tags=("streaming", "stateful", "pandas-udf"),
        )
    )


# Stream-stream inner interval join as an oracle-checked catalog entry:
# views joined to same-user purchases within the following hour, both
# sides event-time-watermarked so each side's join state purges once
# the watermark passes the interval (the ONLY way Structured Streaming
# admits an unbounded two-stream join).  Under AvailableNow on bounded
# fixtures the appended result is the exact batch interval join, so the
# DuckDB oracle is the plain SQL join.
def t_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("vts"),
        )
        .withWatermark("vts", "1 hour")
    )
    buys = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("bts"),
            F.col("value").alias("amount"),
        )
        .withWatermark("bts", "1 hour")
    )
    joined = views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("bts") >= F.col("vts"))
        & (F.col("bts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "buy_id",
        (F.unix_micros("bts") - F.unix_micros("vts")).alias("gap_us"),
        F.round("amount", 6).alias("amount"),
    )

    name = f"t_ss_join_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_ssjoin_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("user_id", "view_id", "buy_id")


register(
    Query(
        name="t_stream_stream_join",
        build=t_stream_stream_join,
        oracle="""
        SELECT v.user_id, v.event_id AS view_id, b.event_id AS buy_id,
               CAST(epoch_us(b.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us,
               round(b.value, 6) AS amount
        FROM events v
        JOIN events b
          ON v.event_type = 'view' AND b.event_type = 'purchase'
         AND b.user_id = v.user_id
         AND b.ts >= v.ts
         AND b.ts <= v.ts + INTERVAL 1 HOUR
        ORDER BY v.user_id, view_id, buy_id
        """,
        doc=(
            "stream-stream inner interval join with two-sided event-time "
            "watermarks (bounded join state); AvailableNow result == the "
            "batch interval join (T5/T6, embeddings-pipeline.py:150-180 "
            "generalized to two live streams)"
        ),
        tags=("streaming", "join"),
    )
)


# --------------------------------------- streaming session windows (T5)
# Native session_window aggregation — the merging-window state shape
# tumbling/sliding windows don't exercise (sessions EXTEND and MERGE as
# events arrive, so state is per-session, not per-fixed-window).
# Complete mode (Spark 4 supports it for session windows; update is
# rejected): every trigger emits the full settled session table, and
# under AvailableNow the fixture is one micro-batch, so the sink holds
# each final session exactly once and the result equals batch gap-merge
# sessionization — fully SQL-expressible.  Boundary semantics: an event at exactly
# last_event + gap starts a NEW session (session windows are
# end-exclusive), hence the oracle's `>= 3600`, unlike t_sessionize's
# strictly-greater lag-gap convention.
_SESSION_GAP = "1 hour"


def t_stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.session_window("ts", _SESSION_GAP), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
    name = f"t_stream_sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_sess_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("user_id", "session_start")


register(
    Query(
        name="t_stream_session_counts",
        build=t_stream_session_counts,
        oracle="""
        WITH gapped AS (
            SELECT user_id, ts, value,
                   CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                             - lag(CAST(floor(epoch(ts)) AS BIGINT))
                               OVER (PARTITION BY user_id ORDER BY ts)
                             >= 3600
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), sessioned AS (
            SELECT *,
                   sum(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM gapped
        )
        SELECT min(ts) AS session_start,
               max(ts) + INTERVAL 1 HOUR AS session_end,
               user_id,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM sessioned GROUP BY user_id, sid
        ORDER BY user_id, session_start
        """,
        doc=(
            "Structured Streaming session_window agg (merging-window state, "
            "complete mode → memory sink), oracled against batch gap-merge "
            "sessionization, T5/§2.8"
        ),
        tags=("streaming", "T5"),
    )
)
