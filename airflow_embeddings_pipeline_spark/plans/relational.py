"""Relational operator queries — SURVEY §2.1-2.7 inventory, one
oracle-checked query per operator family.

Determinism rules used throughout (SURVEY §7.3):
* double aggregations go through exact DECIMAL arithmetic and are cast
  back to DOUBLE at the end — sums become order-independent, so the
  shuffle-order difference between Spark and DuckDB cannot flip bits;
* window picks always carry a unique tiebreak column;
* no bare double→int casts (Spark truncates, DuckDB rounds — use
  explicit floor/round on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import (
    derive_display_name,
    derive_main_refco,
    first_country,
    iso_to_timestamp,
    normalize_ref,
    normalize_ref_sql,
    timestamp_to_iso,
)
from ..operators.dedup import latest_per_key
from ..sources.registry import load_table
from .catalog import Query, register


def _q(name, build, oracle, doc, tags, bench=False):
    register(Query(name=name, build=build, oracle=oracle, doc=doc, tags=tags, bench=bench))


# ---------------------------------------------------------------- P1-P4/S1
# Filtered, projected scan: equality + set + range predicates and a
# column drop, all pushed into the parquet scan by Catalyst (the Spark
# analog of the reference's Mongo-side $match/$project, S1/P1-P4).
def p_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("event_type").isin("click", "purchase")
            & (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & F.col("value").isNotNull()
        )
        .select("event_id", "user_id", "event_type", "ts", "value")
        .orderBy("event_id")
    )


_q(
    "p_filtered_scan",
    p_filtered_scan,
    """
    SELECT event_id, user_id, event_type, ts, value
    FROM events
    WHERE event_type IN ('click', 'purchase')
      AND ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND value IS NOT NULL
    ORDER BY event_id
    """,
    "pushdown scan: equality/set/range predicates + projection (P1-P4, S1)",
    ("P1", "P2", "P3", "P4", "S1"),
)


# ------------------------------------------------------------------ P6/F11
# Typed projection with casts — the $1:field::TYPE stage (P6).
def p_typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("orderkey_str"),
        F.col("l_linenumber").cast("long").alias("linenumber_long"),
        F.floor(F.col("l_quantity")).cast("long").alias("quantity_floor"),
        (F.col("l_returnflag") == "R").alias("is_returned"),
        F.col("l_shipdate").cast("date").cast("string").alias("shipdate_str"),
    ).orderBy("orderkey_str", "linenumber_long")


_q(
    "p_typed_projection",
    p_typed_projection,
    """
    SELECT CAST(l_orderkey AS VARCHAR) AS orderkey_str,
           CAST(l_linenumber AS BIGINT) AS linenumber_long,
           CAST(floor(l_quantity) AS BIGINT) AS quantity_floor,
           l_returnflag = 'R' AS is_returned,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS shipdate_str
    FROM lineitem ORDER BY orderkey_str, linenumber_long
    """,
    "typed projection with explicit casts (P6/F11, embeddings-pipeline.py:310-318)",
    ("P6", "F11"),
)


# -------------------------------------------------------------------- F1-F5
# The derived-column stage of the reference transform, over documents.
def f_derive_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    derived = docs.select(
        "doc_id",
        "source",
        normalize_ref(F.substring("text", 1, 25)).alias("cleaned_ref"),
        F.nullif(F.col("lang"), F.lit("en")).alias("color"),
    )
    return derived.select(
        "doc_id",
        "source",
        "cleaned_ref",
        derive_main_refco(F.col("cleaned_ref"), F.col("color"), max_length=20).alias(
            "main_refco"
        ),
        derive_display_name(F.col("source"), F.col("color")).alias("display_name"),
    ).orderBy("doc_id")


_NORM25 = normalize_ref_sql("substring(text, 1, 25)")
_q(
    "f_derive_columns",
    f_derive_columns,
    f"""
    WITH derived AS (
        SELECT doc_id, source,
               {_NORM25} AS cleaned_ref,
               nullif(lang, 'en') AS color
        FROM documents
    )
    SELECT doc_id, source, cleaned_ref,
           substring(CASE WHEN length(coalesce(color, '')) > 0
                     THEN concat(cleaned_ref, '_', color)
                     ELSE cleaned_ref END, 1, 20) AS main_refco,
           concat(source, ' (', coalesce(color, 'None'), ')') AS display_name
    FROM derived ORDER BY doc_id
    """,
    "normalize + conditional concat + truncate + format (F1-F5)",
    ("F1", "F2", "F3", "F5"),
)


# -------------------------------------------------------------------- F7/F8
def f_iso_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iso = ev.select("event_id", timestamp_to_iso("ts").alias("iso_ts"))
    return iso.select(
        "event_id", "iso_ts", iso_to_timestamp("iso_ts").alias("parsed_ts")
    ).orderBy("event_id")


_q(
    "f_iso_roundtrip",
    f_iso_roundtrip,
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_ts,
           CAST(strftime(ts, '%Y-%m-%dT%H:%M:%S') AS TIMESTAMP) AS parsed_ts
    FROM events ORDER BY event_id
    """,
    "timestamp↔ISO-8601 string round trip (F7/F8, embeddings-pipeline.py:227,122-123)",
    ("F7", "F8"),
)


# ------------------------------------------------------------------- F-json
# Semi-structured access: the reference reads $1:field::TYPE from
# VARIANT-ish parquet (P6) and JSON state files (S3); events.props is
# the JSON-payload analog.
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .filter(F.col("k").isNotNull())
        .orderBy("event_id")
    )


_q(
    "f_json_extract",
    f_json_extract,
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
    ORDER BY event_id
    """,
    "JSON field extraction + typed cast (S3/P6 semi-structured analog)",
    ("S3", "P6"),
)


# ---------------------------------------------------------------------- W1
def w_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key(
        ev.select("event_id", "user_id", "event_type", "ts"),
        key="user_id",
        order_by="ts",
        tiebreak="event_id",
    ).orderBy("user_id")


_q(
    "w_latest_per_key",
    w_latest_per_key,
    """
    SELECT event_id, user_id, event_type, ts FROM (
        SELECT event_id, user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
    "QUALIFY ROW_NUMBER()=1 latest-per-key dedup (W1, embeddings-pipeline.py:323)",
    ("W1", "O1", "O4"),
)


# ------------------------------------------------------------------ W-frame
# Running aggregate with an explicit frame — beyond the reference's
# single window fn, showcases frame specs (SURVEY §2.5 note).
def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 4)
            .cast("double")
            .alias("running_value"),
        )
        .orderBy("event_id")
    )


_q(
    "w_running_sum",
    w_running_sum,
    """
    SELECT event_id, user_id,
           CAST(round(sum(CAST(value AS DECIMAL(18,6)))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                AS DOUBLE) AS running_value
    FROM events ORDER BY event_id
    """,
    "running-sum window frame per key (frame-spec coverage beyond W1)",
    ("W1",),
)


# ----------------------------------------------------------- RANGE frame
# Event-time RANGE frame (trailing 1 hour of value per user): unlike a
# ROWS frame, the frame boundary is a VALUE offset over the order key,
# so all peers of a tied key are always in-frame — deterministic under
# ties by construction (no tiebreak column needed).  Ordered by epoch
# seconds in both engines so the numeric range offsets agree; decimal
# accumulation keeps the sliding sums order-exact.
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # NTZ-safe epoch seconds (session tz UTC)
    sec = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, 0)
    )
    return (
        ev.select("event_id", "user_id", sec.alias("sec"), "value")
        .select(
            "event_id",
            "user_id",
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 4)
            .cast("double")
            .alias("trailing_1h_value"),
            F.count("*").over(w).alias("trailing_1h_events"),
        )
        .orderBy("event_id")
    )


_q(
    "w_range_frame",
    w_range_frame,
    """
    SELECT event_id, user_id,
           CAST(round(sum(CAST(value AS DECIMAL(18,6)))
                      OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4)
                AS DOUBLE) AS trailing_1h_value,
           count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
               AS trailing_1h_events
    FROM events ORDER BY event_id
    """,
    "event-time RANGE frame: trailing-1h sliding sum per key (value-offset frame, tie-deterministic)",
    ("W1", "T5"),
)


# ------------------------------------------------------ running distinct
# COUNT(DISTINCT) OVER is unsupported in Spark SQL; the engine-native
# formulation is size(collect_set() OVER) — the set dedups inside the
# running frame, and only its SIZE is projected so the nondeterministic
# set ordering never reaches the output.  Frame keyed by day (RANGE
# semantics via pre-aggregated day grain: one row per (type, day) after
# the inner groupBy, so ROWS == RANGE and the running count is
# tie-free).  DuckDB supports DISTINCT window aggregates natively —
# a strong independent oracle for the rewrite.
def w_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = F.floor(F.col("ts").cast("timestamp").cast("long") / 86400).cast("long")
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", day.alias("day"), "user_id")
        .groupBy("event_type", "day")
        .agg(F.collect_set("user_id").alias("__users"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        daily.select(
            "event_type",
            "day",
            F.size("__users").alias("n_users_today"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("__users").over(w)))
            ).alias("n_users_cumulative"),
        )
        .orderBy("event_type", "day")
    )


_q(
    "w_running_distinct",
    w_running_distinct,
    """
    WITH dedup AS (
        SELECT DISTINCT event_type,
               CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
               user_id
        FROM events
    ), cum AS (
        SELECT event_type, day, user_id,
               count(DISTINCT user_id) OVER (PARTITION BY event_type ORDER BY day
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_users
        FROM dedup
    )
    SELECT event_type, day,
           count(*) AS n_users_today,
           max(cum_users) AS n_users_cumulative
    FROM cum GROUP BY event_type, day ORDER BY event_type, day
    """,
    "running distinct-user count per event type (COUNT DISTINCT OVER rewrite via windowed set union)",
    ("W1",),
)


# ------------------------------------------------------------------- A1/S2
def a_distinct_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("source").distinct().orderBy("source")


_q(
    "a_distinct_sources",
    a_distinct_sources,
    "SELECT DISTINCT source FROM documents ORDER BY source",
    "distinct-key discovery scan (S2/A1, embeddings-pipeline.py:97-104)",
    ("S2", "A1"),
)


# ------------------------------------------------------------------- A2/T3
# Per-key watermark candidate: max event time + count per key — the
# groupBy form of the reference's running max (A2) and its watermark
# advance (T3).
def a_group_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.max("ts").alias("latest_timestamp"),
            F.count("*").alias("records_processed"),
        )
        .orderBy("event_type")
    )


_q(
    "a_group_watermark",
    a_group_watermark,
    """
    SELECT event_type, max(ts) AS latest_timestamp, count(*) AS records_processed
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "per-key max-timestamp watermark + count (A2/A3/T3, embeddings-pipeline.py:192-195)",
    ("A2", "A3", "T3"),
)


# ---------------------------------------------------------------------- A4
def a_global_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


_q(
    "a_global_metrics",
    a_global_metrics,
    """
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM lineitem
    """,
    "global metrics rollup (A4, embeddings-pipeline.py:403-426)",
    ("A4",),
)


# ---------------------------------------------------------------------- J1
# Broadcast dimension join chain: fact ⨝ small dims, revenue rollup.
def j_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        # customer scales with SF (150k rows x SF) -- no forced hint;
        # AQE broadcasts at fixture scale.  nation/region are fixed-size.
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("r_name", "n_name")
    )


_q(
    "j_broadcast_dim",
    j_broadcast_dim,
    """
    SELECT r_name, n_name, count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
    "broadcast dim join chain + rollup (J1, embeddings-pipeline.py:325-326)",
    ("J1",),
    bench=True,
)


# ------------------------------------------------------------------ J-semi
# Semi/anti joins (the reference's inner-join semi-filter effect, §2.3).
def j_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    with_orders = customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_semi"
    ).select("c_custkey", F.lit(True).alias("has_orders"))
    without = customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", F.lit(False).alias("has_orders"))
    return with_orders.unionAll(without).orderBy("c_custkey")


_q(
    "j_semi_anti",
    j_semi_anti,
    """
    SELECT c_custkey, TRUE AS has_orders FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT c_custkey, FALSE AS has_orders FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    "left-semi / left-anti joins + union (J1 semi-filter effect, O3)",
    ("J1", "O3"),
)


# -------------------------------------------------------------------- J2/J3
# MERGE as a relational expression: full-outer join + per-column
# conditional coalesce — the portable form of the reference's upsert
# (embeddings-pipeline.py:328-351).  Target = per-user profile before
# the cutoff; source = after; merged = upserted profile table.
_CUTOFF = "2024-01-20 00:00:00"


def j_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_upsert

    ev = load_table(spark, sf_dir, "events")

    def profile(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max("ts").alias("last_seen"),
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )

    cutoff = F.lit(_CUTOFF).cast("timestamp")
    target = profile(ev.filter(F.col("ts") < cutoff))
    source = profile(ev.filter(F.col("ts") >= cutoff))
    return merge_upsert(target, source, "user_id").orderBy("user_id")


_q(
    "j_merge_upsert",
    j_merge_upsert,
    f"""
    WITH target AS (
        SELECT user_id, max(ts) AS last_seen, count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
        FROM events WHERE ts < TIMESTAMP '{_CUTOFF}' GROUP BY user_id
    ), source AS (
        SELECT user_id, max(ts) AS last_seen, count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
        FROM events WHERE ts >= TIMESTAMP '{_CUTOFF}' GROUP BY user_id
    )
    SELECT coalesce(t.user_id, s.user_id) AS user_id,
           CASE WHEN s.user_id IS NOT NULL THEN s.last_seen ELSE t.last_seen END AS last_seen,
           CASE WHEN s.user_id IS NOT NULL THEN s.n_events ELSE t.n_events END AS n_events,
           CASE WHEN s.user_id IS NOT NULL THEN s.total_value ELSE t.total_value END AS total_value
    FROM target t FULL OUTER JOIN source s ON t.user_id = s.user_id
    ORDER BY user_id
    """,
    "MERGE upsert as full-outer join + conditional coalesce (J2/J3, "
    "embeddings-pipeline.py:294-352)",
    ("J2", "J3"),
)


# ------------------------------------------------------------------- F4/O3
# Array handling: split text to tokens, first-element-with-fallback (F4).
def f_array_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("tokens")
    )
    return toks.select(
        "doc_id",
        first_country(F.col("tokens")).alias("first_token"),
        F.size("tokens").alias("n_tokens"),
    ).orderBy("doc_id")


_q(
    "f_array_first",
    f_array_first,
    """
    SELECT doc_id,
           CASE WHEN len(string_split(text, ' ')) > 0
                THEN string_split(text, ' ')[1] ELSE NULL END AS first_token,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents ORDER BY doc_id
    """,
    "array first-element-with-fallback + size (F4, embeddings-pipeline.py:210-214)",
    ("F4",),
)


# -------------------------------------------------------------- sessionize
# Sessionization: lag-gap-cumsum — the batch form of the streaming
# session_window (SURVEY §2.8 'not present' list; included as the
# canonical incremental-analytics pattern).
def t_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.select(
        "user_id",
        "ts",
        "event_id",
        (
            # double cast: TIMESTAMP_NTZ → TIMESTAMP (no-op for TIMESTAMP;
            # session tz is UTC) → epoch seconds (NTZ can't cast to long
            # directly).
            F.col("ts").cast("timestamp").cast("long")
            - F.lag(F.col("ts").cast("timestamp").cast("long"), 1).over(w)
            > 3600
        )
        .cast("int")
        .alias("new_session"),
    )
    return (
        gapped.groupBy("user_id")
        .agg(
            (F.sum(F.coalesce(F.col("new_session"), F.lit(0))) + 1).alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


_q(
    "t_sessionize",
    t_sessionize,
    """
    WITH gapped AS (
        SELECT user_id,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) > 3600
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id, CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM gapped GROUP BY user_id ORDER BY user_id
    """,
    "sessionization via lag-gap-cumsum (batch analog of session_window)",
    ("T5",),
)


# ----------------------------------------------- distribution ranks
# The remaining window-function family: percent_rank / cume_dist
# (distribution position) and first/last/nth_value (frame navigation).
# last_value needs the full-partition frame spelled out — the default
# frame stops at CURRENT ROW, a classic silent-wrong-answer trap this
# catalog pins with an oracle.
def w_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("price"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.round(F.first_value("o_totalprice").over(w_full), 2).alias(
                "cheapest_in_priority"
            ),
            F.round(F.last_value("o_totalprice").over(w_full), 2).alias(
                "priciest_in_priority"
            ),
            F.round(F.nth_value("o_totalprice", 2).over(w_full), 2).alias(
                "second_cheapest"
            ),
        )
        .orderBy("o_orderkey")
    )


_q(
    "w_distribution_ranks",
    w_distribution_ranks,
    """
    SELECT o_orderkey, o_orderpriority,
           round(o_totalprice, 2) AS price,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           round(first_value(o_totalprice) OVER wf, 2) AS cheapest_in_priority,
           round(last_value(o_totalprice) OVER wf, 2) AS priciest_in_priority,
           round(nth_value(o_totalprice, 2) OVER wf, 2) AS second_cheapest
    FROM orders WHERE o_orderkey <= 2000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
    "distribution ranks + frame navigation (percent_rank/cume_dist/first/last/nth_value, explicit full frame)",
    ("W1", "O1"),
)


# --------------------------------------------- custom-source scan (S1)
# The reference's actual source connector shape — a MongoDB collection
# scanned by paginated cursor with server-side $match
# (embeddings-pipeline.py:166-177) — as a Spark 4 custom Python
# DataSource: block-organized JSONL store, one input partition per
# block (parallel reads replace the cursor), and doc_id predicates
# pushed through pushFilters prune whole blocks from the manifest
# before any file opens.  The query filters doc_id >= 400 (pushed:
# only 2 of 8 blocks are read — asserted in tests/test_registry.py)
# and aggregates per source; the oracle runs the same relational query
# over the parquet table, proving the connector is value-transparent.
def s_document_store_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.document_store import (
        register_document_store,
        stage_document_store,
    )

    path = stage_document_store(sf_dir)
    register_document_store(spark)
    docs = spark.read.format("document_store").option("path", path).load()
    return (
        docs.filter(F.col("doc_id") >= 400)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_id"),
        )
        .orderBy("source")
    )


register(
    Query(
        name="s_document_store_scan",
        build=s_document_store_scan,
        oracle="""
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               min(doc_id) AS min_id
        FROM documents WHERE doc_id >= 400
        GROUP BY source ORDER BY source
        """,
        doc=(
            "custom Python DataSource scan (Mongo-collection analog): "
            "block-parallel JSONL store with manifest-pruned doc_id "
            "pushdown, oracled against the parquet table"
        ),
        tags=("S1", "source", "connector"),
    )
)


# ----------------------------------------------- MERGE with DELETE (J3)
# The WHEN MATCHED ... THEN DELETE clause over the same profile-merge
# shape as j_merge_upsert: source rows whose post-cutoff activity is
# pure error-noise (every event an 'error') act as TOMBSTONES — their
# target profile is removed, tombstones for unseen users insert
# nothing, everything else upserts normally.  CDC delete semantics
# through one full-outer join.
def j_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_upsert

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")

    def profile(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max("ts").alias("last_seen"),
            F.count("*").alias("n_events"),
        )

    target = profile(ev.filter(F.col("ts") < cutoff))
    source = profile(ev.filter(F.col("ts") >= cutoff)).join(
        ev.filter(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(
            (F.sum((F.col("event_type") != "error").cast("long")) == 0).alias(
                "all_errors"
            )
        ),
        "user_id",
    )
    return merge_upsert(
        target,
        source,
        "user_id",
        update_columns=["last_seen", "n_events"],
        delete_when=F.col("s.all_errors"),
    ).orderBy("user_id")


_q(
    "j_merge_delete",
    j_merge_delete,
    f"""
    WITH target AS (
        SELECT user_id, max(ts) AS last_seen, count(*) AS n_events
        FROM events WHERE ts < TIMESTAMP '{_CUTOFF}' GROUP BY user_id
    ), source AS (
        SELECT user_id, max(ts) AS last_seen, count(*) AS n_events,
               (sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) = 0)
                   AS all_errors
        FROM events WHERE ts >= TIMESTAMP '{_CUTOFF}' GROUP BY user_id
    )
    SELECT coalesce(t.user_id, s.user_id) AS user_id,
           CASE WHEN s.user_id IS NOT NULL THEN s.last_seen
                ELSE t.last_seen END AS last_seen,
           CASE WHEN s.user_id IS NOT NULL THEN s.n_events
                ELSE t.n_events END AS n_events
    FROM target t FULL OUTER JOIN source s ON t.user_id = s.user_id
    WHERE s.user_id IS NULL OR NOT coalesce(s.all_errors, FALSE)
    ORDER BY user_id
    """,
    "MERGE with WHEN MATCHED DELETE: tombstoned source rows remove their target match (J3/CDC)",
    ("J3", "merge", "cdc"),
)
