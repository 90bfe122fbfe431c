"""Advanced relational coverage: as-of join, range join, pagination,
pivot, set operations — operators beyond the reference's own surface
(SURVEY §2.3/§2.6 'not present' lists), included for engine
completeness and each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join, interval_join, range_join_small_dim
from ..sources.registry import load_table
from .catalog import Query, register


# ---------------------------------------------------------------- as-of
# For every click event, the most recent purchase by the same user at
# or before it (classic event-attribution as-of).  DuckDB has native
# ASOF JOIN — a strong independent oracle for the union-window
# composition.
def j_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("asof_purchase_value").cast("decimal(18,6)"), 4)
        .cast("double")
        .alias("last_purchase_value"),
        F.col("asof_ts").alias("last_purchase_ts"),
    ).orderBy("event_id")


register(
    Query(
        name="j_asof_attribution",
        build=j_asof_attribution,
        oracle="""
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), purchases AS (
            SELECT user_id, ts, max(value) AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        )
        SELECT c.event_id, c.user_id, c.ts,
               CAST(round(CAST(p.purchase_value AS DECIMAL(18,6)), 4) AS DOUBLE) AS last_purchase_value,
               p.ts AS last_purchase_ts
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY c.event_id
        """,
        doc="as-of join via union+window composition, oracled against native ASOF JOIN",
        tags=("asof", "custom-op"),
        bench=True,
    )
)


# ------------------------------------------------------------- interval
# Click→purchase pairs within a 1-hour window per user — the batch
# equivalent of the stream-stream time-bound join (the streaming form,
# with watermarks purging state, is covered in tests/test_streaming.py;
# this catalog entry makes the same semantics oracle-checkable).
def j_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"),
        "user_id",
        F.col("ts").alias("bts"),
        "value",
    )
    out = interval_join(
        clicks, buys, key="user_id", left_ts="cts", right_ts="bts",
        window_seconds=3600,
    )
    return out.select(
        "click_id",
        "user_id",
        "cts",
        "buy_id",
        "bts",
        F.round(F.col("value").cast("decimal(18,6)"), 4)
        .cast("double")
        .alias("purchase_value"),
    ).orderBy("click_id", "buy_id")


register(
    Query(
        name="j_interval_attribution",
        build=j_interval_attribution,
        oracle="""
        WITH c AS (
            SELECT event_id AS click_id, user_id, ts AS cts
            FROM events WHERE event_type = 'click'
        ), b AS (
            SELECT event_id AS buy_id, user_id, ts AS bts, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c.click_id, c.user_id, c.cts, b.buy_id, b.bts,
               CAST(round(CAST(b.value AS DECIMAL(18,6)), 4) AS DOUBLE) AS purchase_value
        FROM c JOIN b
          ON c.user_id = b.user_id
         AND b.bts >= c.cts AND b.bts <= c.cts + INTERVAL 1 HOUR
        ORDER BY click_id, buy_id
        """,
        doc="time-bound interval join (1h window), bucketized equi-join vs plain range-join oracle",
        tags=("interval", "custom-op"),
        bench=True,
    )
)


# ---------------------------------------------------------------- range
# Discount-tier classification: lineitem joined to an interval dim.
_TIERS = [("low", 0.0, 0.03), ("mid", 0.03, 0.07), ("high", 0.07, 1.01)]


def j_range_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dim = spark.createDataFrame(_TIERS, schema="tier string, lo double, hi double")
    joined = range_join_small_dim(
        li, dim, value_col="l_discount", lo_col="lo", hi_col="hi"
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("tier")
    )


_TIER_VALUES = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _TIERS)
register(
    Query(
        name="j_range_tiers",
        build=j_range_tiers,
        oracle=f"""
        WITH dim(tier, lo, hi) AS (VALUES {_TIER_VALUES})
        SELECT tier, count(*) AS n_items,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
        FROM lineitem JOIN dim ON l_discount >= lo AND l_discount < hi
        GROUP BY tier ORDER BY tier
        """,
        doc="range (interval) join against a broadcast tier dim",
        tags=("range-join", "custom-op"),
    )
)


# ---------------------------------------------------------- limit/offset
# O2: the reference's LIMIT/SKIP cursor pagination as a deterministic
# keyset page (ORDER BY unique key + offset/limit).
def o_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


register(
    Query(
        name="o_pagination",
        build=o_pagination,
        oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
        """,
        doc="LIMIT/OFFSET cursor pagination (O2, embeddings-pipeline.py:166-177)",
        tags=("O2",),
    )
)


# ----------------------------------------------------------------- pivot
def a_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2).cast("double")
        )
        .orderBy("l_returnflag")
    )


register(
    Query(
        name="a_pivot_status",
        build=a_pivot_status,
        oracle="""
        SELECT l_returnflag,
               CAST(round(sum(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS "O",
               CAST(round(sum(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS "F"
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        doc="pivot (conditional aggregation) quantity by status",
        tags=("pivot",),
    )
)


# ---------------------------------------------------------------- set ops
def o_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    with_open = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    inter = building.intersect(with_open).withColumn("set_op", F.lit("both"))
    minus = building.exceptAll(with_open).withColumn("set_op", F.lit("building_only"))
    return inter.unionAll(minus).orderBy("set_op", "custkey")


register(
    Query(
        name="o_set_ops",
        build=o_set_ops,
        oracle="""
        WITH building AS (
            SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ), with_open AS (
            SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        )
        SELECT custkey, 'both' AS set_op FROM
            (SELECT custkey FROM building INTERSECT SELECT custkey FROM with_open)
        UNION ALL
        SELECT custkey, 'building_only' AS set_op FROM
            (SELECT custkey FROM building EXCEPT ALL SELECT custkey FROM with_open)
        ORDER BY set_op, custkey
        """,
        doc="INTERSECT / EXCEPT ALL set operations",
        tags=("set-ops",),
    )
)


# ------------------------------------------------------ cohort retention
# Weekly cohort retention matrix — the canonical product-analytics
# rollup: users bucketed by first-activity week, activity counted per
# week offset.  All time math is integer day/week arithmetic over epoch
# seconds (no calendar functions), so Spark and the oracle agree
# exactly and the plan is two hash aggregations: per-user first day
# (map-side combined), then distinct users per (cohort, offset) — the
# 100 TB shape, no window over the full event stream.
def t_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("timestamp").cast("long") / 86400).cast("long")
    per_event = ev.select("user_id", day.alias("day"))
    first = per_event.groupBy("user_id").agg(F.min("day").alias("first_day"))
    joined = per_event.join(first, "user_id").select(
        "user_id",
        F.floor(F.col("first_day") / 7).cast("long").alias("cohort_week"),
        F.floor((F.col("day") - F.col("first_day")) / 7).cast("long").alias(
            "week_offset"
        ),
    )
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


register(
    Query(
        name="t_cohort_retention",
        build=t_cohort_retention,
        oracle="""
        WITH per_event AS (
            SELECT user_id,
                   CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day
            FROM events
        ), first AS (
            SELECT user_id, min(day) AS first_day
            FROM per_event GROUP BY user_id
        )
        SELECT CAST(floor(f.first_day / 7) AS BIGINT) AS cohort_week,
               CAST(floor((e.day - f.first_day) / 7.0) AS BIGINT) AS week_offset,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM per_event e JOIN first f ON e.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY cohort_week, week_offset
        """,
        doc=(
            "weekly cohort retention matrix: first-activity cohort × "
            "week offset → distinct active users (integer epoch math)"
        ),
        tags=("T5", "analytics"),
    )
)


# -------------------------------------------------------- ordered funnel
# Ordered conversion funnel (signup → click → purchase, strictly later
# steps only): each stage is a per-user conditional MIN over the
# previous stage's timestamp.  Three tiny per-user aggregates chained
# by user_id equi-joins — each a map-side-combined shuffle on the same
# key (co-partitioned, AQE reuses the exchange); no window over the
# event stream, no self-join explosion.
def t_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    base = ev.select("user_id", "event_type", sec.alias("sec"))
    s = (
        base.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("sec").alias("t_signup"))
    )
    c = (
        base.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("sec") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t_click"))
    )
    p = (
        base.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("sec") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t_purchase"))
    )
    counts = s.agg(F.count("*").alias("n_signup")).crossJoin(
        c.agg(F.count("*").alias("n_click_after"))
    ).crossJoin(p.agg(F.count("*").alias("n_purchase_after")))
    return counts.select(
        "n_signup",
        "n_click_after",
        "n_purchase_after",
        F.round(F.col("n_click_after") / F.col("n_signup"), 4).alias("click_rate"),
        F.round(F.col("n_purchase_after") / F.col("n_click_after"), 4).alias(
            "purchase_rate"
        ),
    )


register(
    Query(
        name="t_event_funnel",
        build=t_event_funnel,
        oracle="""
        WITH base AS (
            SELECT user_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec
            FROM events
        ), s AS (
            SELECT user_id, min(sec) AS t_signup
            FROM base WHERE event_type = 'signup' GROUP BY user_id
        ), c AS (
            SELECT b.user_id, min(b.sec) AS t_click
            FROM base b JOIN s ON b.user_id = s.user_id
            WHERE b.event_type = 'click' AND b.sec > s.t_signup
            GROUP BY b.user_id
        ), p AS (
            SELECT b.user_id, min(b.sec) AS t_purchase
            FROM base b JOIN c ON b.user_id = c.user_id
            WHERE b.event_type = 'purchase' AND b.sec > c.t_click
            GROUP BY b.user_id
        )
        SELECT (SELECT count(*) FROM s) AS n_signup,
               (SELECT count(*) FROM c) AS n_click_after,
               (SELECT count(*) FROM p) AS n_purchase_after,
               round((SELECT count(*) FROM c)::DOUBLE
                     / (SELECT count(*) FROM s), 4) AS click_rate,
               round((SELECT count(*) FROM p)::DOUBLE
                     / (SELECT count(*) FROM c), 4) AS purchase_rate
        """,
        doc=(
            "ordered conversion funnel: per-user conditional-min stage "
            "chaining (signup → click → purchase, strictly increasing ts)"
        ),
        tags=("analytics",),
    )
)


# ----------------------------------------------------- event transitions
# First-order transition mining over per-user event sequences: lag
# pairs (prev_type → next_type) counted and normalized into transition
# probabilities — the Markov-chain view behind funnel diagnostics and
# session path analysis.  One window pass (partition by user, ordered
# by time) + one groupBy; the window never spans users, so state per
# partition is one row.
def t_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paired = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = paired.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n_transitions")
    )
    w_tot = Window.partitionBy("prev_type")
    return (
        counts.withColumn(
            "p_transition",
            F.round(
                F.col("n_transitions") / F.sum("n_transitions").over(w_tot), 6
            ),
        )
        .orderBy("prev_type", "next_type")
    )


register(
    Query(
        name="t_event_transitions",
        build=t_event_transitions,
        oracle="""
        WITH paired AS (
            SELECT lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_type,
                   event_type AS next_type
            FROM events
        ), counts AS (
            SELECT prev_type, next_type, count(*) AS n_transitions
            FROM paired WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, n_transitions,
               round(n_transitions::DOUBLE
                     / sum(n_transitions) OVER (PARTITION BY prev_type), 6)
                   AS p_transition
        FROM counts ORDER BY prev_type, next_type
        """,
        doc=(
            "first-order event-type transition matrix (lag pairs → "
            "counts → per-source transition probabilities)"
        ),
        tags=("analytics", "W1"),
    )
)


# ---------------------------------------------------------------- unpivot
# UNPIVOT (wide → long), the inverse of a_pivot_status: three metric
# columns melt into (metric, value) rows.  Spark's native unpivot()
# keeps this one Expand node — no union-of-three-scans.
def a_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.round(F.sum(dec), 2).cast("double").alias("revenue"),
        F.round(F.min(dec), 2).cast("double").alias("min_price"),
    )
    return (
        wide.unpivot(
            ids=["o_orderpriority"],
            values=["n_orders", "revenue", "min_price"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("o_orderpriority", "metric")
    )


register(
    Query(
        name="a_unpivot_metrics",
        build=a_unpivot_metrics,
        oracle="""
        WITH wide AS (
            SELECT o_orderpriority,
                   CAST(count(*) AS DOUBLE) AS n_orders,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS revenue,
                   CAST(round(min(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS min_price
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, metric, value
        FROM wide UNPIVOT (value FOR metric IN (n_orders, revenue, min_price))
        ORDER BY o_orderpriority, metric
        """,
        doc="UNPIVOT wide→long (inverse of pivot; one Expand node, no union-of-scans)",
        tags=("agg", "unpivot"),
    )
)


# ---------------------------------------------------------- null-safe join
# Null-safe equality (`<=>` / IS NOT DISTINCT FROM): NULL keys MATCH
# each other instead of silently dropping — the semantic corner that
# separates "join on possibly-absent attribute" from an inner join
# that quietly loses every null-keyed row.
def j_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # color is NULL for English docs (the reference's nullable attr)
    d = docs.select("doc_id", F.nullif("lang", F.lit("en")).alias("color"))
    color_dim = (
        d.groupBy("color")
        .agg(F.count("*").alias("n_docs_with_color"))
        .withColumnRenamed("color", "__dim_color")  # break self-join lineage
    )
    return (
        d.join(color_dim, F.col("color").eqNullSafe(F.col("__dim_color")))
        .select("doc_id", "color", "n_docs_with_color")
        .orderBy("doc_id")
    )


register(
    Query(
        name="j_null_safe_join",
        build=j_null_safe_join,
        oracle="""
        WITH d AS (
            SELECT doc_id, nullif(lang, 'en') AS color FROM documents
        ), dim AS (
            SELECT color, count(*) AS n_docs_with_color FROM d GROUP BY color
        )
        SELECT d.doc_id, d.color, dim.n_docs_with_color
        FROM d JOIN dim ON d.color IS NOT DISTINCT FROM dim.color
        ORDER BY d.doc_id
        """,
        doc="null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match instead of dropping",
        tags=("join", "null-safe"),
    )
)


# ------------------------------------------------------------- gap fill
# Calendar densification: a user × day spine (sequence + explode) LEFT
# joins the daily activity so silent days materialize as zeros — the
# prerequisite for any rolling metric over regular time steps (a gap
# in the raw events would silently shrink a moving average's window).
# The spine is generated, not scanned: |users| × |days| rows from two
# tiny aggregates.
def t_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("timestamp").cast("long") / 86400).cast("long")
    base = ev.filter(F.col("user_id") < 5).select(
        "user_id", day.alias("day"), "value"
    )
    bounds = base.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    users = base.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = base.groupBy("user_id", "day").agg(
        F.count("*").alias("__n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("__v"),
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("__n", F.lit(0)).alias("n_events"),
            F.coalesce("__v", F.lit(0.0)).alias("day_value"),
        )
        .orderBy("user_id", "day")
    )


register(
    Query(
        name="t_gap_fill",
        build=t_gap_fill,
        oracle="""
        WITH base AS (
            SELECT user_id,
                   CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
                   value
            FROM events WHERE user_id < 5
        ), bounds AS (
            SELECT min(day) AS d0, max(day) AS d1 FROM base
        ), spine AS (
            -- list-form generate_series (the table-function form cannot
            -- take lateral column args in DuckDB)
            SELECT u.user_id,
                   CAST(unnest(generate_series(b.d0, b.d1)) AS BIGINT) AS day
            FROM (SELECT DISTINCT user_id FROM base) u CROSS JOIN bounds b
        ), daily AS (
            SELECT user_id, day, count(*) AS n,
                   CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS v
            FROM base GROUP BY user_id, day
        )
        SELECT s.user_id, s.day,
               COALESCE(d.n, 0) AS n_events,
               COALESCE(d.v, 0.0) AS day_value
        FROM spine s LEFT JOIN daily d USING (user_id, day)
        ORDER BY s.user_id, s.day
        """,
        doc=(
            "calendar gap-fill: generated user × day spine LEFT-joined "
            "to daily activity, silent days as zeros (densification)"
        ),
        tags=("analytics", "T5"),
    )
)
