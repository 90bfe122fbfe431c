"""Change-data-capture, history, and maintenance plans.

The reference pipeline is itself a change-consumer (it MERGEs document
deltas into a warehouse table, embeddings-pipeline.py:300-340); this
module generalizes that shape into the standard warehouse maintenance
operators a 100 TB deployment needs around it: changelog apply (CDC),
SCD2 history build, incremental materialized-view refresh, runtime
min/max join pruning, sketch-accuracy contracts, and key-skew
diagnostics.  All are pure DataFrame plans — single-shuffle where the
semantics allow, with pushed filters for the delta scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import Query, register


# ------------------------------------------------------------ CDC apply
# Collapse an ordered changelog to final table state: last writer per
# key wins, a trailing delete removes the key.  One shuffle (window on
# the key); at 100 TB the changelog is date-partitioned so the scan
# prunes to the compaction horizon.  The op mapping below treats the
# events fixture as a changelog: signup=insert, click/view/purchase=
# update, error=delete.
def o_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            op.alias("op"),
            F.round(F.col("value"), 6).alias("value"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count("*").over(Window.partitionBy("user_id")))
    )
    return (
        latest.filter(F.col("rn") == 1)
        .filter(F.col("op") != "D")  # trailing delete ⇒ key is gone
        .select("user_id", "op", "value", "ts", "n_changes")
        .orderBy("user_id")
    )


register(
    Query(
        name="o_cdc_apply",
        build=o_cdc_apply,
        oracle="""
        WITH log AS (
            SELECT user_id, ts, event_id,
                   CASE event_type WHEN 'signup' THEN 'I'
                                   WHEN 'error' THEN 'D'
                                   ELSE 'U' END AS op,
                   round(value, 6) AS value
            FROM events
        ), ranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn,
                   count(*) OVER (PARTITION BY user_id) AS n_changes
            FROM log
        )
        SELECT user_id, op, value, ts, n_changes
        FROM ranked WHERE rn = 1 AND op <> 'D'
        ORDER BY user_id
        """,
        doc="CDC changelog apply: last-writer-wins per key, trailing delete drops the key",
        tags=("cdc", "window"),
    )
)


# ---------------------------------------------------------- SCD2 build
# Type-2 slowly-changing-dimension history from an event stream:
# collapse consecutive runs of the tracked attribute into versioned
# [valid_from, valid_to) intervals, NULL valid_to marking the current
# version.  Two windows over the same (user_id, ts) partitioning —
# Catalyst reuses one sort/shuffle for both.
def o_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    changed = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("int")
    runs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("version", F.sum(changed).over(w))
        .groupBy("user_id", "version", "event_type")
        .agg(F.min("ts").alias("valid_from"), F.count("*").alias("n_events"))
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(wv))
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
        .select(
            "user_id", "version", "event_type",
            "valid_from", "valid_to", "n_events", "is_current",
        )
        .orderBy("user_id", "version")
    )


register(
    Query(
        name="o_scd2_history",
        build=o_scd2_history,
        oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(event_type) OVER w IS NULL
                             OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS changed
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), versioned AS (
            SELECT *, sum(changed) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS version
            FROM flagged
        ), runs AS (
            SELECT user_id, version, event_type,
                   min(ts) AS valid_from, count(*) AS n_events
            FROM versioned GROUP BY user_id, version, event_type
        )
        SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
               valid_from,
               lead(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY version) AS valid_to,
               n_events,
               CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
                                                ORDER BY version) IS NULL
                    THEN 1 ELSE 0 END AS is_current
        FROM runs ORDER BY user_id, version
        """,
        doc="SCD2 interval history: run-collapsed attribute versions with valid_from/valid_to",
        tags=("scd2", "window"),
    )
)


# ------------------------------------------- incremental MV refresh
# Materialized-view maintenance without rescanning history: the standing
# MV (per event-type/day counts + exact decimal sums) merges with a
# delta aggregated from only the new partition range — union + re-agg,
# exactly Spark's partial→final combine applied across runs.  The delta
# scan's `ts >= cutoff` is a pushed filter (partition pruning on a
# date-partitioned layout); only re-aggregatable metrics live in the MV
# (count/sum — avg derived after the merge), which is what makes the
# no-rescan refresh valid at 100 TB.
_MV_CUTOFF = "2024-01-24"


def t_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
            )
        )

    state = partial(ev.filter(F.col("ts") < F.lit(_MV_CUTOFF).cast("timestamp")))
    delta = partial(ev.filter(F.col("ts") >= F.lit(_MV_CUTOFF).cast("timestamp")))
    return (
        state.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
        .withColumn(
            "avg_value",
            # double-divide on both sides: decimal division would round
            # half-up where DuckDB's double round() rounds half-away
            F.round(F.col("sum_value").cast("double") / F.col("n_events"), 6),
        )
        # exact decimal sum internally; double at the boundary so both
        # engines hash the same representation
        .withColumn("sum_value", F.round(F.col("sum_value").cast("double"), 6))
        .orderBy("event_type", "day")
    )


register(
    Query(
        name="t_mv_incremental_refresh",
        build=t_mv_incremental_refresh,
        oracle=f"""
        SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               count(*) AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
                   AS sum_value,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*), 6) AS avg_value
        FROM events
        GROUP BY event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')
        ORDER BY event_type, day
        -- cutoff {_MV_CUTOFF}: the oracle recomputes from scratch; the
        -- engine merges a standing MV with a delta-only scan.
        """,
        doc="incremental materialized-view refresh: standing MV ⊎ delta partials == full recompute",
        tags=("incremental", "agg"),
    )
)


# ------------------------------------- runtime min/max join pruning
# The two-scalar runtime filter behind DPP / InjectRuntimeFilter,
# hand-rolled: aggregate the dim side's key range (2 scalars to the
# driver), push `fact.key BETWEEN lo AND hi` into the fact scan as a
# parquet-level predicate (row-group min/max skipping), then run the
# exact broadcast join.  Semantics-preserving — the oracle is the plain
# join — but at 100 TB the fact scan reads only row groups overlapping
# the dim's key range instead of the whole table.
def j_runtime_range_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") < 5)
    ).select("c_custkey", "c_nationkey")
    lo, hi = dim.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    pruned = orders.filter(F.col("o_custkey").between(F.lit(lo), F.lit(hi)))
    return (
        pruned.join(F.broadcast(dim), pruned.o_custkey == dim.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("revenue"),
        )
        .orderBy("c_nationkey")
    )


register(
    Query(
        name="j_runtime_range_prune",
        build=j_runtime_range_prune,
        oracle="""
        SELECT c_nationkey, count(*) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING' AND c_nationkey < 5
        GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        doc="runtime min/max join pruning: dim key-range pushed into the fact scan before the exact join",
        tags=("join", "pruning"),
    )
)


# --------------------------------------- approx percentile contract
# approx_percentile is the mergeable, map-side-combinable percentile
# path at 100 TB (exact percentiles need a per-group sort).  Like
# a_approx_distinct_bound, the sketch's value is engine-specific, so
# the oracle checks its accuracy contract against the exact quantiles:
# a loose 5%-relative engine-sanity gate here (fixtures regenerate per
# round); the strict rank-error bound stays unit-tested.
def a_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    exact = lambda q: F.expr(f"percentile(l_extendedprice, {q})")  # noqa: E731
    approx = lambda q: F.expr(  # noqa: E731
        f"approx_percentile(l_extendedprice, {q}, 100)"
    )
    within = lambda q: (  # noqa: E731
        (F.abs(approx(q) - exact(q)) / F.greatest(F.abs(exact(q)), F.lit(1.0)))
        <= 0.05
    ).cast("int")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(exact(0.5), 4).alias("p50_exact"),
            F.round(exact(0.9), 4).alias("p90_exact"),
            F.round(exact(0.99), 4).alias("p99_exact"),
            within(0.5).alias("within_p50"),
            within(0.9).alias("within_p90"),
            within(0.99).alias("within_p99"),
        )
        .orderBy("l_returnflag")
    )


register(
    Query(
        name="a_approx_percentiles",
        build=a_approx_percentiles,
        oracle="""
        SELECT l_returnflag, count(*) AS n,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
               round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
               1 AS within_p50, 1 AS within_p90, 1 AS within_p99
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        doc="approx_percentile sketch + accuracy contract vs exact quantiles (mergeable 100 TB path)",
        tags=("agg", "sketch"),
    )
)


# ------------------------------------------------- key-skew diagnostics
# The pre-flight check before any big join/agg: per-key cardinality
# histogram → heavy hitters + global dispersion, the numbers that decide
# whether a key needs salting (`j_salted_skew_join`) or AQE skew
# handling.  Two hash aggs + one tiny window; the per-key count table is
# the only shuffle at fact scale.
def a_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    globals_ = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_cnt"),
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("o_custkey"))
    top = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 10
    )
    return (
        top.crossJoin(F.broadcast(globals_))
        .select(
            "rank",
            "o_custkey",
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            F.round(
                F.col("cnt") / (F.col("n_rows") / F.col("n_keys")), 4
            ).alias("ratio_to_mean"),
            "n_keys",
            "p99_cnt",
        )
        .orderBy("rank")
    )


register(
    Query(
        name="a_key_skew_stats",
        build=a_key_skew_stats,
        oracle="""
        WITH counts AS (
            SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
        ), g AS (
            SELECT count(*) AS n_keys, sum(cnt) AS n_rows,
                   round(quantile_cont(cnt, 0.99), 4) AS p99_cnt
            FROM counts
        ), top AS (
            SELECT *, row_number() OVER (ORDER BY cnt DESC, o_custkey) AS rank
            FROM counts
        )
        SELECT rank, o_custkey, cnt,
               round(CAST(cnt AS DOUBLE) / n_rows, 6) AS share,
               round(CAST(cnt AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_keys), 4)
                   AS ratio_to_mean,
               n_keys, p99_cnt
        FROM top CROSS JOIN g WHERE rank <= 10 ORDER BY rank
        """,
        doc="join-key skew diagnostics: heavy hitters + dispersion (the salting decision input)",
        tags=("agg", "skew"),
    )
)
