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
from ..functions.ranking import single_group
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
        # dim is customer-derived (scales with SF): the range-prune
        # is the technique here; the join strategy is left to AQE
        pruned.join(dim, pruned.o_custkey == dim.c_custkey)
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
    # Global top-10 as TakeOrderedAndProject (distributed partial
    # top-k), then rank over the ≤10 survivors — the lit(0) partition
    # keeps WindowExec off its all-data-to-one-partition path warning
    # while being semantically the single global frame.
    top10 = counts.orderBy(F.col("cnt").desc(), "o_custkey").limit(10)
    w = Window.partitionBy(single_group("cnt")).orderBy(
        F.col("cnt").desc(), F.col("o_custkey")
    )
    top = top10.withColumn("rank", F.row_number().over(w))
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


# ---------------------------------------------------- z-order layout
# Multi-dimensional clustering: interleave the bits of two scan keys so
# that sorting by the combined z-value co-locates rows that are close
# in BOTH dimensions — a z-ordered parquet write gives row-group
# min/max skipping for predicates on either key (the Delta/Iceberg
# OPTIMIZE ZORDER shape, built from plain bit arithmetic).  The output
# groups by the top 6 z-bits and reports each group's key ranges: the
# guarantee that every z-prefix confines BOTH keys' high bits (asserted
# as *_hi columns and in tests) IS the data-skipping property.
_Z_BITS = 8


def _z_expr(a: str, b: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i + 1})")
        terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i})")
    return " + ".join(terms)


def _z_expr_duck(a: str, b: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def o_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        (F.col("o_custkey") % 256).cast("int").alias("cb"),
        (F.datediff("o_orderdate", F.lit("1992-01-01")) % 256).cast("int").alias(
            "db"
        ),
    ).withColumn("z", F.expr(_z_expr("cb", "db")))
    return (
        keyed.groupBy(F.shiftright("z", 10).alias("z_prefix"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("cb").alias("min_cb"),
            F.max("cb").alias("max_cb"),
            F.min("db").alias("min_db"),
            F.max("db").alias("max_db"),
            # the clustering guarantee: one 6-bit z-prefix pins the top
            # 3 bits of BOTH keys — each group spans <=32 of 256 values
            F.shiftright(F.min("cb"), 5).alias("cb_hi"),
            F.shiftright(F.min("db"), 5).alias("db_hi"),
        )
        .orderBy("z_prefix")
    )


register(
    Query(
        name="o_zorder_layout",
        build=o_zorder_layout,
        oracle=f"""
        WITH keyed AS (
            SELECT CAST(o_custkey % 256 AS INTEGER) AS cb,
                   CAST(datediff('day', DATE '1992-01-01', o_orderdate) % 256
                        AS INTEGER) AS db
            FROM orders
        ), z AS (
            SELECT cb, db, {_z_expr_duck('cb', 'db')} AS z FROM keyed
        )
        SELECT z >> 10 AS z_prefix, count(*) AS n_rows,
               min(cb) AS min_cb, max(cb) AS max_cb,
               min(db) AS min_db, max(db) AS max_db,
               min(cb) >> 5 AS cb_hi, min(db) >> 5 AS db_hi
        FROM z GROUP BY z >> 10 ORDER BY z_prefix
        """,
        doc="z-order clustering key: bit-interleaved two-dim layout; per-prefix key ranges show both-dim data skipping",
        tags=("layout", "pruning"),
    )
)


# ------------------------------------------------- equi-width histogram
# Distribution profiling: global [min, max] split into fixed-width bins
# (two scans: a 2-scalar agg broadcast under the binning map — the same
# runtime-scalar shape as j_runtime_range_prune).  Equi-DEPTH profiling
# is a_percentiles; this is the equi-WIDTH complement.
_HIST_BINS = 20


def a_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ext = orders.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count("*").alias("n_total"),
    )
    binned = orders.crossJoin(F.broadcast(ext)).withColumn(
        "bin",
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / _HIST_BINS)
            ),
            F.lit(_HIST_BINS - 1),
        ).cast("int"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.count("*") / F.first("n_total"), 6).alias("share"),
            F.round(
                F.first("lo") + F.col("bin") * ((F.first("hi") - F.first("lo")) / _HIST_BINS),
                4,
            ).alias("bin_lo"),
        )
        .orderBy("bin")
    )


register(
    Query(
        name="a_histogram",
        build=a_histogram,
        oracle=f"""
        WITH ext AS (
            SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi,
                   count(*) AS n_total
            FROM orders
        ), binned AS (
            SELECT CAST(least(floor((o_totalprice - lo)
                                    / ((hi - lo) / {_HIST_BINS})),
                              {_HIST_BINS - 1}) AS INTEGER) AS bin,
                   lo, hi, n_total
            FROM orders CROSS JOIN ext
        )
        SELECT bin, count(*) AS n_rows,
               round(CAST(count(*) AS DOUBLE) / any_value(n_total), 6) AS share,
               round(any_value(lo) + bin * ((any_value(hi) - any_value(lo))
                     / {_HIST_BINS}), 4) AS bin_lo
        FROM binned GROUP BY bin ORDER BY bin
        """,
        doc="equi-width histogram: 2-scalar extent broadcast under the binning map",
        tags=("agg", "profiling"),
    )
)


# --------------------------------------- reconciliation checksum diff
# Table-diff without a row-level join: both sides reduce to one
# arithmetic checksum row per bucket (key-modulo), and only mismatching
# buckets surface.  At 100 TB this is two scans + a 64-row compare —
# the anti-entropy pattern for verifying a MERGE target against its
# source (the reference trusts MERGE blindly; embeddings-pipeline.py:
# 300-340).  The 'replica' here is the same table with a deterministic
# planted corruption so the expected mismatch set is oracle-checkable.
_CK_BUCKETS = 64
_CK_CORRUPT_EVERY = 997  # orderkeys divisible by this get +0.01


def j_checksum_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def bucket_sums(df: DataFrame, price_col) -> DataFrame:
        row_h = (
            F.col("o_orderkey") * F.lit(1_000_003)
            + F.round(price_col * 100).cast("long")
        ) % F.lit(2_147_483_647)
        return (
            df.select(
                (F.col("o_orderkey") % _CK_BUCKETS).cast("int").alias("bucket"),
                row_h.alias("h"),
            )
            .groupBy("bucket")
            .agg(F.sum("h").alias("checksum"), F.count("*").alias("n_rows"))
        )

    src = bucket_sums(orders, F.col("o_totalprice"))
    replica_price = F.when(
        F.col("o_orderkey") % _CK_CORRUPT_EVERY == 0, F.col("o_totalprice") + 0.01
    ).otherwise(F.col("o_totalprice"))
    dst = bucket_sums(orders, replica_price)
    return (
        src.alias("s")
        .join(dst.alias("d"), "bucket")
        .filter(
            (F.col("s.checksum") != F.col("d.checksum"))
            | (F.col("s.n_rows") != F.col("d.n_rows"))
        )
        .select(
            "bucket",
            F.col("s.checksum").alias("src_checksum"),
            F.col("d.checksum").alias("dst_checksum"),
            F.col("s.n_rows").alias("n_rows"),
        )
        .orderBy("bucket")
    )


register(
    Query(
        name="j_checksum_reconcile",
        build=j_checksum_reconcile,
        oracle=f"""
        WITH src AS (
            SELECT CAST(o_orderkey % {_CK_BUCKETS} AS INTEGER) AS bucket,
                   sum((o_orderkey * 1000003
                        + CAST(round(o_totalprice * 100) AS BIGINT))
                       % 2147483647) AS checksum,
                   count(*) AS n_rows
            FROM orders GROUP BY 1
        ), dst AS (
            SELECT CAST(o_orderkey % {_CK_BUCKETS} AS INTEGER) AS bucket,
                   sum((o_orderkey * 1000003
                        + CAST(round((CASE WHEN o_orderkey % {_CK_CORRUPT_EVERY} = 0
                                           THEN o_totalprice + 0.01
                                           ELSE o_totalprice END) * 100) AS BIGINT))
                       % 2147483647) AS checksum,
                   count(*) AS n_rows
            FROM orders GROUP BY 1
        )
        SELECT s.bucket,
               CAST(s.checksum AS BIGINT) AS src_checksum,
               CAST(d.checksum AS BIGINT) AS dst_checksum,
               s.n_rows
        FROM src s JOIN dst d USING (bucket)
        WHERE s.checksum <> d.checksum OR s.n_rows <> d.n_rows
        ORDER BY s.bucket
        """,
        doc="anti-entropy reconciliation: per-bucket arithmetic checksums, mismatching buckets only (no row-level join)",
        tags=("join", "reconcile"),
    )
)


# ---------------------------------------------- heavy-hitters sketch
# Approximate frequent items (Karp-Papadimitriou-Shenker via
# DataFrame.stat.freqItems): single-pass, mergeable, guaranteed
# SUPERSET of every item with support > s.  Like the HLL and
# approx_percentile entries, the sketch's raw output is
# engine-specific (it admits false positives), so the catalog query
# applies the contract: intersect the sketch superset with exact
# counts and emit the exactly-frequent items — which the superset
# guarantee makes equal to the exact answer, turning the sketch
# itself into an oracle-checkable operator.
_FREQ_SUPPORT = 0.009  # key-bucket share cutoff (uniform share is ~1%)


def a_freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    superset_rows = (
        orders.select((F.col("o_custkey") % 100).alias("k"))
        .stat.freqItems(["k"], _FREQ_SUPPORT)
        .collect()[0][0]
    )
    exact = orders.groupBy((F.col("o_custkey") % 100).alias("k")).agg(
        F.count("*").alias("cnt")
    )
    # total as a 1-row broadcast — the freqItems sketch collect above is
    # the only driver action (bounded superset list); no count() rescan
    tot = orders.agg(F.count("*").alias("n"))
    return (
        exact.filter(F.col("k").isin([int(x) for x in superset_rows]))
        .join(F.broadcast(tot))
        .filter(F.col("cnt") > F.lit(_FREQ_SUPPORT) * F.col("n"))
        .select(
            "k",
            "cnt",
            F.round(F.col("cnt") / F.col("n").cast("double"), 6).alias("support"),
        )
        .orderBy("k")
    )


register(
    Query(
        name="a_freq_items_sketch",
        build=a_freq_items_sketch,
        oracle=f"""
        WITH counts AS (
            SELECT o_custkey % 100 AS k, count(*) AS cnt FROM orders GROUP BY 1
        ), tot AS (SELECT count(*) AS n FROM orders)
        SELECT k, cnt, round(CAST(cnt AS DOUBLE) / n, 6) AS support
        FROM counts CROSS JOIN tot
        WHERE cnt > {_FREQ_SUPPORT} * n
        ORDER BY k
        """,
        doc="heavy hitters via the freqItems sketch + superset contract: sketch ∩ exact == exact frequent set",
        tags=("agg", "sketch"),
    )
)


# -------------------------------------------------- approx top-k items
# Spark 4's approx_top_k sketch.  Below sketch capacity
# (maxItemsTracked, default 10k) the counts are EXACT, so over a
# bounded-cardinality column the operator is fully oracle-checkable —
# the honest framing of every sketch in this catalog: prove exactness
# where the sketch guarantees it, unit-test the approximation regime.
def a_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.expr("approx_top_k(event_type, 5)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").alias("cnt"),
        )
        .orderBy(F.col("cnt").desc(), "event_type")
    )


register(
    Query(
        name="a_approx_top_k",
        build=a_approx_top_k,
        oracle="""
        SELECT event_type, count(*) AS cnt
        FROM events GROUP BY event_type
        ORDER BY cnt DESC, event_type
        """,
        doc="approx_top_k sketch, exact below tracked capacity — oracled against the exact group counts",
        tags=("agg", "sketch"),
    )
)
