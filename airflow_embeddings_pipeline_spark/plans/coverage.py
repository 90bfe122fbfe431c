"""Coverage battery: analytic window functions, grouping sets,
string/array scalar functions, skew-salted join, approximate distinct.

These go beyond the reference's own operator surface (SURVEY §2.4-2.7
"not present" lists) so the engine is a complete destination, not a
1:1 parity shim.  Each is oracle-checked except the HLL sketch, whose
estimate is engine-specific by construction (rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import Query, register


# ------------------------------------------------------ window battery
# lag/lead/rank/dense_rank/ntile over each customer's order history —
# every analytic function SURVEY §2.5 lists as absent-but-built-in.
def w_analytics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
                2,
            )
            .cast("double")
            .alias("running_sum_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


register(
    Query(
        name="w_analytics_battery",
        build=w_analytics_battery,
        oracle="""
        SELECT o_custkey, o_orderkey,
               round(o_totalprice, 2) AS price,
               lag(o_orderkey) OVER w AS prev_order,
               lead(o_orderkey) OVER w AS next_order,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                     OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                   AS running_sum_price
        FROM orders WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
        """,
        doc="lag/lead/rank/dense_rank/ntile/rolling-avg analytic battery (§2.5 parity-plus)",
        tags=("window",),
    )
)


# ---------------------------------------------------------------- cube
def a_cube_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.grouping_id("l_returnflag", "l_linestatus").alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


register(
    Query(
        name="a_cube_metrics",
        build=a_cube_metrics,
        oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
               grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus
        """,
        doc="CUBE with grouping_id (§2.4 parity-plus; one shuffle, grouping-set expansion map-side)",
        tags=("agg", "cube"),
    )
)


# ------------------------------------------------------- string battery
def f_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.upper("p_name").alias("upper_name"),
            F.length("p_name").alias("name_len"),
            F.substring("p_brand", 1, 6).alias("brand_prefix"),
            F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
            F.translate("p_name", " ", "_").alias("snake_name"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            # split→array_join round-trip: exercises the array op but
            # emits a string (the driver's comparator can't hash lists).
            F.array_join(F.split("p_type", " "), "|").alias("type_words"),
            F.concat_ws("::", "p_brand", "p_type").alias("brand_type"),
            F.levenshtein("p_brand", F.lit("Brand#11")).alias("brand_dist"),
        )
        .orderBy("p_partkey")
    )


register(
    Query(
        name="f_string_battery",
        build=f_string_battery,
        oracle="""
        SELECT p_partkey,
               upper(p_name) AS upper_name,
               length(p_name) AS name_len,
               substring(p_brand, 1, 6) AS brand_prefix,
               regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
               replace(p_name, ' ', '_') AS snake_name,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
               array_to_string(string_split(p_type, ' '), '|') AS type_words,
               concat_ws('::', p_brand, p_type) AS brand_type,
               levenshtein(p_brand, 'Brand#11') AS brand_dist
        FROM part WHERE p_partkey <= 500 ORDER BY p_partkey
        """,
        doc="string scalar-function battery (§2.7 parity-plus)",
        tags=("scalar", "string"),
    )
)


# -------------------------------------------------------- array battery
def f_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    return (
        emb.filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
            F.exists(v, lambda x: x > 2.0).alias("has_large"),
            F.round(F.element_at(F.array_sort(v), -1), 6).alias("max_component"),
            F.round(F.element_at(F.array_sort(v), 1), 6).alias("min_component"),
            F.round(
                F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
            ).alias("head_sum"),
            F.size(F.array_distinct(F.transform(v, lambda x: (x > 0).cast("int"))))
            .alias("sign_cardinality"),
        )
        .orderBy("vec_id")
    )


register(
    Query(
        name="f_array_battery",
        build=f_array_battery,
        oracle="""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings WHERE vec_id < 100
        )
        SELECT vec_id,
               len(list_filter(e, x -> x > 0)) AS n_positive,
               CAST(len(list_filter(e, x -> x > 2.0)) > 0 AS BOOLEAN) AS has_large,
               round(list_sort(e)[-1], 6) AS max_component,
               round(list_sort(e)[1], 6) AS min_component,
               round(list_sum(e[1:8]), 6) AS head_sum,
               len(list_distinct(list_transform(e, x -> CAST(x > 0 AS INT))))
                   AS sign_cardinality
        FROM v ORDER BY vec_id
        """,
        doc="higher-order array function battery (filter/exists/aggregate/sort/distinct)",
        tags=("scalar", "array"),
    )
)


# ----------------------------------------------------- salted skew join
# Same answer as a plain join — proven by sharing the plain-join oracle
# — but executed with the high-frequency keys salted: hot keys split
# across SALT shards (replicate the dim row per shard), so no single
# reducer owns a whole hot key.  At 100 TB this is the manual fallback
# when AQE skew-splitting can't help (e.g. skewed *broadcast-too-big*
# dims); here it's demonstrated end-to-end on the events table.
_SALT = 8


def j_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # dim: per-user tier (derived, deterministic)
    users = (
        ev.select("user_id").distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("int"))
    )
    salted_ev = ev.withColumn(
        "__salt", (F.pmod(F.hash("event_id"), F.lit(_SALT))).cast("int")
    )
    salted_users = users.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1)))
    )
    joined = salted_ev.join(salted_users, ["user_id", "__salt"])
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("tier")
    )


register(
    Query(
        name="j_salted_skew_join",
        build=j_salted_skew_join,
        oracle="""
        WITH users AS (
            SELECT DISTINCT user_id, CAST(user_id % 3 AS INT) AS tier FROM events
        )
        SELECT tier, count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        FROM events JOIN users USING (user_id)
        GROUP BY tier ORDER BY tier
        """,
        doc="skew-salted join (hot keys sharded across 8 salts), oracled against the unsalted join",
        tags=("join", "skew"),
        bench=True,
    )
)


# -------------------------------------------------- approximate distinct
# HLL estimates are engine-specific (different sketches in Spark and
# DuckDB), so the raw estimate is never hash-compared.  The sketch's
# ACCURACY CONTRACT is: Spark's HLL++ is deterministic for a given
# input, so "estimate within tolerance of exact" is a stable boolean
# the oracle reproduces from exact counts alone.  The gate tolerance is
# deliberately LOOSE (25% vs the sketch's configured 2% rsd): fixtures
# regenerate every round, and a probabilistic 3×rsd bound on fresh data
# would turn ordinary sketch variance into a spurious engine-correctness
# failure.  A >25% miss at rsd=0.02 is not variance — it's a broken
# sketch, and should fail the gate.  The strict 3×rsd property is
# asserted in tests/test_advanced.py where a fixture-shift is
# observable and fixable locally.
def a_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("__approx"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("__approx") - F.col("exact_users"))
            <= 0.25 * F.col("exact_users")
        )
        .cast("int")
        .alias("within_tolerance"),
    ).orderBy("event_type")


register(
    Query(
        name="a_approx_distinct_bound",
        build=a_approx_distinct_bound,
        oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               1 AS within_tolerance
        FROM events GROUP BY event_type ORDER BY event_type
        """,
        doc=(
            "HLL++ accuracy contract as a checkable fact: estimate "
            "within a loose engine-sanity tolerance of exact (sketch "
            "is deterministic per input; strict 3×rsd bound unit-tested)"
        ),
        tags=("agg", "sketch"),
    )
)


# -------------------------------------------------- two-phase salted agg
# Skewed-key aggregation: when one groupBy key holds most of the rows,
# a single shuffle sends that key's whole mass to one reducer.  The
# two-phase plan salts the key (16 shards), pre-aggregates per
# (key, salt) — map-side combine shrinks each shard — then re-combines
# per key in a second, tiny shuffle.  Algebraic aggregates only
# (count→sum, sum→sum, max→max); the oracle is the plain one-shot
# groupBy, proving the decomposition exact.  (Spark's AQE skew
# handling covers joins, not aggregations — this is the agg-side
# equivalent of j_salted_skew_join.)
_AGG_SALT = 16


def a_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn(
            "__salt", F.pmod(F.hash("event_id"), F.lit(_AGG_SALT)).cast("int")
        )
        .groupBy("event_type", "__salt")
        .agg(
            F.count("*").alias("pc"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("ps"),
            F.max("user_id").alias("pm"),
        )
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("pc").alias("n_events"),
            F.round(F.sum("ps"), 2).cast("double").alias("total_value"),
            F.max("pm").alias("max_user"),
        )
        .orderBy("event_type")
    )


register(
    Query(
        name="a_salted_skew_agg",
        build=a_salted_skew_agg,
        oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total_value,
               max(user_id) AS max_user
        FROM events GROUP BY event_type ORDER BY event_type
        """,
        doc="two-phase salted aggregation for skewed keys, oracled against the one-shot groupBy",
        tags=("agg", "skew"),
    )
)


# ----------------------------------------------------------- map type
# MapType end-to-end: parse JSON into map<string,string>, then the map
# function family — size, key/value arrays (sorted for determinism:
# map iteration order is undefined in both engines), direct key access,
# and map construction from arrays.  The one core Spark container type
# the rest of the catalog didn't yet touch.
def f_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    staged = ev.filter(F.col("event_id") < 2000).select("event_id", m.alias("m"))
    built = F.map_from_arrays(
        F.array(F.lit("id"), F.lit("k")),
        F.array(F.col("event_id").cast("string"), F.element_at(F.col("m"), "k")),
    )
    return staged.select(
        "event_id",
        F.size("m").alias("n_entries"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
        F.element_at(F.col("m"), "k").cast("long").alias("k_value"),
        F.element_at(built, "id").cast("long").alias("roundtrip_id"),
    ).orderBy("event_id")


register(
    Query(
        name="f_map_battery",
        build=f_map_battery,
        oracle="""
        SELECT event_id,
               len(json_keys(props)) AS n_entries,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
               event_id AS roundtrip_id
        FROM events WHERE event_id < 2000 ORDER BY event_id
        """,
        doc="MapType battery: JSON→map parse, size/keys/element access, map construction (core container-type coverage)",
        tags=("P6", "map"),
    )
)


# ------------------------------------------------------ explode_outer
# Null-preserving explode: rows whose array is EMPTY survive with a
# NULL element (plain explode silently drops them — a row-count bug
# waiting to happen in per-document pipelines).  The filter keeps only
# long tokens, so many docs genuinely produce empty arrays.
def f_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    long_toks = F.array_sort(
        F.array_distinct(
            F.filter(F.split("text", " "), lambda t: F.length(t) >= 8)
        )
    )
    return (
        docs.filter(F.col("doc_id") < 200)
        .select("doc_id", F.explode_outer(long_toks).alias("token"))
        .orderBy("doc_id", "token")
    )


register(
    Query(
        name="f_explode_outer",
        build=f_explode_outer,
        oracle="""
        SELECT d.doc_id, u.token
        FROM documents d
        LEFT JOIN LATERAL unnest(list_sort(list_distinct(
                 list_filter(string_split(d.text, ' '),
                             t -> len(t) >= 8)))) AS u(token) ON TRUE
        WHERE d.doc_id < 200
        ORDER BY doc_id, token
        """,
        doc="null-preserving explode_outer: empty arrays keep their row (vs plain explode's silent drop)",
        tags=("P6", "lateral"),
    )
)


# ------------------------------------------------------ datetime battery
# Scalar date arithmetic battery — the cross-engine trap zone: Spark's
# dayofweek is 1=Sunday while DuckDB's dow is 0=Sunday and isodow is
# 1=Monday, so the ISO day lands via explicit arithmetic on the Spark
# side and isodow on the oracle side; everything else (extract family,
# date_add, last_day, month truncation, day diffs) maps 1:1 once both
# sides speak DATE.
def f_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        orders.filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            d.cast("string").alias("order_date"),
            F.year(d).alias("y"),
            F.quarter(d).alias("q"),
            F.month(d).alias("m"),
            F.dayofmonth(d).alias("dom"),
            # ISO day-of-week, Monday=1 (Spark dayofweek is Sunday=1)
            (((F.dayofweek(d) + 5) % 7) + 1).alias("iso_dow"),
            F.date_add(d, 30).cast("string").alias("plus_30d"),
            F.last_day(d).cast("string").alias("month_end"),
            F.trunc(d, "month").cast("string").alias("month_start"),
            F.datediff(F.lit("1998-01-01").cast("date"), d).alias(
                "days_to_1998"
            ),
        )
        .orderBy("o_orderkey")
    )


register(
    Query(
        name="f_datetime_battery",
        build=f_datetime_battery,
        oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS VARCHAR) AS order_date,
               CAST(year(o_orderdate) AS INT) AS y,
               CAST(quarter(o_orderdate) AS INT) AS q,
               CAST(month(o_orderdate) AS INT) AS m,
               CAST(day(o_orderdate) AS INT) AS dom,
               CAST(isodow(o_orderdate) AS INT) AS iso_dow,
               CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR)
                   AS plus_30d,
               CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
               CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
                   AS month_start,
               CAST(date_diff('day', o_orderdate, DATE '1998-01-01') AS INT)
                   AS days_to_1998
        FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey
        """,
        doc=(
            "datetime scalar battery: extract family, ISO day-of-week "
            "(convention-bridged), date_add/last_day/trunc/datediff"
        ),
        tags=("scalar", "datetime"),
    )
)


# --------------------------------------------------------- LIKE battery
# Pattern-match family: %, _, ESCAPE'd literal wildcards, case-
# insensitive ILIKE, and NOT LIKE — semantics identical across engines
# but easy to get subtly wrong (escape handling especially), so pinned.
def f_like_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") <= 1000)
        .select(
            "p_partkey",
            F.col("p_name").like("%green%").alias("has_green"),
            F.col("p_name").like("s_o%").alias("s_blank_o_prefix"),
            F.col("p_type").ilike("%BRUSHED%").alias("brushed_any_case"),
            (~F.col("p_brand").like("Brand#1%")).alias("not_brand1x"),
            F.expr("p_type LIKE '%50!%%' ESCAPE '!'").alias("has_literal_pct"),
        )
        .orderBy("p_partkey")
    )


register(
    Query(
        name="f_like_battery",
        build=f_like_battery,
        oracle="""
        SELECT p_partkey,
               p_name LIKE '%green%' AS has_green,
               p_name LIKE 's_o%' AS s_blank_o_prefix,
               p_type ILIKE '%BRUSHED%' AS brushed_any_case,
               p_brand NOT LIKE 'Brand#1%' AS not_brand1x,
               p_type LIKE '%50!%%' ESCAPE '!' AS has_literal_pct
        FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey
        """,
        doc="LIKE/ILIKE/NOT LIKE/ESCAPE pattern battery (wildcard + escape semantics pinned)",
        tags=("scalar", "string"),
    )
)


# ------------------------------------------------------ bitwise aggregates
# bit_and / bit_or / bit_xor aggregate family over per-type event ids —
# commutative-associative integer aggregates (order-independent by
# construction, no decimal trick needed).
def a_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("bit_and(event_id)").alias("ids_and"),
            F.expr("bit_or(event_id)").alias("ids_or"),
            F.expr("bit_xor(event_id)").alias("ids_xor"),
            F.expr("bit_count(bit_or(event_id))").alias("or_popcount"),
        )
        .orderBy("event_type")
    )


register(
    Query(
        name="a_bitwise_agg",
        build=a_bitwise_agg,
        oracle="""
        SELECT event_type,
               bit_and(event_id) AS ids_and,
               bit_or(event_id) AS ids_or,
               bit_xor(event_id) AS ids_xor,
               bit_count(bit_or(event_id)) AS or_popcount
        FROM events GROUP BY event_type ORDER BY event_type
        """,
        doc="bitwise aggregate family (bit_and/or/xor + popcount; commutative, order-independent)",
        tags=("agg", "bitwise"),
    )
)


# -------------------------------------------------- map HOF battery
# Higher-order map functions over a constructed map: transform_values,
# map_filter, map_concat, and entry serialization.  Output is the
# sorted entries string so undefined map iteration order never reaches
# the comparator; the oracle computes the same strings directly from
# the base columns (the map's keys are statically known).
def f_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("id"), F.col("event_id").cast("string"),
        F.lit("type"), F.col("event_type"),
    )
    upper_m = F.transform_values(m, lambda k, v: F.upper(v))
    no_id = F.map_filter(m, lambda k, v: k != F.lit("id"))
    with_extra = F.map_concat(no_id, F.create_map(F.lit("extra"), F.lit("1")))

    def entries_str(mp):
        return F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(mp),
                    lambda e: F.concat_ws("=", e["key"], e["value"]),
                )
            ),
            ",",
        )

    return (
        ev.filter(F.col("event_id") < 1000)
        .select(
            "event_id",
            entries_str(upper_m).alias("upper_entries"),
            entries_str(with_extra).alias("filtered_plus_extra"),
            F.size(with_extra).alias("n_after"),
        )
        .orderBy("event_id")
    )


register(
    Query(
        name="f_map_hof",
        build=f_map_hof,
        oracle="""
        SELECT event_id,
               array_to_string(list_sort([
                   'id=' || upper(CAST(event_id AS VARCHAR)),
                   'type=' || upper(event_type)
               ]), ',') AS upper_entries,
               array_to_string(list_sort([
                   'type=' || event_type,
                   'extra=1'
               ]), ',') AS filtered_plus_extra,
               2 AS n_after
        FROM events WHERE event_id < 1000 ORDER BY event_id
        """,
        doc="higher-order map functions: transform_values/map_filter/map_concat, order-safe entry serialization",
        tags=("scalar", "map"),
    )
)


# --------------------------------------------- data-quality assertions
# The dbt-test / Great-Expectations surface as ONE query: each rule is
# a named aggregate over its table, union-all'd into a (rule, table,
# violations, checked) report — null rates, key uniqueness, referential
# integrity (orphaned FKs via anti-join semantics), and value-range
# contracts.  Every rule is a single agg or one broadcast-dim anti
# count; nothing scans a fact table twice, and the whole report is one
# job.  At 100 TB this is the post-load gate a warehouse pipeline runs
# before publishing a snapshot (the reference publishes MERGE results
# with no such gate — this is the missing guardrail).
def a_dq_assertions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    rules = [
        # key uniqueness: duplicates of the primary key
        orders.groupBy("o_orderkey")
        .count()
        .agg(
            F.lit("unique_key").alias("rule"),
            F.lit("orders").alias("table_name"),
            F.sum((F.col("count") > 1).cast("long")).alias("violations"),
            F.count("*").alias("checked"),
        ),
        # not-null contract
        orders.agg(
            F.lit("not_null_custkey").alias("rule"),
            F.lit("orders").alias("table_name"),
            F.sum(F.col("o_custkey").isNull().cast("long")).alias("violations"),
            F.count("*").alias("checked"),
        ),
        # referential integrity: orders.o_custkey ⊆ customer.c_custkey
        # customer scales with SF -- unhinted; AQE broadcasts at
        # fixture scale, degrades to shuffle past the broadcast limit
        orders.join(
            cust.select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        ).agg(
            F.lit("fk_orders_customer").alias("rule"),
            F.lit("orders").alias("table_name"),
            F.sum(F.col("c_custkey").isNull().cast("long")).alias("violations"),
            F.count("*").alias("checked"),
        ),
        # accepted range: discounts within [0, 0.1]
        li.agg(
            F.lit("range_discount").alias("rule"),
            F.lit("lineitem").alias("table_name"),
            F.sum(
                (~F.col("l_discount").between(0.0, 0.1)).cast("long")
            ).alias("violations"),
            F.count("*").alias("checked"),
        ),
        # cross-column contract: extendedprice positive when quantity > 0
        li.agg(
            F.lit("positive_price").alias("rule"),
            F.lit("lineitem").alias("table_name"),
            F.sum(
                ((F.col("l_quantity") > 0) & (F.col("l_extendedprice") <= 0))
                .cast("long")
            ).alias("violations"),
            F.count("*").alias("checked"),
        ),
        # freshness-ish: documents must be non-empty strings
        docs.agg(
            F.lit("non_empty_text").alias("rule"),
            F.lit("documents").alias("table_name"),
            F.sum(
                (F.col("text").isNull() | (F.length("text") == 0)).cast("long")
            ).alias("violations"),
            F.count("*").alias("checked"),
        ),
    ]
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out.withColumn(
        "passed", (F.col("violations") == 0).cast("int")
    ).orderBy("rule")


register(
    Query(
        name="a_dq_assertions",
        build=a_dq_assertions,
        oracle="""
        WITH r AS (
            SELECT 'unique_key' AS rule, 'orders' AS table_name,
                   CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
                   count(*) AS checked
            FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY o_orderkey)
            UNION ALL
            SELECT 'not_null_custkey', 'orders',
                   CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(*)
            FROM orders
            UNION ALL
            SELECT 'fk_orders_customer', 'orders',
                   CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(*)
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            UNION ALL
            SELECT 'range_discount', 'lineitem',
                   CAST(sum(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.1
                            THEN 1 ELSE 0 END) AS BIGINT),
                   count(*)
            FROM lineitem
            UNION ALL
            SELECT 'positive_price', 'lineitem',
                   CAST(sum(CASE WHEN l_quantity > 0 AND l_extendedprice <= 0
                            THEN 1 ELSE 0 END) AS BIGINT),
                   count(*)
            FROM lineitem
            UNION ALL
            SELECT 'non_empty_text', 'documents',
                   CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
                            THEN 1 ELSE 0 END) AS BIGINT),
                   count(*)
            FROM documents
        )
        SELECT rule, table_name, violations, checked,
               CASE WHEN violations = 0 THEN 1 ELSE 0 END AS passed
        FROM r ORDER BY rule
        """,
        doc=(
            "data-quality assertion battery (dbt-test shape): uniqueness, "
            "not-null, referential integrity, range and cross-column "
            "contracts as one union-all report"
        ),
        tags=("dq", "aggregation"),
    )
)
