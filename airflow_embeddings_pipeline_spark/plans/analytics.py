"""Analytics suite — TPC-H-style queries over the fixture star schema.

These are the bench headliners: classic scan-heavy aggregation, join
chains, and top-k patterns that exercise the engine the way a 100 TB
warehouse would.  All aggregates over doubles run through exact DECIMAL
arithmetic (order-independent) and are cast back to DOUBLE for output.

Scale notes per query are inline; `.explain("formatted")` on each shows
filters pushed to the parquet scan, broadcast joins for the dims, and
single-shuffle aggregations inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import Query, register


def _dec(col: str, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal(18,{scale})")


# ------------------------------------------------------------------ Q1
# Pricing summary: full lineitem scan, 2-key groupBy, 8 aggregates.
# At 100 TB this is the map-side-partial-agg showcase: 6 distinct
# (returnflag, linestatus) groups mean the shuffle carries ~6 rows per
# input partition regardless of input size.
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    charge = disc_price * (1 + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(F.avg(_dec("l_quantity")), 6).cast("double").alias("avg_qty"),
            F.round(F.avg(_dec("l_extendedprice")), 6).cast("double").alias("avg_price"),
            F.round(F.avg(_dec("l_discount")), 6).cast("double").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(
    Query(
        name="q1_pricing_summary",
        build=q1_pricing_summary,
        oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
               CAST(round(avg(CAST(l_quantity AS DECIMAL(18,2))), 6) AS DOUBLE) AS avg_qty,
               CAST(round(avg(CAST(l_extendedprice AS DECIMAL(18,2))), 6) AS DOUBLE) AS avg_price,
               CAST(round(avg(CAST(l_discount AS DECIMAL(18,2))), 6) AS DOUBLE) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
        doc="TPC-H Q1 pricing summary: scan-heavy multi-aggregate",
        tags=("A3", "A4", "bench"),
        bench=True,
    )
)


# ------------------------------------------------------------------ Q3
# Shipping-priority top-k: fact-fact join + dim filter + top-10 by
# exact-decimal revenue (deterministic ranking; doubles could flip
# near-equal ranks between engines).
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


register(
    Query(
        name="q3_top_orders",
        build=q3_top_orders,
        oracle="""
        SELECT l_orderkey, o_orderdate,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """,
        doc="TPC-H Q3 shipping priority: join chain + deterministic top-k",
        tags=("J1", "O4", "bench"),
        bench=True,
    )
)


# ------------------------------------------------------------------ Q5
# Local-supplier revenue: 6-table join where customer and supplier must
# share a nation — the join-order/broadcast showcase.
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        # supplier/customer scale with SF -- strategy left to AQE
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(cust["c_nationkey"] == supp["s_nationkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


register(
    Query(
        name="q5_nation_revenue",
        build=q5_nation_revenue,
        oracle="""
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
        """,
        doc="TPC-H Q5 local-supplier revenue: multi-join + broadcast dims",
        tags=("J1", "bench"),
        bench=True,
    )
)


# ------------------------------------------------------------------ Q6
# Forecast revenue change: pure filter + single aggregate — the
# predicate-pushdown showcase (no shuffle at all after AQE).
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


register(
    Query(
        name="q6_forecast_revenue",
        build=q6_forecast_revenue,
        oracle="""
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
        doc="TPC-H Q6 forecast revenue: pushdown filter + single agg",
        tags=("P4", "A4", "bench"),
        bench=True,
    )
)


# ------------------------------------------------------------------ Q10-ish
# Returned-item customers: who returned the most revenue.
def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue, 2).cast("double").alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


register(
    Query(
        name="q10_returned_customers",
        build=q10_returned_customers,
        oracle="""
        SELECT c_custkey, c_name, n_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS lost_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY lost_revenue DESC, c_custkey
        LIMIT 20
        """,
        doc="TPC-H Q10 returned-item report: top-k customers by lost revenue",
        tags=("J1", "O4", "bench"),
        bench=True,
    )
)


# ------------------------------------------------------------- cube/rollup
# Grouping-sets coverage (SURVEY §2.4 'not present' list — parity-plus).
def a_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("revenue"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


register(
    Query(
        name="a_rollup_orders",
        build=a_rollup_orders,
        oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """,
        doc="ROLLUP grouping sets over orders (parity-plus aggregation)",
        tags=("A3", "A4"),
    )
)


# ------------------------------------------------------------- TPC-H Q4
# EXISTS correlated subquery → Catalyst decorrelates to a left-semi
# join (no per-row subquery execution; one shuffle on the join key).
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    orders.createOrReplaceTempView("__q4_orders")
    li.createOrReplaceTempView("__q4_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM __q4_orders
        WHERE o_orderdate >= timestamp'1995-01-01 00:00:00'
          AND o_orderdate < timestamp'1995-07-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM __q4_lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


register(
    Query(
        name="q4_order_priority",
        build=q4_order_priority,
        oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
        doc="TPC-H Q4: EXISTS correlated subquery (decorrelated to left-semi join)",
        tags=("J1", "subquery"),
    )
)


# ------------------------------------------------------------ TPC-H Q17
# Scalar correlated subquery (per-part average) → decorrelated into an
# aggregate + equi-join; the naive plan would re-scan lineitem per part.
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    part.createOrReplaceTempView("__q17_part")
    li.createOrReplaceTempView("__q17_lineitem")
    return spark.sql(
        """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
                    AS DOUBLE) AS avg_yearly
        FROM __q17_lineitem l JOIN __q17_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l_quantity) FROM __q17_lineitem
              WHERE l_partkey = p.p_partkey
          )
        """
    )


register(
    Query(
        name="q17_small_quantity",
        build=q17_small_quantity,
        oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem
          WHERE l_partkey = p.p_partkey
      )
    """,
        doc="TPC-H Q17: scalar correlated subquery (decorrelated to agg + join)",
        tags=("subquery",),
    )
)


# -------------------------------------------------------- percentiles
# Exact distribution statistics per group: Spark's `percentile` (exact,
# linear interpolation — same definition as DuckDB's quantile_cont) and
# the min/max frame.  Exact percentiles need a per-group sort; at
# 100 TB the approx_percentile sketch (a_approx_distinct's cousin) is
# the mergeable map-side path — kept exact here for oracle parity.
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = lambda q: F.round(  # noqa: E731
        F.expr(f"percentile(l_extendedprice, {q})"), 4
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            p(0.5).alias("p50"),
            p(0.9).alias("p90"),
            p(0.99).alias("p99"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
        .orderBy("l_returnflag")
    )


register(
    Query(
        name="a_percentiles",
        build=a_percentiles,
        oracle="""
        SELECT l_returnflag, count(*) AS n,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
               round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
               round(min(l_extendedprice), 2) AS lo,
               round(max(l_extendedprice), 2) AS hi
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        doc="exact per-group percentiles (p50/p90/p99) + extrema",
        tags=("agg", "percentile"),
    )
)


# ------------------------------------------------------------ TPC-H Q18
# Large-volume orders: IN-subquery over a grouped HAVING — Catalyst
# rewrites the IN as a left-semi join against the aggregated subquery
# (one extra shuffle on l_orderkey, no per-row subquery).
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


register(
    Query(
        name="q18_large_orders",
        build=q18_large_orders,
        oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem
              GROUP BY l_orderkey
              HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
        """,
        doc="TPC-H Q18: IN-over-grouped-HAVING rewritten to semi-join, large-volume orders",
        tags=("subquery", "tpch"),
    )
)


# ------------------------------------------------------------- TPC-H Q7
# Volume shipping between two nations: both trade directions through a
# 6-table join, grouped by (supp_nation, cust_nation, year).  Both
# nation dims broadcast; the or-of-two-directions predicate rides the
# join condition.
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


register(
    Query(
        name="q7_volume_shipping",
        build=q7_volume_shipping,
        oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
        """,
        doc="TPC-H Q7: two-direction nation trade volume through a 6-table join, dims broadcast",
        tags=("tpch",),
    )
)


# -------------------------------------------------------- GROUPING SETS
# Explicit GROUPING SETS beyond ROLLUP/CUBE: an arbitrary set list —
# (status), (priority), and the grand total — in ONE pass (Catalyst
# expands to a single Expand + hash aggregate, not three scans).
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS revenue,
               grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


register(
    Query(
        name="a_grouping_sets",
        build=a_grouping_sets,
        oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS revenue,
               grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """,
        doc="explicit GROUPING SETS (arbitrary set list, one Expand pass; beyond ROLLUP/CUBE)",
        tags=("agg", "grouping-sets"),
    )
)


# ------------------------------------------------- exact moment statistics
# Distributed stddev / correlation computed from EXACT decimal moments:
# Σx, Σy, Σx², Σy², Σxy as decimal sums (order-independent — fixture
# values carry ≤2 decimals, so the decimal cast is lossless), combined
# into the closed-form statistics in float only at the very end.  The
# built-in stddev/corr one-pass aggregates are the right call in
# isolation, but their float accumulation order makes the low bits
# partition-count-dependent — unacceptable when bit-stable results
# must hash-match across engines or reruns.  Same single map-side-
# combined aggregation shape as any groupBy.
def a_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = (sxx - sx * sx / n) / (n - 1)
    var_y = (syy - sy * sy / n) / (n - 1)
    cov = (sxy - sx * sy / n) / (n - 1)
    return agg.select(
        "l_returnflag",
        "n",
        F.round(F.sqrt(var_x), 6).alias("stddev_qty"),
        F.round(F.sqrt(var_y), 6).alias("stddev_price"),
        F.round(cov / (F.sqrt(var_x) * F.sqrt(var_y)), 6).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


register(
    Query(
        name="a_stats_exact",
        build=a_stats_exact,
        oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
                   sum(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
                   sum(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)^2 / n)
                          / (n - 1)), 6) AS stddev_qty,
               round(sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)^2 / n)
                          / (n - 1)), 6) AS stddev_price,
               round(((CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1))
                     / (sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)^2 / n)
                             / (n - 1))
                        * sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)^2 / n)
                               / (n - 1))), 6) AS corr_qty_price
        FROM m ORDER BY l_returnflag
        """,
        doc=(
            "distributed stddev/correlation from exact decimal moments "
            "(order-independent, bit-stable across engines and reruns)"
        ),
        tags=("agg", "stats"),
    )
)
