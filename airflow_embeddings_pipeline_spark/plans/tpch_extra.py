"""TPC-H breadth pack: Q8, Q12, Q13, Q14, Q15, Q19, Q21, Q22.

Together with plans/analytics.py (Q1/3/4/5/6/7/10/17/18) and
plans/tpch_partsupp.py (Q2/9/11/16/20 over a deterministically
synthesized ``partsupp``) this covers all 22 TPC-H query shapes.

The fixture schema trims some TPC-H columns; where a query's textbook
predicate needs a missing column the predicate is adapted but the
query's *shape* — the part Catalyst has to optimize — is preserved:

- Q12: no l_shipmode/l_commitdate/l_receiptdate → groups by a derived
  ship-delay bucket instead of shipmode; same join + CASE-pivot shape.
- Q19: no p_container → brand × size × quantity disjunction; same
  equi-join-with-disjunctive-residual shape.
- Q21: no l_receiptdate/l_commitdate → "late" is shipdate > orderdate
  + 90 days; same exists/not-exists double-correlation.
- Q22: no c_phone → country code is c_nationkey % 10; same
  scalar-avg-subquery + anti-join shape.

Scale notes inline; dims (part/supplier/nation/region) broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import Query, register


def _disc_price() -> F.Column:
    # Exact decimal so the sum is order-independent across engines.
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )


# ------------------------------------------------------------ TPC-H Q8
# National market share: 7-table join (part, supplier, lineitem,
# orders, customer, nation×2, region) with a conditional-share
# aggregate.  Only lineitem/orders/customer are big; part and both
# nation copies and region broadcast, so the plan is fact-fact joins
# on (l_partkey pre-filtered by the broadcast part semi, l_orderkey,
# o_custkey) with every dim lookup map-side — at 100 TB the two fact
# shuffles are the only data movement.
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    vol = (
        # part scales with SF (200k rows x SF) -- unhinted; AQE
        # broadcasts at fixture scale, shuffle-joins past the limit.
        li.join(part.filter(F.col("p_type") == "PROMO"),
                li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("cn_rkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1997-12-31 00:00:00").cast("timestamp"),
            )
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "nation",
        )
    )
    share = (
        F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(18,4)"))) / F.sum("volume")
    )
    return (
        vol.groupBy("o_year")
        .agg(F.round(share, 6).cast("double").alias("mkt_share"))
        .orderBy("o_year")
    )


register(
    Query(
        name="q8_market_share",
        build=q8_market_share,
        oracle="""
        SELECT o_year,
               CAST(round(sum(CASE WHEN nation = 'NATION_3' THEN volume
                                   ELSE CAST(0 AS DECIMAL(18,4)) END)
                          / sum(volume), 6) AS DOUBLE) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                       AS volume,
                   n2.n_name AS nation
            FROM part, supplier, lineitem, orders, customer,
                 nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
              AND s_nationkey = n2.n_nationkey
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                  AND TIMESTAMP '1997-12-31 00:00:00'
              AND p_type = 'PROMO'
        ) all_nations
        GROUP BY o_year ORDER BY o_year
        """,
        doc="TPC-H Q8: national market share through a 7-table join, all dims broadcast",
        tags=("tpch",),
        bench=True,
    )
)


# ------------------------------------------------------------ TPC-H Q12
# Shipmode/priority pivot, adapted: fixture lineitem has no shipmode or
# commit/receipt dates, so rows group by ship-delay bucket
# (days between order and ship date) — same orders⋈lineitem join and
# CASE-conditional counts, 3 output rows.  Map-side combine collapses
# the shuffle to ~3 rows per partition at any scale.
def q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff("l_shipdate", "o_orderdate")
    bucket = (
        F.when(delay <= 30, "0-30")
        .when(delay <= 90, "31-90")
        .otherwise(">90")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


register(
    Query(
        name="q12_ship_delay",
        build=q12_ship_delay,
        oracle="""
        SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30'
                    WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN '31-90'
                    ELSE '>90' END AS delay_bucket,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY delay_bucket ORDER BY delay_bucket
        """,
        doc="TPC-H Q12 (delay-bucket adaptation): join + CASE-pivot priority counts",
        tags=("tpch",),
    )
)


# ------------------------------------------------------------ TPC-H Q13
# Customer order-count distribution: LEFT OUTER join with a predicate
# on the *right* side (must stay in the join condition, not a WHERE —
# a WHERE would turn the outer join inner and drop 0-order customers),
# then a double aggregation.  The second groupBy keys on c_count
# (small domain) so the second shuffle is tiny.
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


register(
    Query(
        name="q13_customer_distribution",
        build=q13_customer_distribution,
        oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
        """,
        doc="TPC-H Q13: outer join with join-condition filter + double aggregation",
        tags=("tpch",),
    )
)


# ------------------------------------------------------------ TPC-H Q14
# Promo revenue share: lineitem ⋈ broadcast part over one ship month,
# conditional-share aggregate to a single row.  The month filter is
# pushed to the parquet scan; part never shuffles.
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    promo = F.when(
        F.col("p_type") == "PROMO", _disc_price()
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
        )
        .join(part, li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(_disc_price()), 6)
            .cast("double")
            .alias("promo_revenue")
        )
    )


register(
    Query(
        name="q14_promo_revenue",
        build=q14_promo_revenue,
        oracle="""
        SELECT CAST(round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                   ELSE CAST(0 AS DECIMAL(18,4)) END)
               / sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))),
               6) AS DOUBLE) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
        """,
        doc="TPC-H Q14: promo revenue share, month filter pushed down, part broadcast",
        tags=("tpch",),
    )
)


# ------------------------------------------------------------ TPC-H Q15
# Top supplier: quarterly revenue per supplier, then keep suppliers at
# the global max.  The max is a 1-row aggregate of the (tiny, ≤|supplier|)
# revenue relation — broadcast back as a cross join, so no second
# shuffle; ties all surface (same as the SQL's = subquery).
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).alias("total_rev"))
    )
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.join(F.broadcast(top), F.col("total_rev") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


register(
    Query(
        name="q15_top_supplier",
        build=q15_top_supplier,
        oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                       AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_rev = (SELECT max(total_rev) FROM revenue)
        ORDER BY s_suppkey
        """,
        doc="TPC-H Q15: revenue view + scalar-max subquery as a broadcast join",
        tags=("tpch", "subquery"),
    )
)


# ------------------------------------------------------------ TPC-H Q19
# Disjunctive brand/size/quantity predicate (p_container is not in the
# fixture schema; the three-arm OR keeps the shape).  The join itself
# stays a clean broadcast equi-join on l_partkey; the disjunction is a
# residual filter evaluated map-side after the hash probe — Catalyst
# must NOT fall back to a nested-loop join here (explain_audit checks).
def q19_brand_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    arm1 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(arm1 | arm2 | arm3).agg(
        F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


register(
    Query(
        name="q19_brand_quantity",
        build=q19_brand_quantity,
        oracle="""
        SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
        """,
        doc="TPC-H Q19 (no-container adaptation): disjunctive residual over an equi-join",
        tags=("tpch",),
    )
)


# ------------------------------------------------------------ TPC-H Q21
# Suppliers who kept orders waiting ("late" = shipped >90 days after
# the order date; the fixture has no commit/receipt dates).  The SQL
# shape is exists(other supplier on the order) AND NOT exists(other
# *late* supplier) — the oracle states it literally.  The Spark plan
# uses the aggregation formulation instead: per order, count distinct
# suppliers and distinct late suppliers, keep orders with >1 supplier
# exactly 1 of them late, then attribute to that late supplier.  Same
# relation, ONE shuffle on l_orderkey instead of two correlated
# self-joins — at 100 TB the self-join formulation re-shuffles
# lineitem twice and the agg form wins; passing the literal-SQL oracle
# proves the rewrite sound.
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.datediff("l_shipdate", "o_orderdate") > 90
    # r11: two-level aggregation instead of two COUNT(DISTINCT)s.  The
    # distinct aggregates compiled to an Expand (3× the shuffle rows)
    # plus TWO exchanges; grouping by (orderkey, suppkey) first makes
    # every distinct a plain count, and because hash(l_orderkey)
    # clusters BOTH group-bys, one explicit repartition serves the two
    # aggregations — one exchange, no Expand, map-side partial
    # aggregation intact (guide §2.3/§2.4).  Values identical:
    # n_supp = distinct suppliers = rows per order after the first
    # group-by; n_late = distinct late suppliers = sum of any_late;
    # n_late_lines = total late lines = sum of the per-supplier sums.
    per_os = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(late.cast("long")).alias("any_late"),
            F.sum(late.cast("long")).alias("n_late_lines_s"),
        )
    )
    per_order = (
        per_os.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum("any_late").alias("n_late"),
            F.max(F.when(F.col("any_late") == 1, F.col("l_suppkey"))).alias(
                "late_supp"
            ),
            # SQL's count(*) ranges over l1 = the late supplier's late
            # lineitems, so carry that multiplicity, not 1 per order.
            F.sum("n_late_lines_s").alias("n_late_lines"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        per_order.join(supp, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


register(
    Query(
        name="q21_waiting_supplier",
        build=q21_waiting_supplier,
        oracle="""
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
          AND date_diff('day', o_orderdate, l1.l_shipdate) > 90
          AND EXISTS (
              SELECT * FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT * FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND date_diff('day', o_orderdate, l3.l_shipdate) > 90)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
        """,
        doc=(
            "TPC-H Q21 (shipdate-lag adaptation): exists/not-exists oracle vs "
            "single-shuffle aggregation rewrite"
        ),
        tags=("tpch", "subquery"),
        bench=True,
    )
)


# ------------------------------------------------------------ TPC-H Q22
# Global sales opportunity (country code adapted to c_nationkey % 10;
# no c_phone in the fixture): rich idle customers with no *recent*
# orders — the fixture generator gives every customer at least one
# lifetime order, so the anti-join target is orders since 2000-01-01
# (textbook Q22 anti-joins all of orders; shape is identical).
# Three pieces: a scalar threshold over positive-balance customers in
# the code set (computed as exact decimal SUM + COUNT and compared as
# c_acctbal * cnt > sum — integer-exact, no float-division boundary
# drift between engines), broadcast to the filter; then a left ANTI
# join against orders (one shuffle on custkey); then a tiny groupBy on
# cntrycode.
_Q22_CODES = (1, 3, 5, 7)


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    code = (F.col("c_nationkey") % 10).alias("cntrycode")
    in_codes = (F.col("c_nationkey") % 10).isin(*_Q22_CODES)
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    thresh = (
        cust.filter(in_codes & (F.col("c_acctbal") > 0.0))
        .agg(F.sum(bal).alias("bal_sum"), F.count("*").alias("bal_cnt"))
    )
    rich = (
        cust.filter(in_codes)
        .join(F.broadcast(thresh))
        .filter(bal * F.col("bal_cnt") > F.col("bal_sum"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        rich.join(recent, rich["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy(code)
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(bal), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


register(
    Query(
        name="q22_sales_opportunity",
        build=q22_sales_opportunity,
        oracle=f"""
        WITH pool AS (
            SELECT c_custkey, c_nationkey % 10 AS cntrycode,
                   CAST(c_acctbal AS DECIMAL(18,2)) AS bal
            FROM customer WHERE c_nationkey % 10 IN {_Q22_CODES}
        ), t AS (
            SELECT sum(bal) AS bal_sum, count(*) AS bal_cnt
            FROM pool WHERE bal > 0
        )
        SELECT cntrycode, count(*) AS numcust,
               CAST(round(sum(bal), 2) AS DOUBLE) AS totacctbal
        FROM pool, t
        WHERE bal * bal_cnt > bal_sum
          AND NOT EXISTS (SELECT * FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY cntrycode ORDER BY cntrycode
        """,
        doc=(
            "TPC-H Q22 (nationkey-code adaptation): scalar avg threshold "
            "(integer-exact compare) + anti join"
        ),
        tags=("tpch", "subquery"),
    )
)
