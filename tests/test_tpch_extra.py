"""Semantic invariants for the TPC-H breadth pack (plans/tpch_extra.py).

Value-level parity is the DuckDB oracle's job (tools/check_oracle.py);
these assert the structural properties the oracles can't state —
outer-join row preservation, tie semantics, partition-of-total splits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.plans.tpch_extra import (
    q12_ship_delay,
    q13_customer_distribution,
    q14_promo_revenue,
    q15_top_supplier,
    q19_brand_quantity,
    q21_waiting_supplier,
    q22_sales_opportunity,
    q8_market_share,
)
from airflow_embeddings_pipeline_spark.sources.registry import load_table


def test_q13_preserves_zero_order_customers(spark, sf_dir):
    # LEFT join semantics: every customer appears in exactly one
    # c_count bucket, including customers whose orders were all
    # filtered out by the join condition.
    dist = q13_customer_distribution(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in dist) == n_cust


def test_q12_counts_partition_the_join(spark, sf_dir):
    rows = q12_ship_delay(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == joined


def test_q14_share_is_a_percentage(spark, sf_dir):
    [row] = q14_promo_revenue(spark, sf_dir).collect()
    assert 0.0 <= row.promo_revenue <= 100.0


def test_q15_returns_exactly_the_max_with_ties(spark, sf_dir):
    rows = q15_top_supplier(spark, sf_dir).collect()
    assert rows
    top = max(r.total_revenue for r in rows)
    assert all(r.total_revenue == top for r in rows)


def test_q21_late_supplier_is_unique_per_order(spark, sf_dir):
    # numwait counts late lineitems, so total numwait can't exceed the
    # number of late lineitems on F-status orders.
    rows = q21_waiting_supplier(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late_lines = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .filter(F.datediff("l_shipdate", "o_orderdate") > 90)
        .count()
    )
    assert sum(r.numwait for r in rows) <= late_lines


def test_q22_codes_and_threshold(spark, sf_dir):
    rows = q22_sales_opportunity(spark, sf_dir).collect()
    assert all(r.cntrycode in (1, 3, 5, 7) for r in rows)


def test_q8_share_bounded(spark, sf_dir):
    rows = q8_market_share(spark, sf_dir).collect()
    assert rows
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_q19_nonnegative(spark, sf_dir):
    [row] = q19_brand_quantity(spark, sf_dir).collect()
    assert row.n_lines >= 0
