"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the shuffle entirely — at 100 TB this converts the dominant
cost of repeated fact-fact joins into a one-time write-side layout
choice (SURVEY §4 'partition-parallelism' row; pyspark guide
'bucketing')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # saveAsTable writes under spark.sql.warehouse.dir (static conf;
    # defaults to ./spark-warehouse, gitignored); tables dropped below.
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, lineitem_b = bucketed
    # disable broadcast so the planner must pick a shuffled join
    # strategy — which bucketing then satisfies without any exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders_b.join(lineitem_b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: both sides read bucket-aligned, no shuffle
        assert "Exchange hashpartitioning" not in plan, plan
        # the property under test is shuffle-freedom, not the specific
        # shuffle-join flavor: with preferSortMergeJoin=false (r11) the
        # planner may legally satisfy the bucket distribution with a
        # shuffled-hash join instead of sort-merge
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan

        expect = orders_b.join(lineitem_b.hint("shuffle_hash"), "o_orderkey").count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_on_key_filter(spark, bucketed):
    orders_b, _ = bucketed
    key = orders_b.select(F.min("o_orderkey")).collect()[0][0]
    # autoBucketedScan drops the bucketed layout for plans that don't
    # need the distribution, which also forfeits pruning — pin it on
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        one = orders_b.filter(F.col("o_orderkey") == key)
        plan = one._jdf.queryExecution().executedPlan().toString()
        # bucket pruning: only 1 of 8 buckets is scanned
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert one.count() >= 1
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
