"""End-to-end pipeline semantics that the SQL oracle can't see:
the CURRENT_TIMESTAMP audit column and replay idempotency of the
full staged-batch merge (embeddings-pipeline.py:318, T4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators.merge import merge_upsert
from airflow_embeddings_pipeline_spark.plans.pipeline import (
    _source_documents,
    _transform,
)


def test_transform_shapes(spark, sf_dir):
    src = _source_documents(spark, sf_dir)
    out = _transform(src)
    assert out.columns == [
        "doc_id",
        "cleaned_ref",
        "category",
        "main_refco",
        "display_name",
        "original_timestamp",
    ]
    row = out.orderBy("doc_id").first()
    # ISO strings sort lexicographically as timestamps (W1 dependency)
    assert "T" in row["original_timestamp"]


def test_audit_column_stamped_at_merge(spark):
    target = spark.createDataFrame(
        [("k1", "a", None)], schema="main_refco string, v string, inserted_at timestamp"
    )
    staged = spark.createDataFrame(
        [("k1", "b"), ("k2", "c")], schema="main_refco string, v string"
    )
    # F9: stamp at merge time (embeddings-pipeline.py:318)
    stamped = staged.withColumn("inserted_at", F.current_timestamp())
    out = merge_upsert(target, stamped, "main_refco")
    rows = {r["main_refco"]: r for r in out.collect()}
    assert rows["k1"]["inserted_at"] is not None
    assert rows["k2"]["inserted_at"] is not None


def test_pipeline_merge_replay_idempotent(spark, sf_dir):
    from airflow_embeddings_pipeline_spark.plans.pipeline import pipeline_e2e_merge

    once = pipeline_e2e_merge(spark, sf_dir).collect()
    twice = pipeline_e2e_merge(spark, sf_dir).collect()
    assert once == twice
