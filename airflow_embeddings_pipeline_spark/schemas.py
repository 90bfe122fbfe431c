"""Canonical schemas — the engine's data contract (SURVEY §1).

The reference is schemaless on the read side (every Mongo access is
``doc.get(k, default)``, reference embeddings-pipeline.py:185-227),
schema-inferred in the middle, and fixed-DDL on the write side
(CONFIGURATION.md:100-112).  Spark-first design inverts that: declare
the contract once, read permissively against it, and make every cast an
explicit projection.
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBEDDING_DIM = 128  # VECTOR(FLOAT, 128) — CONFIGURATION.md:109

# Pipeline input: MongoDB-collection analog (FIXTURES.md §1).
SOURCE_DOCUMENTS = T.StructType(
    [
        T.StructField("_id", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("cleaned_ref", T.StringType(), True),
        T.StructField("color", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("country", T.ArrayType(T.StringType()), True),
        T.StructField("embeddings", T.ArrayType(T.FloatType()), True),
        T.StructField("embeddings_type", T.StringType(), True),
        T.StructField("for_matching", T.BooleanType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)

# Dimension table joined for the surrogate key (embeddings-pipeline.py:325-326).
SOURCES_CONFIG = T.StructType(
    [
        T.StructField("display_name", T.StringType(), False),
        T.StructField("display_name_id", T.LongType(), False),
    ]
)

# MERGE target — Snowflake EMBEDDINGS analog (CONFIGURATION.md:100-112).
# original_timestamp is deliberately a STRING: ISO-8601 strings sort
# lexicographically as timestamps, which the window dedup relies on
# (embeddings-pipeline.py:227,317,323).
EMBEDDINGS_TARGET = T.StructType(
    [
        T.StructField("cleaned_ref", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("main_refco", T.StringType(), False),
        T.StructField("display_name", T.StringType(), True),
        T.StructField("display_name_id", T.LongType(), True),
        T.StructField("embeddings_type", T.StringType(), True),
        T.StructField("for_matching", T.BooleanType(), True),
        T.StructField("embedding_vector", T.ArrayType(T.FloatType()), True),
        T.StructField("original_timestamp", T.StringType(), True),
        T.StructField("embedding_inserted_at", T.TimestampType(), True),
    ]
)

MERGE_KEY = "main_refco"  # embeddings-pipeline.py:328
DEDUP_ORDER_COLUMN = "original_timestamp"  # embeddings-pipeline.py:323

# Driver fixture tables (TESTDATA.md / FIXTURES.md §5).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
