"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's query catalog
(``airflow_embeddings_pipeline_spark.plans.catalog``): every operator
from SURVEY.md §2 (and the §2.9 extensions) registers a Spark builder
plus, when SQL-expressible, the equivalent DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from airflow_embeddings_pipeline_spark.plans import get_catalog

    return get_catalog()["flagship_merge_pipeline"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from airflow_embeddings_pipeline_spark.plans import get_catalog

    return {name: q.build for name, q in get_catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from airflow_embeddings_pipeline_spark.plans import get_catalog

    return {
        name: q.oracle for name, q in get_catalog().items() if q.oracle is not None
    }
