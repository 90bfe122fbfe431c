"""PySpark-native analytics engine with the query and data-processing
capabilities of roble-chris/airflow-embeddings-pipeline.

Brand-new, Spark-first implementation: the reference's Airflow-task /
per-row-Python / remote-Snowflake-SQL substrate is replaced by DataFrame
plans optimized by Catalyst.  See SURVEY.md for the operator inventory
this package covers (reference file:line citations live in each module's
docstrings).

Layout:
    session       SparkSession factory tuned for local[N] and cluster scale
    schemas       canonical StructTypes (the engine's data contract)
    sources/      readers (parquet registry, state store) and sinks
    functions/    scalar expression library (F1-F12 of SURVEY §2.7)
    operators/    relational operators (dedup, joins, merge upsert)
    plans/        composed query plans (flagship pipeline, analytics suite)
    streaming/    incremental/watermark runtime + structured streaming
    extensions/   LLM-data-pipeline operators (dedup, similarity, text, multimodal)
"""

__version__ = "0.1.0"


def __getattr__(name: str):
    # Lazy top-level conveniences (keep `import airflow_embeddings_pipeline_spark`
    # free of a SparkSession / pyspark import cost until actually used).
    if name == "Engine":
        from .engine import Engine

        return Engine
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    if name == "get_catalog":
        from .plans import get_catalog

        return get_catalog
    raise AttributeError(name)
