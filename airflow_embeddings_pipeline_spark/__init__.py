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
