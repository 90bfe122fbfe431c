"""Engine facade — the user-facing entry point.

A user of the reference pipeline interacts with three surfaces: the
incremental run (Airflow DAG trigger), ad-hoc SQL against the warehouse
(Snowflake), and the staged parquet files.  ``Engine`` provides all
three on Spark: registered tables + ANSI SQL via Catalyst, the query
catalog, and the incremental/streaming runtimes.

    eng = Engine.local(sf_dir="/root/testdata/sf0.01")
    eng.sql("SELECT source, count(*) FROM documents GROUP BY source")
    eng.query("x_minhash_lsh")          # any catalog query
    eng.tables()                        # registered fixture tables
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.registry import DEFAULT_SF_DIR, register_all
from .session import get_spark


class Engine:
    """Session + registered tables + query catalog, one handle."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self.registry = register_all(spark, sf_dir)

    @classmethod
    def local(
        cls, sf_dir: str = DEFAULT_SF_DIR, app_name: str = "engine", **kw
    ) -> "Engine":
        return cls(get_spark(app_name, **kw), sf_dir)

    # -- SQL surface (Catalyst parses/optimizes/executes) -------------
    def sql(self, statement: str) -> DataFrame:
        return self.spark.sql(statement)

    def table(self, name: str) -> DataFrame:
        return self.registry.table(name)

    def tables(self) -> list[str]:
        from .schemas import FIXTURE_TABLES

        return list(FIXTURE_TABLES)

    # -- catalog surface ----------------------------------------------
    def query(self, name: str) -> DataFrame:
        from .plans import get_catalog

        return get_catalog()[name].build(self.spark, self.sf_dir)

    def catalog(self) -> dict:
        from .plans import get_catalog

        return get_catalog()
