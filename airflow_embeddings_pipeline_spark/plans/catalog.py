"""Query catalog — the engine's public query surface.

Every operator from SURVEY §2 (and the §2.9 extensions) registers here
as a ``Query``: a Spark DataFrame builder plus (when SQL-expressible)
the equivalent DuckDB oracle SQL, colocated so implementation and
oracle cannot drift.  ``__spark_entry__.py`` exposes this catalog to
the driver's correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, Query] = {}


def register(q: Query) -> Query:
    if q.name in QUERIES:
        raise ValueError(f"duplicate query name: {q.name}")
    QUERIES[q.name] = q
    return q


def get_catalog() -> dict[str, Query]:
    # Import side-effect modules exactly once.
    from . import (  # noqa: F401
        advanced,
        analytics,
        changes,
        coverage,
        flagship,
        grouped,
        pipeline,
        relational,
        timeseries,
        tpch_extra,
        tpch_partsupp,
    )
    from ..streaming import queries as streaming_queries  # noqa: F401
    from ..extensions import (  # noqa: F401
        corpus_stats_queries,
        curation_queries,
        dedup_queries,
        multimodal_queries,
        retrieval_queries,
        similarity_queries,
        text_queries,
    )

    return QUERIES
