"""Key-based dedup operators — SURVEY §2.5 (W1) and §2.9 (X1).

W1 is the reference's ``QUALIFY ROW_NUMBER() OVER (PARTITION BY
main_refco ORDER BY original_timestamp DESC) = 1`` (embeddings-
pipeline.py:323) — keep only the newest record per merge key within a
staged batch.  Spark has no QUALIFY; the filter-on-window-column idiom
is the standard equivalent and Catalyst plans it as a single
shuffle-on-key + per-partition sort.

Scale note (100 TB): a window over PARTITION BY key shuffles once on
the key — the same shuffle the downstream merge join needs, so AQE can
reuse the partitioning.  For heavily-skewed keys prefer
``latest_per_key_agg`` (max_by) which gets map-side partial
aggregation: each input partition reduces to ≤1 row per key *before*
the shuffle, turning an O(rows) shuffle into an O(distinct keys) one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key: str | Sequence[str],
    order_by: str | Sequence[str],
    *,
    descending: bool = True,
    tiebreak: str | Sequence[str] = (),
) -> DataFrame:
    """W1: newest row per key (row_number window idiom).

    ``tiebreak`` columns make the pick deterministic when ``order_by``
    ties (the reference is nondeterministic on ties — SURVEY §7.3).
    """
    keys = [key] if isinstance(key, str) else list(key)
    orders = [order_by] if isinstance(order_by, str) else list(order_by)
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak)
    ordering = [F.desc(c) if descending else F.asc(c) for c in orders]
    ordering += [F.desc(c) if descending else F.asc(c) for c in ties]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key_agg(
    df: DataFrame,
    key: str | Sequence[str],
    order_by: str,
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """W1 alternative via ``max_by(struct(*), ordering)`` — same result,
    but aggregation-based so it gets map-side partial reduction (better
    under key skew / at 100 TB; SURVEY §2.6 O4)."""
    keys = [key] if isinstance(key, str) else list(key)
    payload = F.struct(*[F.col(c) for c in df.columns])
    ordering = (
        F.struct(F.col(order_by), F.col(tiebreak)) if tiebreak else F.col(order_by)
    )
    out = df.groupBy(*keys).agg(F.max_by(payload, ordering).alias("__row"))
    return out.select(*[F.col(f"__row.{c}").alias(c) for c in df.columns])


def exact_dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """X1: exact duplicate removal.  ``distinct``/``dropDuplicates``
    plan as a hash aggregate on the subset columns — partial agg
    map-side, one shuffle on the dedup key."""
    return df.dropDuplicates(list(subset)) if subset else df.distinct()
