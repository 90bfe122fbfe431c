"""MERGE upsert — SURVEY §2.3 J2/J3, the reference's flagship query.

The reference executes one Snowflake MERGE (embeddings-pipeline.py:
294-352): staged scan → typed projection → window dedup → dim join →
WHEN MATCHED UPDATE (8 cols) / WHEN NOT MATCHED INSERT (10 cols), keyed
on ``main_refco`` (:328).  Delta Lake's MERGE INTO is the drop-in Spark
equivalent; this environment has no Delta jars, so the engine ships the
portable relational rewrite (semantically identical, and the pattern
Delta itself executes underneath):

    target FULL OUTER JOIN source ON key
      → matched rows  : source values win for the update-set columns,
                        target values are kept for insert-only columns
      → source-only   : insert all columns
      → target-only   : carry through unchanged

Idempotency: re-merging the same source batch is a no-op on row count
and (given deterministic dedup) on content — the property the
reference's at-least-once replay safety depends on (T4, :480).

Scale: the join shuffles both sides on the merge key.  On 100 TB the
win is to dedup the source first (shrinks to ≤1 row/key map-side via
max_by) and let AQE choose broadcast when the batch is small relative
to the target — exactly what a daily incremental batch looks like.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    *,
    update_columns: Sequence[str] | None = None,
    schema_evolution: bool = False,
    delete_when=None,
) -> DataFrame:
    """Relational MERGE: upsert ``source`` into ``target`` on ``key``.

    ``update_columns`` — columns overwritten on match.  The reference
    updates 8 of its 10 columns, keeping the target's ``cleaned_ref``
    (absent from the UPDATE SET at embeddings-pipeline.py:329-338) and
    the key itself; None ⇒ all non-key columns present in both sides.

    ``schema_evolution`` — Delta's ``mergeSchema`` analog: columns that
    exist only in the source are APPENDED to the output (typed from the
    source schema); pre-existing target rows carry NULL there, exactly
    the backfill a warehouse column-add performs.  Off by default —
    unknown source columns are ignored, so a malformed batch can't
    silently widen the table.

    ``delete_when`` — the WHEN MATCHED ... THEN DELETE clause: a Column
    predicate over SOURCE columns (reference them as ``s.<col>``); a
    matched target row whose source row satisfies it is dropped instead
    of updated.  Source-only rows satisfying it are suppressed too (a
    tombstone for an absent key inserts nothing), which is exactly CDC
    delete semantics.  Unmatched target rows are never deleted.
    """
    tcols = target.columns
    scols = set(source.columns)
    if update_columns is None:
        update_columns = [c for c in tcols if c != key and c in scols]
    upd = set(update_columns)

    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    if delete_when is not None:
        # drop matched-and-tombstoned rows AND tombstone-only inserts;
        # target-only rows (s.key NULL ⇒ predicate NULL ⇒ kept) survive
        joined = joined.filter(
            F.col(f"s.{key}").isNull() | ~F.coalesce(delete_when, F.lit(False))
        )
    matched_or_insert = F.col(f"s.{key}").isNotNull()

    out_cols = []
    for c in tcols:
        if c == key:
            expr = F.coalesce(F.col(f"t.{key}"), F.col(f"s.{key}"))
        elif c in upd and c in scols:
            # matched → source value; source-only → source value;
            # target-only → target value.
            expr = F.when(matched_or_insert, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
        elif c in scols:
            # insert-only column: keep target on match, source on insert.
            expr = F.when(F.col(f"t.{key}").isNotNull(), F.col(f"t.{c}")).otherwise(
                F.col(f"s.{c}")
            )
        else:
            expr = F.col(f"t.{c}")
        out_cols.append(expr.alias(c))
    if schema_evolution:
        for c in source.columns:
            if c not in tcols:
                # outer join already yields NULL for target-only rows
                out_cols.append(F.col(f"s.{c}").alias(c))
    return joined.select(*out_cols)


def merge_counts(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Rowcount observability analog of the reference's
    ``cur.rowcount`` (embeddings-pipeline.py:358-359): how many source
    rows update vs insert."""
    t = target.select(F.col(key)).alias("t")
    s = source.select(F.col(key)).alias("s")
    joined = s.join(t, F.col(f"s.{key}") == F.col(f"t.{key}"), "left_outer")
    return joined.agg(
        F.count(F.when(F.col(f"t.{key}").isNotNull(), 1)).alias("rows_updated"),
        F.count(F.when(F.col(f"t.{key}").isNull(), 1)).alias("rows_inserted"),
    )


def merge_upsert_write(
    target_path: str,
    source: DataFrame,
    key: str,
    *,
    update_columns: Sequence[str] | None = None,
    schema_evolution: bool = False,
    vacuum_keep_last: int | None = 2,
) -> int:
    """Parquet-table MERGE with a versioned pointer-file commit.

    Reads the live version of the target table, merges, writes the
    result as a brand-new immutable version directory, and swaps the
    ``_CURRENT`` pointer last — the same only-commit-after-success
    ordering the reference enforces by task dependencies (T4,
    embeddings-pipeline.py:480), made crash-safe: dying anywhere before
    the pointer swap leaves the previous version live and readable (no
    rename window with zero live targets).  A plain parquet directory
    is adopted as the implicit version 0 on first merge.  Returns the
    committed version number.  On Delta/Iceberg this whole function is
    `MERGE INTO` (the versioned table rejects non-local URIs and says
    so).  ``vacuum_keep_last=None`` keeps every version (time travel).
    """
    from ..sources.versioned import VersionedParquetTable

    spark = source.sparkSession
    table = VersionedParquetTable(target_path)
    target = table.read(spark)
    merged = merge_upsert(
        target, source, key,
        update_columns=update_columns, schema_evolution=schema_evolution,
    )
    version = table.commit(merged)
    if vacuum_keep_last is not None:
        table.vacuum(keep_last=vacuum_keep_last)
    return version
