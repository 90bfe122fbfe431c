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

import functools
import operator
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.versioned import ConcurrentCommitError


def _as_keys(key: str | Sequence[str]) -> list[str]:
    keys = [key] if isinstance(key, str) else list(key)
    if not keys:
        raise ValueError("merge key must name at least one column")
    return keys


# ---- optimistic/pessimistic publish adaptivity (per-process) --------
# The prepare/publish split wins when racing writers' scopes are
# DISJOINT (conflicts absorb via logical rebase — the prepared output
# still publishes, so nothing staged is wasted: measured 71.5 → 52.6 s
# at 8 banded writers).  It LOSES when scopes genuinely overlap: every
# conflicted attempt stages a write the publish must discard, burning
# shared cluster time (measured 237 → 307 s on the scattered stress).
# This memory tracks recent conflict OUTCOMES per table root so the
# next merge starts in the mode the observed regime wants; it is
# advisory and per-process — a wrong guess costs one wasted prepare
# (optimistic in a storm) or one serialized write (pessimistic on a
# disjoint workload), never correctness.
import threading as _threading
import time as _time

_CONFLICT_WINDOW_S = 120.0
_CONFLICT_MEMORY: dict[str, dict] = {}
_CONFLICT_MEMORY_LOCK = _threading.Lock()


def _conflict_note(root: str, kind: str) -> None:
    """Record a conflict outcome: ``"recompute"`` (a genuine overlap
    raised SnapshotConflictError) or ``"absorb"`` (the commit rebased
    — the prepared output published verbatim)."""
    now = _time.monotonic()
    cutoff = now - _CONFLICT_WINDOW_S
    with _CONFLICT_MEMORY_LOCK:
        d = _CONFLICT_MEMORY.setdefault(
            root, {"recompute": [], "absorb": []}
        )
        d[kind].append(now)
        for k in ("recompute", "absorb"):
            d[k] = [t for t in d[k] if t >= cutoff]


def _conflict_storming(root: str) -> bool:
    """True when recent conflicts on this table are dominated by
    genuine recomputes — the regime where optimistic prepares are
    pure waste and first attempts should write under the lock."""
    now = _time.monotonic()
    cutoff = now - _CONFLICT_WINDOW_S
    with _CONFLICT_MEMORY_LOCK:
        d = _CONFLICT_MEMORY.get(root)
        if not d:
            return False
        rec = sum(1 for t in d["recompute"] if t >= cutoff)
        absorb = sum(1 for t in d["absorb"] if t >= cutoff)
    return rec >= 2 and rec > 2 * absorb


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str | Sequence[str],
    *,
    update_columns: Sequence[str] | None = None,
    schema_evolution: bool = False,
    delete_when=None,
    evolution_exclude: Sequence[str] = (),
    strategy: str = "outer",
) -> DataFrame:
    """Relational MERGE: upsert ``source`` into ``target`` on ``key``
    (a column name or a COMPOSITE key — a sequence of names ANDed into
    the join condition, exactly Snowflake/Delta ``MERGE ... ON t.a =
    s.a AND t.b = s.b``).

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

    ``evolution_exclude`` — source columns that schema evolution must
    NOT append (control columns like a CDC tombstone flag that exist to
    steer the merge, not to land in the table).

    ``strategy`` — physical plan choice, NEVER a semantics choice (a
    hypothesis-driven parity test asserts row-identical output):

    * ``"outer"`` (default): one FULL OUTER join.  Spark cannot
      broadcast a full-outer side, so both sides shuffle full-width —
      right when target and source are comparable in size (the
      in-memory pipeline queries).
    * ``"decompose"``: target LEFT JOIN source (update/delete leg —
      broadcastable when the batch is small, so the target streams
      WITHOUT shuffling) unioned with source LEFT ANTI target-keys
      (insert leg — shuffles only the KEY columns of the target, not
      its full width).  Matched multiplicity is identical to the
      outer join's (every t×s key pair emits a row — duplicate keys
      on either side multiply the same way).  This is the plan for a
      narrow batch against a large target: the pruned MERGE write
      path uses it, because there the source is by construction small
      relative to the touched-file subset.
    """
    keys = _as_keys(key)
    tcols = target.columns
    scols = set(source.columns)
    if update_columns is None:
        update_columns = [c for c in tcols if c not in keys and c in scols]
    upd = set(update_columns)
    if strategy not in ("outer", "decompose"):
        raise ValueError(f"unknown merge strategy: {strategy!r}")

    if strategy == "decompose":
        return _merge_decomposed(
            target, source, keys, upd,
            schema_evolution=schema_evolution,
            delete_when=delete_when,
            evolution_exclude=evolution_exclude,
        )

    # side-presence after the outer join must come from an explicit
    # marker, NOT from key nullability: a NULL-key source row (legal —
    # SQL equality never matches NULL, it passes through as an
    # unmatched INSERT, same semantics as Snowflake MERGE) has its key
    # columns all-null while the side is very much present, and a
    # key-null test would misread it as side-absent and null out its
    # values.  A literal marker is constant-folded and costs nothing.
    t_mark, s_mark = "__merge_t__", "__merge_s__"
    t = target.withColumn(t_mark, F.lit(True)).alias("t")
    s = source.withColumn(s_mark, F.lit(True)).alias("s")
    cond = functools.reduce(
        operator.and_,
        [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys],
    )
    joined = t.join(s, cond, "full_outer")
    s_present = F.col(f"s.{s_mark}").isNotNull()
    t_present = F.col(f"t.{t_mark}").isNotNull()
    if delete_when is not None:
        # drop matched-and-tombstoned rows AND tombstone-only inserts;
        # target-only rows (no s side ⇒ predicate NULL ⇒ kept) survive
        joined = joined.filter(
            ~s_present | ~F.coalesce(delete_when, F.lit(False))
        )
    matched_or_insert = s_present

    out_cols = []
    for c in tcols:
        if c in keys:
            expr = F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}"))
        elif c in upd and c in scols:
            # matched → source value; source-only → source value;
            # target-only → target value.
            expr = F.when(matched_or_insert, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
        elif c in scols:
            # insert-only column: keep target on match, source on insert.
            expr = F.when(t_present, F.col(f"t.{c}")).otherwise(F.col(f"s.{c}"))
        else:
            expr = F.col(f"t.{c}")
        out_cols.append(expr.alias(c))
    if schema_evolution:
        for c in source.columns:
            if c not in tcols and c not in set(evolution_exclude):
                # outer join already yields NULL for target-only rows
                out_cols.append(F.col(f"s.{c}").alias(c))
    return joined.select(*out_cols)


def _merge_decomposed(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    upd: set,
    *,
    schema_evolution: bool,
    delete_when,
    evolution_exclude: Sequence[str],
) -> DataFrame:
    """The ``strategy="decompose"`` plan for :func:`merge_upsert` —
    row-for-row identical output to the full-outer rewrite (every
    matched t×s key pair emits one row with the same column choices;
    NULL keys never match on either side), but as two broadcast-friendly
    joins instead of one never-broadcastable full outer:

    * update leg: ``target LEFT JOIN source`` — the target side never
      shuffles when Spark broadcasts the batch; matched pairs take
      source values for the update set, unmatched target rows carry
      through, tombstoned pairs drop.
    * insert leg: ``source LEFT ANTI target(keys)`` — only the target's
      KEY columns reach the shuffle (column pruning cuts a wide table
      to its key bytes); surviving source rows insert.
    """
    tcols = target.columns
    scols = set(source.columns)
    evolved = (
        [
            c
            for c in source.columns
            if c not in tcols and c not in set(evolution_exclude)
        ]
        if schema_evolution
        else []
    )
    s_mark = "__merge_s__"
    t = target.alias("t")
    s = source.withColumn(s_mark, F.lit(True)).alias("s")
    cond = functools.reduce(
        operator.and_,
        [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys],
    )
    joined = t.join(s, cond, "left_outer")
    s_present = F.col(f"s.{s_mark}").isNotNull()
    if delete_when is not None:
        joined = joined.filter(
            ~s_present | ~F.coalesce(delete_when, F.lit(False))
        )
    upd_cols = []
    for c in tcols:
        if c in keys or c not in scols:
            expr = F.col(f"t.{c}")
        elif c in upd:
            expr = F.when(s_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
        else:
            # insert-only column: the target side is always present here
            expr = F.col(f"t.{c}")
        upd_cols.append(expr.alias(c))
    upd_cols += [F.col(f"s.{c}").alias(c) for c in evolved]
    upd_leg = joined.select(*upd_cols)

    ins = source.alias("s")
    if delete_when is not None:
        ins = ins.filter(~F.coalesce(delete_when, F.lit(False)))
    anti_cond = functools.reduce(
        operator.and_,
        [F.col(f"s.{k}") == F.col(f"t.{k}") for k in keys],
    )
    ins = ins.join(
        target.select(*keys).alias("t"), anti_cond, "left_anti"
    )
    ins_cols = []
    for c in tcols:
        if c in keys or c in scols:
            expr = F.col(f"s.{c}")
        else:
            expr = F.lit(None).cast(target.schema[c].dataType)
        ins_cols.append(expr.alias(c))
    ins_cols += [F.col(f"s.{c}").alias(c) for c in evolved]
    return upd_leg.unionByName(ins.select(*ins_cols))


def merge_counts(
    target: DataFrame, source: DataFrame, key: str | Sequence[str]
) -> DataFrame:
    """Rowcount observability analog of the reference's
    ``cur.rowcount`` (embeddings-pipeline.py:358-359): how many source
    rows update vs insert."""
    keys = _as_keys(key)
    t = target.select(*[F.col(k) for k in keys]).alias("t")
    s = source.select(*[F.col(k) for k in keys]).alias("s")
    cond = functools.reduce(
        operator.and_,
        [F.col(f"s.{k}") == F.col(f"t.{k}") for k in keys],
    )
    joined = s.join(t, cond, "left_outer")
    t_present = functools.reduce(
        operator.or_, [F.col(f"t.{k}").isNotNull() for k in keys]
    )
    return joined.agg(
        F.count(F.when(t_present, 1)).alias("rows_updated"),
        F.count(F.when(~t_present, 1)).alias("rows_inserted"),
    )


def merge_upsert_write(
    target_path: str,
    source: DataFrame,
    key: str | Sequence[str],
    *,
    update_columns: Sequence[str] | None = None,
    schema_evolution: bool = False,
    delete_when=None,
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
        delete_when=delete_when,
    )
    version = table.commit(merged)
    if vacuum_keep_last is not None:
        # ride-along vacuum is BEST-EFFORT under writer
        # contention: its destructive sweep takes the commit
        # lock, and a merge that just committed must not fail
        # because a racing writer holds it — the next ride
        # vacuums instead
        try:
            table.vacuum(keep_last=vacuum_keep_last)
        except ConcurrentCommitError:
            pass
    return version


def merge_upsert_write_pruned(
    target_path: str,
    source: DataFrame,
    key: str | Sequence[str],
    *,
    update_columns: Sequence[str] | None = None,
    schema_evolution: bool = False,
    delete_when=None,
    evolution_exclude: Sequence[str] = (),
    app_metadata: dict | None = None,
    vacuum_keep_last: int | None = 2,
    max_exact_keys: int = 200_000,
    conflict_retries: int = 2,
    write_mode: str = "cow",
    max_dv_rows: int = 100_000_000,
) -> dict:
    """File-pruned MERGE with optimistic concurrency — see
    :func:`_pruned_merge_attempt` for the pruning mechanics.

    ``write_mode`` — physical write strategy, never a semantics choice
    (``read(result)`` is row-identical either way, parity-tested):

    * ``"cow"`` (default, copy-on-write): the touched files are
      rewritten merged — read amplification and write amplification
      are both bounded by the touched-file mass.
    * ``"mor"`` (merge-on-read, Delta deletion-vectors analog): the
      matched target rows are marked deleted in per-file DELETION
      VECTOR sidecars and the batch's update/insert images are
      APPENDED as new files; the touched files themselves are carried
      by reference.  Write amplification drops to O(batch + DV delta)
      — the right plan when a small batch's keys SCATTER across many
      large files (copy-on-write would rewrite the full touched mass
      to change a few rows per file).  Falls back to copy-on-write
      when the batch has NULL-key rows (degenerate insert case) or
      the matched-row count exceeds ``max_dv_rows`` (a rewrite-scale
      update wants rewrite).  ``maintain()`` later purges heavy DVs.

    The merge reads the live file set, computes the touched subset
    OUTSIDE the commit lock, and publishes with
    ``expected_base_version`` set to the snapshot it read — a
    compare-and-swap.  If another writer committed in between (the
    lost-update window the lock alone cannot close), the commit first
    tries a LOGICAL REBASE (Delta conflict scoping,
    ``VersionedParquetTable._rebase_compatible``): when every racing
    commit provably touched files and key ranges disjoint from this
    merge's touched set — checked in O(changed segments) under the
    same lock hold — the prepared output is published against the new
    head verbatim (``stats["rebased"] = True``), costing zero
    recompute and zero extra lock round-trips.  Only a genuinely
    OVERLAPPING conflict raises
    :class:`~..sources.versioned.SnapshotConflictError`, and the merge
    re-reads the new live version and recomputes, up to
    ``conflict_retries`` times (Delta's
    ``ConcurrentModificationException`` retry loop).  MERGE is
    key-idempotent, so recomputing against the newer snapshot yields
    exactly the state a serial execution would; with retries exhausted
    the conflict propagates to the caller.
    """
    from ..sources.versioned import SnapshotConflictError

    if write_mode not in ("cow", "mor"):
        raise ValueError(f"unknown write_mode: {write_mode!r}")
    root_key = os.path.abspath(target_path)
    attempt = 0
    while True:
        # adaptive optimism: first attempts PREPARE outside the lock
        # (parallel writers' data jobs overlap — the disjoint-scope
        # win), unless recent conflicts on this table were dominated
        # by genuine recomputes (a scattered storm, where a discarded
        # staged write per conflict burns shared cluster time) or this
        # call already recomputed once.  Retries and storms write
        # under the lock, where the CAS aborts BEFORE the write job.
        mode = (
            "inline"
            if attempt > 0 or _conflict_storming(root_key)
            else "prepared"
        )
        try:
            stats = _pruned_merge_attempt(
                target_path,
                source,
                key,
                update_columns=update_columns,
                schema_evolution=schema_evolution,
                delete_when=delete_when,
                evolution_exclude=evolution_exclude,
                app_metadata=app_metadata,
                vacuum_keep_last=vacuum_keep_last,
                max_exact_keys=max_exact_keys,
                write_mode=write_mode,
                max_dv_rows=max_dv_rows,
                publish_mode=mode,
            )
            if stats.get("rebased"):
                _conflict_note(root_key, "absorb")
            return stats
        except SnapshotConflictError:
            _conflict_note(root_key, "recompute")
            if attempt >= conflict_retries:
                raise
            attempt += 1


def _pruned_merge_attempt(
    target_path: str,
    source: DataFrame,
    key: str | Sequence[str],
    *,
    update_columns: Sequence[str] | None = None,
    schema_evolution: bool = False,
    delete_when=None,
    evolution_exclude: Sequence[str] = (),
    app_metadata: dict | None = None,
    vacuum_keep_last: int | None = 2,
    max_exact_keys: int = 200_000,
    write_mode: str = "cow",
    max_dv_rows: int = 100_000_000,
    publish_mode: str = "prepared",
) -> dict:
    """File-pruned MERGE: rewrite ONLY the target files the source
    batch can touch; carry every other file into the new version BY
    REFERENCE in its manifest.

    This is the property the reference's Snowflake MERGE has natively —
    micro-partition pruning (embeddings-pipeline.py:294-352 touches
    only partitions holding matched ``main_refco`` values) — and the
    one thing the full-rewrite :func:`merge_upsert_write` lacks at
    100 TB: a daily incremental batch against a 100 TB target must not
    rewrite 100 TB.  Delta/Iceberg MERGE INTO does exactly this file
    skipping from its stats log; this is the local-manifest
    implementation of the same plan.

    Mechanics:

    1. the live version's per-file [min, max] stats of ``key`` come
       from its manifest (or a footer-only adoption scan of a plain
       version directory);
    2. the source batch's distinct keys are collected when they number
       ≤ ``max_exact_keys`` (a daily batch — the design point — is
       small; the collect is bounded and explicitly capped); a LARGER
       batch never collects keys at all: the per-file ranges (one tiny
       row per file) broadcast against the distinct source keys in a
       range join, and only the DISTINCT TOUCHED FILE IDS — bounded by
       file count, not key count — reach the driver, so the pruning
       decision scales to arbitrarily large batches;
    3. a target file is TOUCHED iff some source key can lie inside its
       stats range (exact: binary search of the sorted key set against
       each range; range-join: the broadcast containment test) — files
       without usable stats are always touched (conservative),
       NULL-key source rows touch nothing (SQL equality never matches
       NULL, they insert).  On the EXACT tier, files carrying a bloom
       index for a key column (``add_bloom_index``) further refine:
       range-surviving keys the bloom proves ABSENT cannot touch, so a
       scattered absent-key batch appends without touching anything.
       The range-join tier stays stats-only by design — its batches
       exceed the key-collect cap, and a batch that large touches most
       files regardless;
    4. only the touched files are read and full-outer-merged with the
       batch; the merged subset is written range-clustered on ``key``
       as the new version's data files, untouched entries are carried
       verbatim into the manifest, and the pointer swap publishes both
       atomically.

    Correctness containment: an insert key either lies inside some
    file's [min, max] (that file is touched, so the merged subset
    holds the insert) or outside every file (it lands in the new
    files); a tombstone (``delete_when``) key matching a target row
    necessarily touches that row's file.  Hence read(pruned result) ==
    merge_upsert(full target, source) row-for-row — the unit suite
    asserts this equality and the untouched files' byte identity.

    Legacy pointer-less directories are ADOPTED first (one full
    clustered rewrite — unavoidable: legacy files can't be referenced
    by a version manifest), so the first pruned merge on a legacy
    table costs one rewrite and every later one prunes.

    COMPOSITE keys (a sequence of column names) merge on the full key
    and prune on EVERY key column: files cluster on the LEADING column
    (put the highest-selectivity column first — the Delta
    first-merge-column contract) and the manifest records per-file
    [min, max] stats for ALL key columns (``stats_columns``), so a
    file is touched only when some source key TUPLE fits inside every
    recorded column range — a conservative superset of the true
    touched set, strictly tighter than leading-column-only pruning
    whenever trailing columns correlate with the layout.  Columns
    without usable stats never exclude.

    Returns ``{"version", "files_total", "files_touched",
    "files_carried", "bytes_rewritten", "bytes_carried", "rows_source",
    "pruning"}``; ``rows_source`` is the TRUE distinct count of the
    prune key (the full key tuple for composite keys) in the batch,
    on every tier.
    """
    from ..sources.versioned import (
        SnapshotConflictError,
        VersionedParquetTable,
        _stat_canon,
        _stat_restore,
    )

    spark = source.sparkSession
    table = VersionedParquetTable(target_path)
    keys = _as_keys(key)
    lead = keys[0]  # clustering column; extras prune via recorded stats
    trail = tuple(keys[1:])

    if table.current_version() is None:
        # adopt: one clustered full rewrite creates the manifest layout
        table.commit_with_manifest(
            table.read(spark),
            lead,
            stats_columns=keys if trail else None,
            key_columns=keys,
        )

    # the snapshot this whole computation is valid against; the commit
    # below CASes on it (see merge_upsert_write_pruned's retry loop).
    # ONE prior-manifest read serves the stats-name mapping here, the
    # app-metadata carry-over, and the constraint inheritance at commit.
    base_version = table.current_version()
    # RAW doc only: every field the merge needs from the prior
    # manifest (schema, key, mapping, constraints, app metadata) is
    # inline in both storage forms — the full file list materializes
    # below via file_entries, or NOT AT ALL on a segmented manifest
    # whose envelopes prune the candidate segments (the exact tier)
    prior_man = (
        table._raw_manifest(base_version)
        if base_version is not None
        else None
    ) or {}
    # manifest per-file stats are keyed PHYSICALLY (column mapping);
    # the caller's keys are logical
    _cmap = {
        f["name"]: (prior_man.get("column_mapping") or {}).get(
            f["name"], f["name"]
        )
        for f in (prior_man.get("schema") or {}).get("fields", [])
    }
    # segmented fast path: eligible when the manifest's recorded
    # stats serve these keys directly (the same condition under which
    # file_entries would return the manifest list verbatim) — the
    # touched-test then evaluates segment ENVELOPES first and only
    # the candidate segments materialize
    _p_lead = _cmap.get(lead, lead)
    _p_trail = {_cmap.get(c, c) for c in trail}
    seg_fast = (
        ("file_segments" in prior_man or "seg_ref_lists" in prior_man)
        and prior_man.get("key") == _p_lead
        and _p_trail <= set(prior_man.get("stats_columns", [_p_lead]))
    )
    if seg_fast:
        from pyspark.sql.types import StructType as _ST

        schema = _ST.fromJson(prior_man["schema"])
        entries = None  # resolved after the touched-test exists
    else:
        entries, schema = table.file_entries(
            spark, lead, extra_columns=trail
        )

    def _key_ranges(e: dict) -> list:
        """Per-key-column (lo, hi) for a file entry; None = no usable
        stats for that column (it never excludes)."""
        out = []
        for i, kcol in enumerate(keys):
            if i == 0:
                r = (
                    None
                    if e["min"] is None or e["max"] is None
                    else (e["min"], e["max"])
                )
            else:
                s = (e.get("stats") or {}).get(_cmap.get(kcol, kcol))
                r = None if not s or s[0] is None or s[1] is None else (s[0], s[1])
            out.append(r)
        return out

    # ---- bounded source key collection (step 2)
    src_keys = source.select(
        *[F.col(k).alias(f"k{i}") for i, k in enumerate(keys)]
    ).distinct()
    head = src_keys.limit(max_exact_keys + 1).collect()
    n_src = len(head)
    if n_src == 0:
        # empty batch: MERGE is the identity — no new version
        v = table.current_version()
        if seg_fast:
            tot = table._segment_totals(base_version) or {}
            n_all = tot.get("n_files", 0)
            b_all = tot.get("bytes", 0)
        else:
            n_all = len(entries)
            b_all = sum(e["bytes"] for e in entries)
        return {
            "version": v,
            "files_total": n_all,
            "files_touched": 0,
            "files_carried": n_all,
            "bytes_rewritten": 0,
            "bytes_carried": b_all,
            "rows_source": 0,
            "pruning": "empty-source",
        }
    range_join_conflict = None  # set by the range-join tier below
    if n_src <= max_exact_keys:
        # a file is touched iff SOME source key tuple lies inside its
        # per-column stats ranges: bisect the lead-sorted tuples into
        # the file's lead window, then check the trailing columns'
        # recorded ranges (composite keys prune on EVERY column with
        # stats, not just the leading one).  Range comparisons run in
        # the stats' canonical space (temporal keys → epoch-us, see
        # _stat_value); bloom probes keep the ORIGINAL values —
        # _bloom_canon does its own canonicalization per persisted kind
        _ktypes = [schema[k].dataType for k in keys]
        pairs = sorted(
            (
                (
                    tuple(
                        _stat_canon(v, t) for v, t in zip(r, _ktypes)
                    ),
                    tuple(r),
                )
                for r in head
                if r[0] is not None
            ),
            key=lambda p: p[0][0],
        )
        ctuples = [p[0] for p in pairs]
        tuples = [p[1] for p in pairs]
        leads = [c[0] for c in ctuples]
        pruning = "exact"
        _bloom_cache: dict = {}

        def touched(i: int, e: dict) -> bool:
            rs = _key_ranges(e)
            if rs[0] is None:
                return True
            import bisect

            cands = []
            j = bisect.bisect_left(leads, rs[0][0])
            while j < len(ctuples) and ctuples[j][0] <= rs[0][1]:
                ct = ctuples[j]
                if all(
                    r is None or v is None or r[0] <= v <= r[1]
                    for r, v in zip(rs[1:], ct[1:])
                ):
                    cands.append(tuples[j])
                j += 1
            if not cands:
                return False
            # bloom refinement (add_bloom_index): a file whose bloom
            # proves every range-surviving key ABSENT is untouched —
            # the equality pruning range stats cannot give when key
            # values do not correlate with the clustering layout.
            # NULL components never probe (conservative keep).
            from ..sources.versioned import _bloom_might_contain

            for ci, kcol in enumerate(keys):
                bloom = table._bloom_of(
                    e, _cmap.get(kcol, kcol), _bloom_cache
                )
                if bloom is None:
                    continue
                vals = [t[ci] for t in cands if t[ci] is not None]
                if not vals:
                    continue
                mask = _bloom_might_contain(bloom, vals)
                it = iter(mask)
                cands = [
                    t
                    for t in cands
                    if t[ci] is None or bool(next(it))
                ]
                if not cands:
                    return False
            return True

    else:
        # batch too large to collect keys: broadcast the per-file
        # per-column ranges (one tiny row per file) against the
        # distinct key tuples; only DISTINCT TOUCHED FILE IDS reach the
        # driver — bounded by file count regardless of batch size.
        # rows_source must stay truthful in bench/stress telemetry, so
        # the TRUE distinct-tuple count replaces the capped probe
        # length (one extra count job over a plan this branch computes
        # anyway).
        # the distinct-key shuffle of a >max_exact_keys batch is the
        # dominant pruning cost and feeds FOUR actions: count,
        # segment-envelope range join, per-file range join, and — on a
        # CAS miss under the commit lock — range_join_conflict's
        # rebase-scope test.  Persist ONCE and keep it through the
        # commit (unpersisted in the finally around the commit below):
        # unpersisting earlier would re-evaluate a possibly
        # non-deterministic source under the lock, judging
        # disjointness against different keys than the prepared
        # output, and re-run the distinct shuffle while holding it.
        src_keys.persist()
        try:
            n_src = src_keys.count()
            # stats are stored canonically (temporal → epoch-us int);
            # broadcast range frames are TYPED per key column, so restore
            # each bound to the value Spark round-trips
            ktypes = [schema[k].dataType for k in keys]

            def _range_hit(ranged: list) -> set[int]:
                """ids of ``(id, per-key-ranges)`` items whose ranges may
                contain SOME distinct source key tuple: broadcast the tiny
                range frame against src_keys; only distinct hit ids reach
                the driver — bounded by item count regardless of batch
                size.  Serves both passes (segment envelopes, then files):
                an envelope is interval-union-shaped exactly like a file
                entry, and the containment test is monotone under interval
                containment, so segment-level misses are sound skips."""
                if not ranged:
                    return set()
                from pyspark.sql.types import IntegerType, StructField, StructType

                fields = [StructField("fid", IntegerType(), False)]
                for i, kcol in enumerate(keys):
                    kt = schema[kcol].dataType
                    fields.append(StructField(f"lo{i}", kt, True))
                    fields.append(StructField(f"hi{i}", kt, True))
                rows = []
                for i, rs in ranged:
                    row = [i]
                    for kt_j, r in zip(ktypes, rs):
                        row.extend(
                            [None, None]
                            if r is None
                            else [
                                _stat_restore(r[0], kt_j),
                                _stat_restore(r[1], kt_j),
                            ]
                        )
                    rows.append(tuple(row))
                rdf = spark.createDataFrame(rows, StructType(fields))
                cond = None
                for i in range(len(keys)):
                    c = F.col(f"lo{i}").isNull() | (
                        (F.col(f"k{i}") >= F.col(f"lo{i}"))
                        & (F.col(f"k{i}") <= F.col(f"hi{i}"))
                    )
                    cond = c if cond is None else (cond & c)
                return {
                    r[0]
                    for r in src_keys.join(F.broadcast(rdf), cond)
                    .select("fid")
                    .distinct()
                    .collect()
                }

            if seg_fast:
                # TWO-PASS: range-join the segment ENVELOPES first and
                # materialize only candidate segments — the O(touched)
                # commit guarantee holds for >max_exact_keys batches too
                # (the very case segmentation targets).  Segments without
                # an envelope or without lead stats always materialize
                # (conservative), matching the per-file no-stats rule.
                import json as _json

                refs = (
                    table._seg_refs(table._raw_manifest(base_version))
                    or []
                )
                env_ranged, keep = [], set()
                for si, ref in enumerate(refs):
                    env = ref.get("env")
                    rs = _key_ranges(env) if env else None
                    if rs is None or rs[0] is None:
                        keep.add(si)
                    else:
                        env_ranged.append((si, rs))
                keep |= _range_hit(env_ranged)
                entries = [
                    _json.loads(j)
                    for si, ref in enumerate(refs)
                    if si in keep
                    for _, j in table._load_segment(ref["path"])
                ]
            ranged = [
                (i, _key_ranges(e))
                for i, e in enumerate(entries)
                if e["min"] is not None and e["max"] is not None
            ]
            hit = _range_hit(ranged)
        except BaseException:
            # failure before the commit region's finally takes over
            src_keys.unpersist()
            raise
        pruning = "range-join"

        def touched(i: int, e: dict) -> bool:
            if e["min"] is None or e["max"] is None:
                return True
            return i in hit

        def range_join_conflict(racing_entries: list) -> bool:
            """Rebase-scope batch test for this tier (runs under the
            commit lock only on a CAS miss): range-join the RACING
            commits' added/changed entries against the distinct source
            keys — one bounded job, against a full merge recompute
            that would re-run the same shuffle three times plus the
            write.  No-stats racing entries conflict conservatively."""
            ranged_r = []
            for i, e in enumerate(racing_entries):
                rs = _key_ranges(e)
                if rs[0] is None:
                    return True
                ranged_r.append((i, rs))
            return bool(_range_hit(ranged_r))

    if entries is None:
        # segmented exact tier: the SAME touched-test evaluates each
        # segment's envelope pseudo-entry (conservative interval
        # logic, blooms skipped at this level) — untouched segments
        # never materialize, so the merge's driver cost is O(touched)
        entries = table._materialize_pruned(
            base_version, lambda env: touched(0, env)
        )["files"]
    touched_entries = [e for i, e in enumerate(entries) if touched(i, e)]
    if seg_fast:
        # carried = "everything else in the base version", BY
        # REFERENCE — never built as a list; telemetry comes from the
        # segment refs' aggregate sums
        tot = table._segment_totals(base_version) or {}
        files_total = tot.get("n_files", len(entries))
        bytes_total = tot.get("bytes", 0)
        carried = None
        n_carried = files_total - len(touched_entries)
        bytes_carried = bytes_total - sum(
            e["bytes"] for e in touched_entries
        )
    else:
        carried = [e for i, e in enumerate(entries) if not touched(i, e)]
        files_total = len(entries)
        n_carried = len(carried)
        bytes_carried = sum(e["bytes"] for e in carried)

    # Logical-rebase scope for the commit's CAS (Delta conflict
    # scoping): if a racing commit wins the pointer but provably
    # touched disjoint files AND key ranges, the commit retargets onto
    # the new head under the same lock hold instead of raising for a
    # full merge recompute.  The exact tier's might_touch is the SAME
    # conservative containment test that computed the touched set,
    # evaluated per racing entry driver-side; the range-join tier has
    # no collected keys, so its test is the batch form — one bounded
    # broadcast range join of the racing entries against the distinct
    # source keys.
    rebase_scope = {
        "touched": {e["path"] for e in touched_entries},
        "exclude": {e["path"] for e in touched_entries},
        "might_touch": (
            (lambda e: touched(0, e)) if pruning == "exact" else None
        ),
        "might_touch_batch": (
            range_join_conflict if pruning == "range-join" else None
        ),
    }

    # src_keys of the range-join tier stays PERSISTED through the
    # commit: rebase_scope's might_touch_batch (range_join_conflict)
    # re-joins it under the commit lock on a CAS miss
    try:
        if write_mode == "mor" and touched_entries:
            # NULL-key source rows always insert and cannot be expressed as
            # "merged rows whose key matches a source key" — the degenerate
            # case falls back to copy-on-write (same result, parity-tested)
            if pruning == "exact":
                has_null_key = any(
                    any(x is None for x in r) for r in head
                )
            else:
                has_null_key = not source.select(*keys).filter(
                    functools.reduce(
                        operator.or_, [F.col(k).isNull() for k in keys]
                    )
                ).isEmpty()
            if not has_null_key:
                mor = _mor_merge_attempt(
                    table,
                    prior_man,
                    source,
                    keys,
                    touched_entries,
                    carried,
                    totals={
                        "files_total": files_total,
                        "bytes_carried": bytes_carried,
                    },
                    base_version=base_version,
                    update_columns=update_columns,
                    schema_evolution=schema_evolution,
                    delete_when=delete_when,
                    evolution_exclude=evolution_exclude,
                    app_metadata=app_metadata,
                    vacuum_keep_last=vacuum_keep_last,
                    max_dv_rows=max_dv_rows,
                    n_src=n_src,
                    pruning=pruning,
                    # MoR keeps the touched entries carried (DV re-point),
                    # so a rebased inline carried set must NOT exclude them
                    rebase_scope={**rebase_scope, "exclude": ()},
                )
                if mor is not None:
                    return mor
            # fall through: copy-on-write handles the degenerate cases

        # ---- merge only the touched subset (step 4) — read through the
        # manifest mapping (files store PHYSICAL names; the merge, like
        # every public surface, speaks logical)
        if touched_entries and prior_man:
            subset = table._read_manifest_files(
                spark, prior_man, touched_entries
            )
        elif touched_entries:
            paths = [os.path.join(table.root, e["path"]) for e in touched_entries]
            subset = spark.read.schema(schema).parquet(*paths)
        else:
            subset = spark.createDataFrame([], schema)
        # decompose: the batch is by construction small relative to the
        # touched-file subset (that asymmetry is the whole point of
        # pruning), so the update leg broadcasts the batch and the subset
        # files stream through un-shuffled; the insert leg shuffles only
        # the subset's key columns.
        merged = merge_upsert(
            subset,
            source,
            key,
            update_columns=update_columns,
            schema_evolution=schema_evolution,
            delete_when=delete_when,
            evolution_exclude=evolution_exclude,
            strategy="decompose",
        )
        # layout hint: the merged subset clusters WITHIN the touched files'
        # disjoint range COMPONENTS, and out-of-range inserts (keys beyond
        # every touched range) get their own file(s) — so no output file's
        # [min, max] spans a gap, neither between touched bands (a batch
        # hitting two distant key regions must not mint a file covering
        # both) nor between the touched region and the append region.
        # Gap-spanning files intersect most carried files, inflating every
        # later merge's touched set (measured by
        # tools/stress_merge_longhorizon.py), and defeat the CDF source's
        # intra-step range splitting.  Purely a layout decision: same rows,
        # same manifest semantics.
        ranged = sorted(
            (
                (e["min"], e["max"])
                for e in touched_entries
                if e["min"] is not None and e["max"] is not None
            ),
        )
        bands: list[tuple] = []
        for lo, hi in ranged:
            if bands and lo <= bands[-1][1]:
                bands[-1] = (bands[-1][0], max(bands[-1][1], hi))
            else:
                bands.append((lo, hi))
        # bands are computed in the stats' canonical space (temporal keys
        # store epoch-us ints); the commit's band predicates compare the
        # ACTUAL key column, so restore typed bounds for append_split while
        # band_rows below keeps comparing stats-to-stats
        _lead_dt = schema[lead].dataType
        typed_bands = [
            (_stat_restore(lo, _lead_dt), _stat_restore(hi, _lead_dt))
            for lo, hi in bands
        ]
        split = (
            typed_bands
            if len(typed_bands) > 1
            else (typed_bands[0] if typed_bands else None)
        )
        # per-band row estimates from the manifest stats the prune already
        # holds (each ranged touched file lies inside exactly one band):
        # they size the commit's first band write so it needs no dedicated
        # count job — exact counts ride that write's observed metrics
        band_rows = [
            sum(
                e.get("n_rows") or 0
                for e in touched_entries
                if e["min"] is not None and lo <= e["min"] and e["max"] <= hi
            )
            for lo, hi in bands
        ]
        # app metadata: prior keys persist until overwritten (Delta txn
        # analog) — merged with this commit's, new keys winning
        prior_meta = dict(prior_man.get("app_metadata") or {})
        common = dict(
            app_metadata={**prior_meta, **(app_metadata or {})} or None,
            expected_base_version=base_version,
            operation="MERGE",
            rebase_on_conflict=rebase_scope,
        )
        if publish_mode == "prepared":
            # PREPARE/PUBLISH split: every Spark job the commit needs
            # — the merged-subset write, footer stats, blooms,
            # constraint check — runs here, OUTSIDE the commit lock,
            # into a content-addressed staging dir.  N racing writers'
            # data jobs therefore run in PARALLEL; the lock hold below
            # covers only conflict analysis (CAS / logical rebase) and
            # the manifest/marker/pointer publish (driver metadata,
            # O(touched)).  Without the split, racing writers' walls
            # summed their write jobs even when every conflict rebased
            # (measured 71.5 → 52.6 s at 8 banded writers).
            #
            # Advisory conflict probe FIRST: if the snapshot is
            # already stale and provably un-rebasable, recompute now —
            # preparing would stage a write the publish must discard.
            # The authoritative check still runs under the lock (a
            # racer can land during the prepare); this probe only
            # bounds the waste window to the prepare itself.
            cur_now = table.current_version()
            if cur_now != base_version and not table._rebase_compatible(
                base_version,
                cur_now,
                rebase_scope["touched"],
                rebase_scope["might_touch"],
                rebase_scope["might_touch_batch"],
            ):
                raise SnapshotConflictError(base_version, cur_now)
            prepared = table.prepare_commit(
                merged,
                lead,
                base_version=base_version,
                cluster_partitions=max(1, len(touched_entries)),
                append_split=split,
                band_rows_hint=band_rows if split is not None else None,
                stats_columns=keys if trail else None,
                key_columns=keys,
                constraints=prior_man.get("constraints") or {},
                column_mapping=prior_man.get("column_mapping") or {},
                retired_physical=prior_man.get("retired_physical") or [],
                bloom_columns=prior_man.get("bloom_columns") or [],
            )
            common["prepared"] = prepared
            commit_df = None
            new_bytes = prepared["new_bytes"]
        else:
            # inline (pessimistic) publish — the conflict-retry shape:
            # the CAS under the lock aborts BEFORE the write job, so a
            # storm of genuinely-overlapping writers never stages
            # writes it must throw away (the pre-split behavior;
            # measured 237 → 307 s regression on the scattered stress
            # when retries stayed optimistic)
            common.update(
                cluster_partitions=max(1, len(touched_entries)),
                append_split=split,
                band_rows_hint=band_rows if split is not None else None,
                stats_columns=keys if trail else None,
                key_columns=keys,
                constraints=prior_man.get("constraints") or {},
                column_mapping=prior_man.get("column_mapping") or {},
                retired_physical=prior_man.get("retired_physical") or [],
                bloom_columns=prior_man.get("bloom_columns") or [],
            )
            commit_df = merged
            new_bytes = None
        if carried is None:
            # segmented: the base version's untouched entries carry by
            # reference inside their segments; the touched files' rows
            # live on in the rewritten output, so their entries are
            # excluded outright
            version = table.commit_with_manifest(
                commit_df,
                lead,
                carried_base_version=base_version,
                carried_exclude={e["path"]: e for e in touched_entries},
                **common,
            )
        else:
            version = table.commit_with_manifest(
                commit_df, lead, carried=carried, **common
            )
        if vacuum_keep_last is not None:
            # ride-along vacuum is BEST-EFFORT under writer
            # contention: its destructive sweep takes the commit
            # lock, and a merge that just committed must not fail
            # because a racing writer holds it — the next ride
            # vacuums instead
            try:
                table.vacuum(keep_last=vacuum_keep_last)
            except ConcurrentCommitError:
                pass
        return {
            "version": version,
            "files_total": files_total,
            "files_touched": len(touched_entries),
            "files_carried": n_carried,
            # the commit's own new data files: the prepare's footer
            # stats (staged placement) or the version dir's files
            # (inline retries) — never a full-manifest materialization
            "bytes_rewritten": (
                new_bytes
                if new_bytes is not None
                else _vdir_data_bytes(table, version)
            ),
            "bytes_carried": bytes_carried,
            "rows_source": n_src,
            "pruning": pruning,
            "write_mode": "cow",
            "rebased": table._last_commit_rebase is not None,
        }
    finally:
        if pruning == "range-join":
            src_keys.unpersist()


def _vdir_data_bytes(table, version: int) -> int:
    """Bytes of the DATA files a version's own directory holds — the
    commit's rewritten/appended mass, read from the filesystem so
    telemetry never materializes a full manifest (sidecars and
    segments excluded by the same prefix rule as scan_file_stats)."""
    vdir = table._version_dir(version)
    try:
        names = os.listdir(vdir)
    except OSError:
        return 0
    return sum(
        os.path.getsize(os.path.join(vdir, fn))
        for fn in names
        if fn.endswith(".parquet")
        and not fn.startswith(("_", ".", "dv-", "bloom-"))
    )


def _mor_merge_attempt(
    table,
    prior_man: dict,
    source: DataFrame,
    keys: list[str],
    touched_entries: list[dict],
    carried: list[dict] | None,
    *,
    totals: dict,
    base_version: int,
    update_columns,
    schema_evolution: bool,
    delete_when,
    evolution_exclude,
    app_metadata,
    vacuum_keep_last,
    max_dv_rows: int,
    n_src: int,
    pruning: str,
    rebase_scope: dict | None = None,
    publish_mode: str = "prepared",
) -> dict | None:
    """The merge-on-read write plan for :func:`_pruned_merge_attempt`
    (Delta deletion-vectors MERGE analog).  Semantics are IDENTICAL to
    copy-on-write — only the physical layout differs:

    * the touched subset is read once WITH row positions
      (``_read_entries_with_pos``: existing DVs applied, so an
      already-deleted row never re-matches);
    * matched target rows' ``(file, position)`` pairs become DV deltas
      — written executor-side by the commit's sidecar Spark job; only
      per-FILE counts reach the driver, and above ``max_dv_rows`` (a
      read-amplification policy bound, not a memory one) this returns
      None and the caller runs copy-on-write: a rewrite-scale update
      WANTS a rewrite;
    * the appended output is exactly ``merge_upsert(subset, source)``
      restricted to rows whose key appears in the batch — the update
      images (source values for the update set, target values kept
      elsewhere) plus the inserts; tombstoned rows (``delete_when``)
      appear in neither the append nor the kept set, because their
      positions are DV'd and ``merge_upsert`` drops them.  The
      restriction is what makes parity a construction, not a hope:
      kept-in-place rows (key ∉ batch) and appended/deleted rows
      (key ∈ batch) partition the merged output exactly.

    Write amplification: O(batch + DV delta + prior DV mass of the
    touched files) vs copy-on-write's O(touched file bytes) — the win
    when a small batch's keys scatter across many large files.
    """
    spark = source.sparkSession

    subset_pos = table._read_entries_with_pos(
        spark, prior_man, touched_entries
    )
    sk = (
        source.select(*keys)
        .na.drop("any", subset=list(keys))
        .distinct()
    )
    matched = subset_pos.join(sk, on=list(keys), how="left_semi").select(
        "__file", "__pos"
    )
    # probe-first plan (versioned._dv_plan): a small matched set
    # resolves in one bounded collect and a driver sidecar (the r8
    # commit shape); a big one runs a per-file counts job and writes
    # the sidecar executor-side — positions never cross the driver
    matched.persist()
    try:
        return _mor_commit(
            table, prior_man, source, keys, matched,
            touched_entries=touched_entries, carried=carried,
            totals=totals,
            base_version=base_version, update_columns=update_columns,
            schema_evolution=schema_evolution, delete_when=delete_when,
            evolution_exclude=evolution_exclude,
            app_metadata=app_metadata,
            vacuum_keep_last=vacuum_keep_last,
            max_dv_rows=max_dv_rows, n_src=n_src, pruning=pruning,
            subset_pos=subset_pos, sk=sk, rebase_scope=rebase_scope,
            publish_mode=publish_mode,
        )
    finally:
        # unpersist on EVERY exit — a SnapshotConflictError retry or
        # any mid-commit failure must not leak the cached (file, pos)
        # set into executor storage for the session's lifetime
        matched.unpersist()


def _mor_commit(
    table,
    prior_man: dict,
    source: DataFrame,
    keys: list[str],
    matched: DataFrame,
    *,
    touched_entries,
    carried,
    totals,
    base_version,
    update_columns,
    schema_evolution,
    delete_when,
    evolution_exclude,
    app_metadata,
    vacuum_keep_last,
    max_dv_rows,
    n_src,
    pruning,
    subset_pos,
    sk,
    rebase_scope=None,
    publish_mode="prepared",
) -> dict | None:
    # _dv_plan only needs the TOUCHED entries' prior DV rows (matched
    # paths are a subset of them) — never the full file list
    n_dv, n_dv_files, dv_kw = table._dv_plan(
        {**prior_man, "files": touched_entries}, matched
    )
    if n_dv > max_dv_rows:
        return None  # rewrite-scale update: copy-on-write is the plan

    subset = subset_pos.drop("__file", "__pos")
    appended = merge_upsert(
        subset,
        source,
        keys,
        update_columns=update_columns,
        schema_evolution=schema_evolution,
        delete_when=delete_when,
        evolution_exclude=evolution_exclude,
        strategy="decompose",
    ).join(sk, on=list(keys), how="left_semi")

    # NO band-split here, deliberately: copy-on-write bands exist so a
    # TABLE-scale rewrite never mints a gap-spanning file (such a file
    # would inflate every later merge's touched set by its mass).  MoR
    # appends are BATCH-scale by construction — a scattered batch's
    # single appended file may span many bands, but reading it costs
    # O(batch), and maintain()'s compact/recluster folds the
    # accumulation.  Banding a 2k-row append into 32 per-band files
    # costs 32 write jobs and 32 mini-files per commit (measured in
    # tools/stress_dv_amplification.py before this choice).
    lead = keys[0]
    prior_meta = dict(prior_man.get("app_metadata") or {})
    common = dict(
        app_metadata={**prior_meta, **(app_metadata or {})} or None,
        expected_base_version=base_version,
        operation="MERGE[mor]",
        rebase_on_conflict=rebase_scope,
    )
    inherited = dict(
        cluster_partitions=max(1, -(-n_src // 2_000_000)),
        stats_columns=keys if len(keys) > 1 else None,
        key_columns=keys,
        constraints=prior_man.get("constraints") or {},
        column_mapping=prior_man.get("column_mapping") or {},
        retired_physical=prior_man.get("retired_physical") or [],
        bloom_columns=prior_man.get("bloom_columns") or [],
    )
    if publish_mode == "prepared":
        # prepare/publish split, MoR form: the appended-image write
        # AND the DV sidecar job both run here, outside the lock (the
        # sidecar depends only on the touched entries' prior DVs,
        # which a rebase proves identical between base and head).
        # Advisory staleness probe first — see the CoW path.
        from ..sources.versioned import SnapshotConflictError

        cur_now = table.current_version()
        if cur_now != base_version and not table._rebase_compatible(
            base_version,
            cur_now,
            set(rebase_scope["touched"]) if rebase_scope else set(),
            (rebase_scope or {}).get("might_touch"),
            (rebase_scope or {}).get("might_touch_batch"),
        ):
            raise SnapshotConflictError(base_version, cur_now)
        prepared = table.prepare_commit(
            appended,
            lead,
            base_version=base_version,
            **inherited,
            **(
                dict(
                    dv_touched={e["path"]: e for e in touched_entries},
                    **dv_kw,
                )
                if n_dv
                else {}
            ),
        )
        common["prepared"] = prepared
        commit_df = None
        new_bytes = prepared["new_bytes"]
    else:
        common.update(inherited)
        if n_dv:
            common.update(dv_kw)
        commit_df = appended
        new_bytes = None
    if carried is None:
        # segmented: untouched entries carry inside their segments by
        # reference; touched entries (re-pointed at the new DV
        # sidecar) are the only base entries the commit materializes
        version = table.commit_with_manifest(
            commit_df,
            lead,
            carried_base_version=base_version,
            carried_touched={e["path"]: e for e in touched_entries},
            **common,
        )
    else:
        version = table.commit_with_manifest(
            commit_df,
            lead,
            carried=carried + touched_entries,
            **common,
        )
    if vacuum_keep_last is not None:
        # ride-along vacuum is BEST-EFFORT under writer
        # contention: its destructive sweep takes the commit
        # lock, and a merge that just committed must not fail
        # because a racing writer holds it — the next ride
        # vacuums instead
        try:
            table.vacuum(keep_last=vacuum_keep_last)
        except ConcurrentCommitError:
            pass
    return {
        "version": version,
        "files_total": totals["files_total"],
        "files_touched": len(touched_entries),
        "files_carried": totals["files_total"] - len(touched_entries),
        "bytes_rewritten": (
            new_bytes
            if new_bytes is not None
            else _vdir_data_bytes(table, version)
        ),
        "bytes_carried": totals["bytes_carried"],
        "rows_source": n_src,
        "pruning": pruning,
        "write_mode": "mor",
        "dv_rows_added": int(n_dv),
        "dv_files": int(n_dv_files),
        "rebased": table._last_commit_rebase is not None,
    }


def apply_changes(
    target_path: str,
    changes: DataFrame,
    key: str | Sequence[str],
    *,
    schema_evolution: bool = True,
    vacuum_keep_last: int | None = 2,
    max_exact_keys: int = 200_000,
) -> dict:
    """Apply a change feed to a replica table — the consumer half of
    CDC (Delta Live Tables ``APPLY CHANGES INTO`` / the reference's
    Snowflake-stream consumer, embeddings-pipeline.py:294-352).

    ``changes`` is the output of
    :meth:`VersionedParquetTable.changes_between` /
    :meth:`~VersionedParquetTable.changes_since` (payload columns plus
    ``_change_type`` / ``_commit_version``).  ``insert`` and
    ``update_postimage`` rows upsert; ``delete`` rows remove the key;
    ``update_preimage`` rows are informational and ignored.  The apply
    is ONE file-pruned MERGE (tombstones ride the same batch via the
    ``delete_when`` clause), so replica write amplification is bounded
    by the replica files the change set touches — a daily CDC batch
    against a 100 TB replica rewrites the touched-file mass on both
    ends of the pipe.

    Idempotent by construction: re-applying the same NET change set is
    a content no-op (upserts overwrite with identical values; a delete
    tombstone for an already-absent key inserts nothing), which is what
    makes at-least-once delivery from ``changes_since`` watermark
    replay safe (T4, embeddings-pipeline.py:480).

    **The watermark lives in the sink.**  The feed's source version is
    recorded as ``cdc_last_applied_version`` in the replica commit's
    ``app_metadata`` — durable ATOMICALLY with the applied rows — and
    the next consumer round must resume from
    ``VersionedParquetTable(replica).app_metadata_of()``, NOT from a
    side file.  A side-file watermark has a crash window (applied but
    not advanced) in which the replayed feed nets an already-applied
    insert against a later delete into NOTHING, silently stranding the
    deleted rows on the replica (caught live by
    tools/stress_cdc_replication.py cycle 21).  Replaying a feed the
    replica already recorded never regresses the stored version (max
    wins), and the apply itself stays idempotent.

    ``schema_evolution`` defaults ON — unlike a hand-written merge, the
    feed's payload schema IS the primary's schema, so a column the
    replica lacks means the primary evolved and the replica must widen
    to stay a replica (pass ``False`` to pin the replica's schema and
    ignore new columns instead).

    Returns the pruned-merge stats dict plus ``rows_upserted`` /
    ``rows_deleted``; a change feed with no applicable rows commits
    nothing and returns ``{"version": None, ...}`` zeros.
    """
    meta = {"_change_type", "_commit_version"}
    missing = meta - set(changes.columns)
    if missing:
        raise ValueError(
            f"not a change feed: missing column(s) {sorted(missing)}"
        )
    payload = [c for c in changes.columns if c not in meta]
    applicable = changes.filter(
        F.col("_change_type").isin("insert", "update_postimage", "delete")
    ).select(
        *payload,
        (F.col("_change_type") == "delete").alias("_cdc_delete"),
        F.col("_commit_version"),
    )
    agg = applicable.agg(
        F.sum(F.when(F.col("_cdc_delete"), 1).otherwise(0)).alias("n_del"),
        F.count(F.lit(1)).alias("n_all"),
        F.max("_commit_version").alias("v_src"),
    ).collect()[0]
    n_del = agg["n_del"] or 0
    n_ups = (agg["n_all"] or 0) - n_del
    if n_del + n_ups == 0:
        return {
            "version": None,
            "rows_upserted": 0,
            "rows_deleted": 0,
            "files_touched": 0,
            "bytes_rewritten": 0,
        }
    from ..sources.versioned import VersionedParquetTable

    prior = VersionedParquetTable(target_path).app_metadata_of().get(
        "cdc_last_applied_version"
    )
    v_applied = agg["v_src"] if prior is None else max(prior, agg["v_src"])
    stats = merge_upsert_write_pruned(
        target_path,
        applicable.drop("_commit_version"),
        key,
        schema_evolution=schema_evolution,
        delete_when=F.col("s._cdc_delete"),
        evolution_exclude=("_cdc_delete",),
        app_metadata={"cdc_last_applied_version": v_applied},
        vacuum_keep_last=vacuum_keep_last,
        max_exact_keys=max_exact_keys,
    )
    return {
        **stats,
        "rows_upserted": n_ups,
        "rows_deleted": n_del,
        "cdc_last_applied_version": v_applied,
    }


def sync_replica(
    spark,
    primary_path: str,
    replica_path: str,
    key: str | Sequence[str],
    **apply_kwargs,
) -> dict:
    """One consumer round: export the primary's changes since the
    replica's recorded watermark and apply them — the loop body of
    continuous CDC replication.

    The watermark is read from the REPLICA's ``app_metadata``
    (``cdc_last_applied_version``, recorded atomically by
    :func:`apply_changes`), so a consumer that dies anywhere inside
    this call resumes exactly where the replica's durable state says it
    is — there is no applied-but-not-advanced window.  Seed a replica
    by committing the primary snapshot with
    ``app_metadata={"cdc_last_applied_version": <primary version>}``.

    Raises if the replica carries no watermark (unseeded — a replica
    whose sync origin is unknown must not be silently "synced" from an
    arbitrary point) or if the primary has vacuumed the watermark
    version (``FileNotFoundError`` from ``changes_since`` — re-seed).
    """
    from ..sources.versioned import VersionedParquetTable

    primary = VersionedParquetTable(primary_path)
    w = (
        VersionedParquetTable(replica_path)
        .app_metadata_of()
        .get("cdc_last_applied_version")
    )
    if w is None:
        raise ValueError(
            f"{replica_path}: no cdc_last_applied_version in app_metadata "
            "— seed the replica from a primary snapshot and record the "
            "snapshot version before syncing"
        )
    # the feed's row identity must be the SAME key the apply merges on
    # (defaulting would resolve to the primary's stats_columns — right
    # for composite-key tables, wrong when stats_columns carry extra
    # skip-only columns)
    feed = primary.changes_since(spark, w, key=key)
    return apply_changes(replica_path, feed, key, **apply_kwargs)


def sync_replica_stream(
    spark,
    primary_path: str,
    replica_path: str,
    key: str | Sequence[str],
    *,
    checkpoint_dir: str,
    available_now: bool = True,
    **apply_kwargs,
):
    """Always-on CDC replication: the versioned table's STREAMING change
    feed (:func:`~..sources.versioned_stream.read_changes_stream`)
    driven through ``foreachBatch`` → :func:`apply_changes` — the
    continuous counterpart of the batch :func:`sync_replica` loop
    (Delta `readChangeFeed` → `MERGE` streaming pipeline; the reference
    runs the same shape as a Snowflake task over a table stream).

    Returns the started ``StreamingQuery`` (``available_now=True``
    drains the backlog and stops — the scheduled-consumer shape;
    ``False`` keeps it running on the default processing-time trigger).

    Exactly-once state under BOTH progress trackers: Spark's checkpoint
    decides which commit steps re-run after a restart, and the
    replica's ``cdc_last_applied_version`` app-metadata watermark
    (recorded atomically with every applied batch) makes any replay a
    content no-op — so even LOSING the checkpoint is safe: restart with
    a fresh checkpoint dir and the stream re-seeds its
    ``startingVersion`` from the replica's own durable watermark,
    replays at-least-once, and converges (the stress harness injects
    exactly this fault).  An unseeded replica raises, same as the batch
    consumer.
    """
    from ..sources.versioned import VersionedParquetTable
    from ..sources.versioned_stream import read_changes_stream

    w = (
        VersionedParquetTable(replica_path)
        .app_metadata_of()
        .get("cdc_last_applied_version")
    )
    if w is None:
        raise ValueError(
            f"{replica_path}: no cdc_last_applied_version in app_metadata "
            "— seed the replica from a primary snapshot and record the "
            "snapshot version before syncing"
        )

    keys = _as_keys(key)

    def _apply(batch_df, _epoch_id):
        # A catch-up micro-batch spans MULTIPLE commits, and the
        # streaming feed is per-commit — a key can appear several times
        # (e.g. inserted in one commit, deleted in the next).  One
        # merge cannot apply a multi-row-per-key source, so NET the
        # batch to each key's LATEST change first (exactly what the
        # batch changes_since export does across its range): the
        # highest _commit_version row per key is the key's end state
        # relative to the batch start.  One pruned merge per
        # micro-batch regardless of how many commits it caught up.
        from pyspark.sql import Window

        acts = batch_df.filter(
            F.col("_change_type").isin(
                "insert", "update_postimage", "delete"
            )
        )
        w_last = Window.partitionBy(*keys).orderBy(
            F.col("_commit_version").desc()
        )
        net = (
            acts.withColumn("_rn", F.row_number().over(w_last))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        apply_changes(replica_path, net, key, **apply_kwargs)

    stream = read_changes_stream(spark, primary_path, starting_version=int(w))
    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
