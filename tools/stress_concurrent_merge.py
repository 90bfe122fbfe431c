"""Concurrent-writer stress on the versioned table's optimistic
concurrency: W threads × B pruned merges each race one table, and the
final state must equal the SERIAL application of all batches.

What this proves (the Delta ConcurrentModificationException contract):

* the commit LOCK serializes pointer swaps — a contender that finds a
  live holder raises ``ConcurrentCommitError`` and retries here with
  backoff (same-process threads share a pid, so the stale-steal path
  never fires; the raise-and-retry is the intended shape);
* the CAS (``expected_base_version``) closes the lost-update window the
  lock cannot: a merge that read snapshot v and lost the race to
  publish first gets ``SnapshotConflictError`` and RECOMPUTES against
  the new head (``conflict_retries``) instead of silently dropping the
  winner's rows;
* because every batch's keys are disjoint per thread, the serial-
  equivalent final state is order-independent and exactly checkable;
* (round 10) with ``--banded``, each thread updates a CONTIGUOUS key
  band (the partition-parallel ingest shape) so racing commits touch
  disjoint FILES — the logical-rebase path
  (``_rebase_compatible``) must then absorb nearly every CAS
  conflict with zero recomputes, while the default scattered
  workload (every merge touches every file) keeps exercising the
  genuinely-overlapping recompute path;
* (round 11) with ``--vacuum N``, every merge rides a
  ``vacuum_keep_last=N`` — the DESTRUCTIVE sweep now racing the
  other writers' prepares and publishes.  This exercises the locked
  sweep (an unlocked vacuum could rmtree a version committed between
  its keep computation and its delete) and the best-effort ride
  contract (lock contention skips the ride, never fails the merge).
  Serial equivalence must hold UNCHANGED while history is being
  aggressively reclaimed mid-storm, and the final table must still
  read at every retained version.

Usage: python tools/stress_concurrent_merge.py [rows] [threads] [batches]
           [--banded] [--vacuum N]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    banded = "--banded" in sys.argv
    vacuum_keep = None
    argv = sys.argv[1:]
    if "--vacuum" in argv:
        vacuum_keep = int(argv[argv.index("--vacuum") + 1])
        del argv[argv.index("--vacuum") : argv.index("--vacuum") + 2]
    args = [a for a in argv if not a.startswith("--")]
    rows = int(args[0]) if len(args) > 0 else 1_000_000
    n_threads = int(args[1]) if len(args) > 1 else 4
    n_batches = int(args[2]) if len(args) > 2 else 8

    from pyspark.sql import SparkSession, functions as F

    from airflow_embeddings_pipeline_spark.operators import merge as merge_mod
    from airflow_embeddings_pipeline_spark.sources.versioned import (
        ConcurrentCommitError,
        SnapshotConflictError,
        VersionedParquetTable,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.scheduler.mode", "FAIR")
        .appName("stress-concurrent-merge")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="conc_merge_")
    table = VersionedParquetTable(root)
    base = spark.range(rows).select(
        F.col("id").alias("k"),
        F.lit("base").alias("v"),
        F.lit(0).cast("long").alias("gen"),
    )
    table.commit_with_manifest(base, "k", cluster_partitions=32)

    # telemetry: count CAS conflicts (true recomputes) and logical
    # REBASES (conflicts absorbed under the lock with zero recompute)
    # by wrapping the attempt fn
    counters = {
        "cas_conflicts": 0,
        "lock_busy": 0,
        "rebases": 0,
        "vacuums_ran": 0,
        "vacuums_skipped": 0,
    }
    clock = threading.Lock()
    real_attempt = merge_mod._pruned_merge_attempt

    if vacuum_keep is not None:
        # telemetry on the ride-along sweeps: ran vs skipped-on-
        # contention (the merge swallows ConcurrentCommitError from
        # its best-effort ride, so count at the vacuum seam itself)
        real_vacuum = VersionedParquetTable.vacuum

        def counting_vacuum(self, *a, **kw):
            try:
                dropped = real_vacuum(self, *a, **kw)
            except ConcurrentCommitError:
                with clock:
                    counters["vacuums_skipped"] += 1
                raise
            with clock:
                counters["vacuums_ran"] += 1
            return dropped

        VersionedParquetTable.vacuum = counting_vacuum

    def counting_attempt(*a, **kw):
        try:
            stats = real_attempt(*a, **kw)
            if stats.get("rebased"):
                with clock:
                    counters["rebases"] += 1
            return stats
        except SnapshotConflictError:
            with clock:
                counters["cas_conflicts"] += 1
            raise

    merge_mod._pruned_merge_attempt = counting_attempt

    errors: list[str] = []

    band = rows // n_threads  # --banded: contiguous per-thread key band

    def worker(t: int) -> None:
        for b in range(n_batches):
            # disjoint per-thread keys: scattered (k ≡ t mod threads —
            # every merge touches every file, conflicts genuinely
            # overlap) or banded (contiguous band — racing commits
            # touch disjoint files, conflicts should REBASE)
            if banded:
                upd_cond = (
                    (F.col("id") >= t * band)
                    & (F.col("id") < (t + 1) * band)
                    & (F.col("id") % 403 == 0)
                )
            else:
                upd_cond = (F.col("id") % n_threads == t) & (
                    F.col("id") % 403 == 0
                )
            upd = spark.range(rows).filter(upd_cond).select(
                F.col("id").alias("k"),
                F.lit(f"t{t}b{b}").alias("v"),
                F.lit(b + 1).cast("long").alias("gen"),
            )
            ins_lo = rows + (t * n_batches + b) * 1_000
            ins = spark.range(ins_lo, ins_lo + 1_000).select(
                F.col("id").alias("k"),
                F.lit(f"ins-t{t}b{b}").alias("v"),
                F.lit(b + 1).cast("long").alias("gen"),
            )
            batch = upd.unionAll(ins)
            for attempt in range(200):
                try:
                    merge_mod.merge_upsert_write_pruned(
                        root, batch, "k",
                        vacuum_keep_last=vacuum_keep,
                        conflict_retries=50,
                    )
                    break
                except SnapshotConflictError:
                    # conflict_retries exhausted mid-storm: back off, retry
                    time.sleep(0.05 * (attempt + 1))
                except ConcurrentCommitError:
                    with clock:
                        counters["lock_busy"] += 1
                    time.sleep(0.02 * (attempt % 10 + 1))
            else:
                errors.append(f"thread {t} batch {b}: never committed")
                return

    t0 = time.time()
    threads = [
        threading.Thread(target=worker, args=(t,)) for t in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.time() - t0
    merge_mod._pruned_merge_attempt = real_attempt
    if vacuum_keep is not None:
        VersionedParquetTable.vacuum = real_vacuum
    if errors:
        print(json.dumps({"ok": False, "errors": errors}))
        return 1

    # serial-equivalent expectation: last batch per thread wins its keys
    if banded:
        owner = F.floor(F.col("id") / band)
        updated = (
            (F.col("id") % 403 == 0) & (F.col("id") < n_threads * band)
        )
    else:
        owner = F.col("id") % n_threads
        updated = F.col("id") % 403 == 0
    expected = spark.range(rows).select(
        F.col("id").alias("k"),
        F.when(
            updated,
            F.concat(F.lit("t"), owner.cast("string"),
                     F.lit(f"b{n_batches - 1}")),
        ).otherwise("base").alias("v"),
        F.when(updated, n_batches).otherwise(0)
        .cast("long").alias("gen"),
    )
    ins_all = spark.range(
        rows, rows + n_threads * n_batches * 1_000
    ).select(
        F.col("id").alias("k"),
        F.concat(
            F.lit("ins-t"),
            F.floor((F.col("id") - rows) / (n_batches * 1_000)).cast("string"),
            F.lit("b"),
            (F.floor((F.col("id") - rows) / 1_000) % n_batches).cast("string"),
        ).alias("v"),
        ((F.floor((F.col("id") - rows) / 1_000) % n_batches) + 1)
        .cast("long").alias("gen"),
    )
    expected = expected.unionAll(ins_all)

    got = table.read(spark)
    n_got, n_exp = got.count(), expected.count()
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()

    # --vacuum: history was reclaimed MID-STORM — every version the
    # final retention window kept must still read (a lost sweep race
    # shows up here as a dangling manifest / missing files), and the
    # head must be among them
    time_travel_ok = None
    versions_readable = None
    if vacuum_keep is not None:
        time_travel_ok = True
        readable = [
            v
            for v in table.versions()
            if table.manifest(v) is not None
        ]
        versions_readable = len(readable)
        head = table.current_version()
        if head not in readable:
            time_travel_ok = False
        for v in readable:
            try:
                table.read_version(spark, v).count()
            except Exception:
                time_travel_ok = False
                break

    out = {
        "metric": "concurrent_merge_serializability",
        "workload": "banded" if banded else "scattered",
        "rows": rows,
        "threads": n_threads,
        "batches_per_thread": n_batches,
        "commits": table.current_version(),
        "cas_conflicts": counters["cas_conflicts"],
        "rebases": counters["rebases"],
        "lock_busy": counters["lock_busy"],
        "rows_final": n_got,
        "rows_expected": n_exp,
        "diff_rows": diff,
        "serial_equivalent": diff == 0 and n_got == n_exp,
        "wall_s": round(wall, 1),
    }
    if vacuum_keep is not None:
        out["vacuum_keep_last"] = vacuum_keep
        out["vacuums_ran"] = counters["vacuums_ran"]
        out["vacuums_skipped_on_contention"] = counters["vacuums_skipped"]
        out["versions_readable"] = versions_readable
        out["time_travel_ok"] = time_travel_ok
    print(json.dumps(out))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    ok = out["serial_equivalent"] and time_travel_ok in (None, True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
