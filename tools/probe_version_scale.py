"""Probe: driver-side metadata op cost vs VERSION COUNT — the
streaming-ingest shape (thousands of tiny commits) must not make
``history()`` / ``vacuum()`` / the per-commit bookkeeping super-linear.

Builds a table and drives N metadata-shape commits (``skip_data_write``
— the cheapest commit the engine supports: lock + orphan reconcile +
manifest + marker + pointer, zero Spark jobs), sampling at
checkpoints:

* per-commit wall (the orphan reconcile lists the root dir — O(dirs on
  disk), so an UNVACUUMED table's commit cost grows linearly with
  retained versions; the steady-state vacuumed table is flat);
* ``history()`` wall — O(retained versions) manifest reads by design
  (DESCRIBE HISTORY reads every retained commit's doc);
* ``vacuum(dry_run=True)`` wall — keep-set resolution + root listing;
* ``vacuum()`` real — first collection after a long unvacuumed run is
  O(dirs deleted), then steady-state is O(1) per commit;
* ``current_version()`` + a read's manifest resolution.

Run: python tools/probe_version_scale.py [n_versions] [checkpoints]
     (defaults: 10000 and 100,1000,10000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_embeddings_pipeline_spark.session import get_spark  # noqa: E402
from airflow_embeddings_pipeline_spark.sources.versioned import (  # noqa: E402
    VersionedParquetTable,
)

BASE = "/tmp/probe_version_scale"


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    checkpoints = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [100, 1_000, 10_000]
    )
    checkpoints = sorted(c for c in checkpoints if c <= n_total)
    spark = get_spark(
        "probe_version_scale", master="local[4]", shuffle_partitions=4
    )
    root = os.path.join(BASE, "t")
    shutil.rmtree(root, ignore_errors=True)
    t = VersionedParquetTable(root)
    t.commit_with_manifest(
        spark.range(10_000).selectExpr("id as k", "id*2 as v"),
        "k",
        cluster_partitions=4,
    )
    man = t.manifest(1)
    empty = spark.createDataFrame([], "k long, v long")
    carried = man["files"]

    results = []
    done = 1
    t_commit_window: list[float] = []
    for cp in checkpoints:
        while done < cp:
            c0 = time.perf_counter()
            t.commit_with_manifest(
                empty, "k", carried=carried, skip_data_write=True
            )
            t_commit_window.append(time.perf_counter() - c0)
            done += 1
        # sample the LAST 20 commits' mean (the cost AT this count)
        commit_ms = (
            1000 * sum(t_commit_window[-20:]) / len(t_commit_window[-20:])
        )
        h0 = time.perf_counter()
        hist = t.history()
        t_hist = time.perf_counter() - h0
        assert len(hist) == done
        d0 = time.perf_counter()
        would = t.vacuum(keep_last=2, dry_run=True)
        t_dry = time.perf_counter() - d0
        r0 = time.perf_counter()
        cold = VersionedParquetTable(root)
        _ = cold.current_version(), cold.manifest(cold.current_version())
        t_resolve = time.perf_counter() - r0
        results.append(
            {
                "versions": done,
                "commit_ms_mean20": round(commit_ms, 2),
                "history_s": round(t_hist, 3),
                "history_ms_per_version": round(1000 * t_hist / done, 3),
                "vacuum_dry_s": round(t_dry, 3),
                "vacuum_dry_would_drop": len(would),
                "cold_resolve_ms": round(1000 * t_resolve, 2),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    # the big one-shot collection, then steady state
    v0 = time.perf_counter()
    dropped = t.vacuum(keep_last=2)
    t_vac = time.perf_counter() - v0
    c0 = time.perf_counter()
    t.commit_with_manifest(empty, "k", carried=carried, skip_data_write=True)
    t_commit_after = time.perf_counter() - c0
    print(
        json.dumps(
            {
                "vacuum_real_s": round(t_vac, 2),
                "dropped_dirs": len(dropped),
                "vacuum_ms_per_dir": round(1000 * t_vac / max(1, len(dropped)), 3),
                "commit_ms_after_vacuum": round(1000 * t_commit_after, 2),
            }
        )
    )
    shutil.rmtree(BASE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
