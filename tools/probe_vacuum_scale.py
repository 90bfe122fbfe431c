"""Probe: vacuum's referenced-set driver cost vs kept-file count —
exact ``set[str]`` vs the salted-Bloom tier.

The collection walk (`_collect_version_refs`) is identical for both
containers; what scales differently is the DRIVER MEMORY of the
container itself and the membership-test wall.  This probe fabricates
a segmented manifest of N entries (same synthetic trick as
probe_manifest_scale — paths are never opened), then measures, for
each container:

* collection wall (walk N refs into the container),
* container resident bytes (tracemalloc delta),
* membership wall for N/10 hits + N/10 misses,
* measured false-positive rate on the misses (exact: must be 0).

Run: python tools/probe_vacuum_scale.py [n_files_csv]
     (default 100000,1000000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_embeddings_pipeline_spark.session import get_spark  # noqa: E402
from airflow_embeddings_pipeline_spark.sources.versioned import (  # noqa: E402
    VersionedParquetTable,
    _SaltedBloomRefs,
)

BASE = "/tmp/probe_vacuum_scale"


def build_synthetic(spark, n_files: int) -> VersionedParquetTable:
    root = os.path.join(BASE, f"syn_{n_files}")
    shutil.rmtree(root, ignore_errors=True)
    t = VersionedParquetTable(root)
    t.commit_with_manifest(
        spark.range(4).selectExpr("id as k", "id * 2 as v"),
        "k",
        cluster_partitions=1,
    )
    rows_per = 10_000
    entries = [
        {
            "path": f"v00000001/syn-{i:08d}.parquet",
            "n_rows": rows_per,
            "bytes": 64 * 1024 * 1024,
            "min": i * rows_per,
            "max": (i + 1) * rows_per - 1,
        }
        for i in range(n_files)
    ]
    empty = spark.createDataFrame([], "k long, v long")
    t.commit_with_manifest(empty, "k", carried=entries, skip_data_write=True)
    return t


def measure(t: VersionedParquetTable, n_files: int, mode: str) -> dict:
    cold = VersionedParquetTable(t.root)
    # the streaming ref walk's transient memory is bounded by the
    # segment LRU cache (class default 2M rows — bigger than these
    # probe sizes); shrink it so the probe shows the AT-SCALE shape,
    # where table files >> cache bound and the walk's residency is
    # the cap, not O(files)
    cold._SEG_CACHE_MAX_ROWS = 64_000
    head = cold.current_version()
    if mode == "bloom":
        container = _SaltedBloomRefs(int(n_files * 2 * 1.5))
    else:
        container = set()
    tracemalloc.start()
    before, _ = tracemalloc.get_traced_memory()
    t0 = time.perf_counter()
    cold._collect_version_refs(head, container)
    collect_wall = time.perf_counter() - t0
    after, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # membership: the sweep tests each on-disk entry against the
    # container — hits (kept files) and misses (dead files)
    hits = [f"v00000001/syn-{i:08d}.parquet" for i in range(0, n_files, 10)]
    misses = [f"v00000099/dead-{i:08d}.parquet" for i in range(n_files // 10)]
    t1 = time.perf_counter()
    n_hit = sum(1 for p in hits if p in container)
    member_wall_hits = time.perf_counter() - t1
    t2 = time.perf_counter()
    n_fp = sum(1 for p in misses if p in container)
    member_wall_misses = time.perf_counter() - t2
    assert n_hit == len(hits), f"{mode}: false negative! {n_hit}/{len(hits)}"
    if mode == "exact":
        assert n_fp == 0
    resident = after - before
    if mode == "bloom":
        container_only = container._n_bytes
    else:
        container_only = sys.getsizeof(container) + sum(
            sys.getsizeof(s) for s in container
        )
    return {
        "mode": mode,
        "n_refs": n_files,
        "collect_wall_s": round(collect_wall, 3),
        "walk_resident_bytes": resident,
        "container_bytes": container_only,
        "bytes_per_ref": round(container_only / n_files, 2),
        "membership_wall_s_per_100k": round(
            (member_wall_hits + member_wall_misses)
            / (len(hits) + len(misses))
            * 100_000,
            3,
        ),
        "false_positive_rate": round(n_fp / max(1, len(misses)), 5),
        "projected_container_bytes_at_1e8_files": int(
            container_only / n_files * 1e8
        ),
    }


def main() -> int:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [100_000, 1_000_000]
    )
    spark = get_spark()
    out = []
    for n in sizes:
        t = build_synthetic(spark, n)
        for mode in ("exact", "bloom"):
            r = measure(t, n, mode)
            out.append(r)
            print(json.dumps(r), flush=True)
    shutil.rmtree(BASE, ignore_errors=True)
    print(json.dumps({"metric": "vacuum_ref_container_scale", "rows": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
