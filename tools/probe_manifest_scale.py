"""Probe: commit METADATA cost vs table file count — inline manifests
rewrite the full entry list per commit (O(table files)); segmented
manifests carry untouched segments by reference (O(touched entries)).

Scenario: a table of N files receives a one-file append commit (the
daily-batch shape).  We measure the manifest metadata BYTES WRITTEN by
that commit (JSON doc + any new segment files) and its wall, for
growing N, in both storage forms.  The inline form's bytes grow
linearly with N — at 800k files (≈100 TB) that extrapolates to a
~250 MB metadata rewrite per tiny commit, which on an object store is
also a 250 MB PUT on the commit critical path.  The segmented form is
flat: one small JSON + one ~single-entry segment.

Run: python tools/probe_manifest_scale.py [sizes_csv]
     python tools/probe_manifest_scale.py [sizes_csv] --synthetic

``--synthetic`` (round 10) scales the measurement to 10^5–10^6
entries WITHOUT writing that many data files: the manifest entries
are fabricated (paths under a committed version dir; the metadata
paths never open data files), which is exactly what the metadata-cost
questions need — commit metadata I/O for a small append, point-read
candidate materialization (segments loaded), and CDF segment-diff
cost, all of which must stay FLAT in table size.  The synthetic mode
only runs the segmented form (an inline manifest at 10^6 entries is
the ~300 MB-per-commit wall the probe's real mode already measured —
there is nothing left to learn by paying it).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_embeddings_pipeline_spark.session import get_spark  # noqa: E402
from airflow_embeddings_pipeline_spark.sources.versioned import (  # noqa: E402
    VersionedParquetTable,
)

BASE = "/tmp/probe_manifest_scale"


def _meta_bytes(root: str, version: int) -> int:
    """Manifest metadata bytes WRITTEN by ``version``'s commit: its
    JSON doc plus any segment files in its own version dir (carried
    segments live in older dirs and cost nothing)."""
    vdir = os.path.join(root, f"v{version:08d}")
    total = os.path.getsize(os.path.join(vdir, "_MANIFEST.json"))
    for p in glob.glob(os.path.join(vdir, "_mseg-*.parquet")):
        total += os.path.getsize(p)
    for p in glob.glob(os.path.join(vdir, "_msegl-*.json")):
        total += os.path.getsize(p)
    return total


def run(n_files: int, segmented: bool, spark) -> dict:
    root = os.path.join(BASE, f"{'seg' if segmented else 'inl'}_{n_files}")
    shutil.rmtree(root, ignore_errors=True)
    t = VersionedParquetTable(root)
    if segmented:
        t.manifest_inline_max = 64
        t.manifest_segment_rows = 256
    else:
        t.manifest_inline_max = 10**9  # force inline at any size
    # n_files single-row files via one clustered commit
    t.commit_with_manifest(
        spark.range(n_files).selectExpr("id as k", "id * 2 as v"),
        "k",
        cluster_partitions=n_files,
    )
    man = t.manifest(t.current_version())
    assert len(man["files"]) == n_files, len(man["files"])
    # the measured operation: ONE small append commit
    t0 = time.perf_counter()
    v = t.commit_with_manifest(
        spark.range(n_files * 2, n_files * 2 + 4).selectExpr(
            "id as k", "id * 2 as v"
        ),
        "k",
        carried=man["files"],
        cluster_partitions=1,
    )
    wall = time.perf_counter() - t0
    # DML leg: a narrow delete — on the segmented form the WHOLE op
    # (candidate pruning + scan + carried-by-base commit) must load a
    # handful of segments, not the table's entry list
    t_dml = VersionedParquetTable(root)  # cold caches
    if segmented:
        t_dml.manifest_inline_max = 64
        t_dml.manifest_segment_rows = 256
    else:
        t_dml.manifest_inline_max = 10**9
    t1 = time.perf_counter()
    r = t_dml.delete_where(spark, "k < 8")
    dml_wall = time.perf_counter() - t1
    assert r["rows_deleted"] == 8, r
    return {
        "n_files": n_files,
        "form": "segmented" if segmented else "inline",
        "commit_meta_bytes": _meta_bytes(root, v),
        "commit_wall_s": round(wall, 3),
        "dml_wall_s": round(dml_wall, 3),
        "dml_meta_bytes": _meta_bytes(root, t_dml.current_version()),
        "dml_segments_loaded": (
            len(t_dml._seg_cache) if segmented else None
        ),
    }


def run_synthetic(n_files: int, spark, two_level: bool = False) -> dict:
    """Metadata-path costs at ``n_files`` SYNTHETIC entries (segmented
    form, default production segment size).  Measures, on cold
    instances: (1) a small append commit's metadata bytes + wall +
    segments loaded, (2) a point-read's candidate materialization
    (``_materialize_pruned`` — the metadata half of ``read_range``),
    (3) a CDF segment diff across the append.  Data files are never
    opened — entries carry fabricated paths under the bootstrap
    version dir, which the commit's path validation accepts (it checks
    the version-dir prefix, not existence; nothing here reads rows)."""
    root = os.path.join(BASE, f"syn_{n_files}")
    shutil.rmtree(root, ignore_errors=True)

    def _tune(tab):
        # --two-level: scale the thresholds down (the same trick the
        # real-mode run() uses for manifest_inline_max) so the LEVEL-2
        # ref-list machinery engages at probe-friendly sizes; the
        # production defaults engage past ~16.7M files
        if two_level:
            tab.manifest_segment_rows = 256
            tab.manifest_seglist_inline_max = 64
            tab.manifest_seglist_chunk_refs = 64
        return tab

    t = _tune(VersionedParquetTable(root))
    # bootstrap v1: a real (tiny) committed table
    t.commit_with_manifest(
        spark.range(4).selectExpr("id as k", "id * 2 as v"),
        "k",
        cluster_partitions=1,
    )
    # v2: the synthetic big manifest — n_files entries, disjoint
    # [min, max] key ranges, default segment fanout
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
    t0 = time.perf_counter()
    t.commit_with_manifest(
        empty, "k", carried=entries, skip_data_write=True
    )
    build_wall = time.perf_counter() - t0
    raw = t._raw_manifest(t.current_version())
    n_segs = len(t._seg_refs(raw) or [])
    root_doc_bytes = _meta_bytes(root, t.current_version())

    # (1) small append commit on a COLD instance
    ta = _tune(VersionedParquetTable(root))
    t1 = time.perf_counter()
    va = ta.commit_with_manifest(
        spark.range(10**10, 10**10 + 4).selectExpr("id as k", "id*2 as v"),
        "k",
        carried_base_version=2,
        expected_base_version=2,
        cluster_partitions=1,
    )
    append_wall = time.perf_counter() - t1
    append_meta = _meta_bytes(root, va)
    append_segs_loaded = len(ta._seg_cache)

    # (2) point-read candidate materialization (metadata half of
    # read_range) on a COLD instance
    tr = _tune(VersionedParquetTable(root))
    probe_lo, probe_hi = 5 * rows_per, 7 * rows_per
    t2 = time.perf_counter()
    man = tr._materialize_pruned(
        va,
        lambda e: e.get("min") is None
        or (e["max"] >= probe_lo and e["min"] <= probe_hi),
    )
    read_wall = time.perf_counter() - t2
    read_segs_loaded = len(tr._seg_cache)
    kept = [
        e
        for e in man["files"]
        if e["min"] is not None
        and e["max"] >= probe_lo
        and e["min"] <= probe_hi
    ]
    assert 1 <= len(kept) <= 8, len(kept)

    # (3) CDF segment diff across the append on a COLD instance
    td = _tune(VersionedParquetTable(root))
    t3 = time.perf_counter()
    fm, tm = td._diff_file_maps(2, va)
    diff_wall = time.perf_counter() - t3
    diff_segs_loaded = len(td._seg_cache)
    changed = {p for p in tm if fm.get(p) != tm[p]}
    assert changed and len(changed) <= 8, len(changed)

    raw_append = t._raw_manifest(va)
    shutil.rmtree(root, ignore_errors=True)
    return {
        "n_files": n_files,
        "form": (
            "segmented-synthetic-2level"
            if two_level
            else "segmented-synthetic"
        ),
        "segments": n_segs,
        "seg_ref_chunks": len(
            (raw_append or {}).get("seg_ref_lists") or []
        ),
        "append_chunks_loaded": len(ta._seglist_cache),
        "read_chunks_loaded": len(tr._seglist_cache),
        "build_wall_s": round(build_wall, 3),
        "root_doc_bytes": root_doc_bytes,
        "append_meta_bytes": append_meta,
        "append_wall_s": round(append_wall, 3),
        "append_segments_loaded": append_segs_loaded,
        "read_wall_s": round(read_wall, 3),
        "read_segments_loaded": read_segs_loaded,
        "cdf_diff_wall_s": round(diff_wall, 3),
        "cdf_segments_loaded": diff_segs_loaded,
    }


def main() -> None:
    synthetic = "--synthetic" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark(
        "probe_manifest_scale", master="local[8]", shuffle_partitions=8
    )
    if synthetic:
        two_level = "--two-level" in sys.argv
        sizes = [10_000, 100_000, 1_000_000]
        if args:
            sizes = [int(x) for x in args[0].split(",")]
        rows = []
        for n in sizes:
            r = run_synthetic(n, spark, two_level=two_level)
            rows.append(r)
            print(json.dumps(r), flush=True)
        lo, hi = rows[0], rows[-1]
        print(
            json.dumps(
                {
                    "files_growth": round(hi["n_files"] / lo["n_files"], 1),
                    "append_meta_growth": round(
                        hi["append_meta_bytes"] / lo["append_meta_bytes"], 2
                    ),
                    "read_segs_hi": hi["read_segments_loaded"],
                    "cdf_segs_hi": hi["cdf_segments_loaded"],
                }
            )
        )
        shutil.rmtree(BASE, ignore_errors=True)
        spark.stop()
        return
    sizes = [256, 1024, 4096]
    if args:
        sizes = [int(x) for x in args[0].split(",")]
    rows = []
    for n in sizes:
        for segmented in (False, True):
            r = run(n, segmented, spark)
            rows.append(r)
            print(json.dumps(r), flush=True)
    # summary: bytes growth inline vs segmented
    inl = {r["n_files"]: r for r in rows if r["form"] == "inline"}
    seg = {r["n_files"]: r for r in rows if r["form"] == "segmented"}
    lo, hi = min(inl), max(inl)
    print(
        json.dumps(
            {
                "inline_bytes_growth": round(
                    inl[hi]["commit_meta_bytes"] / inl[lo]["commit_meta_bytes"], 1
                ),
                "segmented_bytes_growth": round(
                    seg[hi]["commit_meta_bytes"] / seg[lo]["commit_meta_bytes"], 1
                ),
                "bytes_ratio_at_max": round(
                    inl[hi]["commit_meta_bytes"] / seg[hi]["commit_meta_bytes"], 1
                ),
                "files_growth": round(hi / lo, 1),
            }
        )
    )
    shutil.rmtree(BASE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
