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

Run: python tools/probe_manifest_scale.py [max_files_exponent]
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


def main() -> None:
    spark = get_spark(
        "probe_manifest_scale", master="local[8]", shuffle_partitions=8
    )
    sizes = [256, 1024, 4096]
    if len(sys.argv) > 1:
        sizes = [int(x) for x in sys.argv[1].split(",")]
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
