"""CDF streaming-source catch-up probe: N NARROW daily-shaped pruned
merges (the long-horizon regime: each touches a small key band) against
a seeded table, then ONE AvailableNow drain of the whole backlog.

What it measures — the source's scale contract, empirically:

* bytes_diff: the total parquet bytes the N commit steps' file diffs
  expose (what the streaming source READS), vs bytes_table (what a
  naive snapshot-diff consumer would read per commit).  The ratio is
  the read-amplification bound: at 100 TB the feed costs the touched
  mass, not the table.
* rows_feed: net change rows emitted (each step's touched files hold
  mostly-unchanged rows that the vectorized diff suppresses).
* wall of the single catch-up drain (N independent per-step partitions
  fan out across cores).

Usage: python tools/probe_cdf_catchup.py [rows] [commits]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    commits = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from pyspark.sql import SparkSession, functions as F

    from airflow_embeddings_pipeline_spark.operators.merge import (
        merge_upsert_write_pruned,
    )
    from airflow_embeddings_pipeline_spark.sources.versioned import (
        VersionedParquetTable,
    )
    from airflow_embeddings_pipeline_spark.sources.versioned_stream import (
        read_changes_stream,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("probe-cdf-catchup")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="cdf_catchup_")
    t = VersionedParquetTable(root)
    t.commit_with_manifest(
        spark.range(rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 997).cast("double").alias("price"),
            F.lit("base").alias("status"),
        ),
        "k",
        cluster_partitions=32,
    )

    band = max(1, rows // (commits * 4))  # narrow key band per commit
    bytes_rewritten = 0
    for c in range(commits):
        lo = (c * 7919 * band) % max(1, rows - band)
        upd = spark.range(lo, lo + 1_000).select(
            F.col("id").alias("k"),
            F.lit(float(c)).alias("price"),
            F.lit(f"u{c}").alias("status"),
        )
        stats = merge_upsert_write_pruned(
            root, upd, "k", vacuum_keep_last=None
        )
        bytes_rewritten += stats["bytes_rewritten"]

    # what the feed reads: per-step manifest file diffs (both sides)
    bytes_diff = 0
    for v in range(1, commits + 1):
        man_f = t.manifest(v)
        man_t2 = t.manifest(v + 1)
        pf = {e["path"]: e for e in man_f["files"]}
        pt = {e["path"]: e for e in man_t2["files"]}
        for p in set(pf) ^ set(pt):
            bytes_diff += (pf.get(p) or pt.get(p)).get("bytes") or 0
    man = t.manifest(t.current_version())
    bytes_table = sum(e["bytes"] for e in man["files"])

    t0 = time.time()
    qname = "cdf_catchup_out"
    q = (
        read_changes_stream(spark, root, starting_version=1)
        .writeStream.format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="ckpt_catchup_")
        )
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    feed = spark.table(qname)
    rows_feed = feed.count()
    steps = feed.select("_commit_version").distinct().count()

    out = {
        "metric": "cdf_catchup_read_amplification",
        "rows": rows,
        "commits": commits,
        "bytes_table": bytes_table,
        "bytes_diff_read_by_feed": bytes_diff,
        "bytes_naive_snapshot_diffs": bytes_table * commits,
        "amplification_vs_naive": round(
            bytes_diff / max(1, bytes_table * commits), 4
        ),
        "rows_feed": rows_feed,
        "steps_in_one_drain": steps,
        "drain_wall_s": round(wall, 1),
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    return 0 if steps == commits else 1


if __name__ == "__main__":
    raise SystemExit(main())
