"""Count Spark jobs per pruned-MERGE commit (fixture scale).

The r7 verdict flagged the commit path's accumulated per-commit driver
jobs (band-count aggregate, CAS re-read, constraint aggregate) as the
reason pipeline_e2e_merge outgrew the host factor.  This tool runs one
pruned merge per shape inside a Spark job group and reports how many
jobs the whole merge+commit launched — the before/after evidence for
BASELINE.md "Jobs per pruned-merge commit".

    python tools/count_commit_jobs.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import functions as F

    from airflow_embeddings_pipeline_spark.operators.merge import (
        merge_upsert_write_pruned,
    )
    from airflow_embeddings_pipeline_spark.session import get_spark
    from airflow_embeddings_pipeline_spark.sources.versioned import (
        VersionedParquetTable,
    )

    spark = get_spark("count-commit-jobs")
    sc = spark.sparkContext

    shapes = {
        # one touched band, no out-of-band inserts
        "single_band_update": [(5, 1.0, "u")],
        # two distant bands (list-valued append_split)
        "two_bands": [(5, 1.0, "u"), (199_990, 2.0, "u")],
        # one band + a far-out insert (out-of-band append write)
        "band_plus_insert": [(5, 1.0, "u"), (10_000_000, 3.0, "i")],
    }
    results: dict[str, int] = {}
    tmp = tempfile.mkdtemp(prefix="commitjobs_")
    for label, rows in shapes.items():
        path = os.path.join(tmp, label)
        t = VersionedParquetTable(path)
        base = spark.range(200_000).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0).alias("price"),
            F.lit("base").alias("status"),
        )
        t.commit_with_manifest(base, "k", cluster_partitions=8)
        src = spark.createDataFrame(
            rows, "k long, price double, status string"
        )
        group = f"commit-{label}"
        sc.setJobGroup(group, label)
        merge_upsert_write_pruned(path, src, "k", vacuum_keep_last=None)
        sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        results[label] = len(jobs)
        print(f"{label}: {len(jobs)} jobs")

    # merge-on-read small batch: the r9 hybrid must keep the job count
    # flat (counts job + driver dict sidecar — no executor-side write
    # jobs below the 100k-position inline bound)
    path = os.path.join(tmp, "mor_small_batch")
    t = VersionedParquetTable(path)
    base = spark.range(200_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("price"),
        F.lit("base").alias("status"),
    )
    t.commit_with_manifest(base, "k", cluster_partitions=8)
    src = spark.createDataFrame(
        [(i * 400, -1.0, "u") for i in range(500)],
        "k long, price double, status string",
    )
    group = "commit-mor_small_batch"
    sc.setJobGroup(group, "mor_small_batch")
    merge_upsert_write_pruned(
        path, src, "k", write_mode="mor", vacuum_keep_last=None
    )
    sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    results["mor_small_batch"] = len(jobs)
    print(f"mor_small_batch: {len(jobs)} jobs")
    print({"jobs_per_commit": results})


if __name__ == "__main__":
    main()
