"""Sinks and file operations — SURVEY §2.1 S4/S6/S7/S8 and §2.9 E1/E3.

The reference stages data as one snappy-parquet file per
(run_ts, source) pair (embeddings-pipeline.py:139-142,248-255), probes
file sizes for metrics (:409-421), and deletes staged files after a
successful merge plus partial files on failure (:261-265,434-458).

Spark-first translation:

* ``write_partitioned_parquet`` — ``partitionBy(keys)`` directory
  layout replaces the filename convention; downstream scans get
  partition *pruning* instead of filename-pattern matching.  Spark's
  file-commit protocol (write to ``_temporary``, atomic rename) makes
  the reference's partial-file rollback (E3) a no-op.
* ``quarantine_split`` — E1: instead of the reference's per-row
  try/except-skip loop (:183,233-235), one predicate splits the frame
  into valid rows and rejects; rejects can be routed to a reject sink
  (the ``badRecordsPath`` pattern) rather than silently dropped.
* ``file_metrics`` — S8: footer/driver-side listing, never a data scan.
* ``cleanup_files`` — S7: best-effort deletes that never raise (E4,
  :452-454).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import Column, DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """S4: columnar sink, one directory per partition key value.

    At 100 TB: partition on low-cardinality routing keys only (e.g.
    ``source``, date) — high-cardinality partitioning creates a
    small-files problem; cardinality × files-per-task files appear.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def quarantine_split(
    df: DataFrame, valid_pred: Column, *, reject_path: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """E1: split into (valid, rejects) on one predicate; optionally
    persist rejects for audit.  Declarative replacement for the
    reference's row-loop skip — the predicate stays inside codegen and
    both branches read the source once each (or once total if the
    caller caches)."""
    valid = df.filter(valid_pred)
    rejects = df.filter(~valid_pred | valid_pred.isNull())
    if reject_path is not None:
        rejects.write.mode("append").parquet(reject_path)
    return valid, rejects


def file_metrics(path: str) -> dict[str, float]:
    """S8: file count / bytes / MB for a parquet file or directory —
    driver-side listing only (metadata probe, no data read)."""
    if os.path.isfile(path):
        files = [path]
    else:
        files = [
            f
            for f in _glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
        ]
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "total_mb": round(total / (1024 * 1024), 3),
    }


def cleanup_files(paths: list[str]) -> list[str]:
    """S7/E4: best-effort delete; failures are collected, never raised
    (cleanup must not fail the pipeline, embeddings-pipeline.py:452-454).
    """
    failed = []
    for p in paths:
        try:
            if os.path.isdir(p):
                import shutil

                shutil.rmtree(p)
            else:
                os.remove(p)
        except Exception:
            failed.append(p)
    return failed


def compact_parquet(
    spark,
    path: str,
    *,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> dict[str, float]:
    """Small-file compaction: rewrite a parquet dataset into
    ~``target_file_mb``-sized files (per partition directory when
    ``partition_by`` is given).

    The operational answer to the small-files problem
    ``write_partitioned_parquet`` warns about: streaming/incremental
    sinks accrete one file per micro-batch per partition, and at 100 TB
    the NameNode/listing cost and per-file task overhead dominate scan
    time.  File count is derived from the dataset's *current on-disk
    bytes* (driver-side listing, no data scan), then the data is
    rewritten through a single shuffle-free coalesce — or a
    ``repartition(partition_keys)`` when partitioned, so each output
    directory is written by tasks that hold only its rows.

    Commits via write-to-tmp + swap.  The swap is two renames, so a
    crash between them leaves the data in ``<path>.__compact_old__``
    with no live ``<path>`` — that window is why the MERGE target uses
    pointer-file commits (``sources/versioned.py``) instead; compaction
    keeps the in-place contract because its callers own the dataset
    exclusively (a maintenance window, not a serving path).  The crash
    state is self-healing: this function restores ``__compact_old__``
    on entry, so re-running the compaction (the natural retry) recovers
    the dataset first.  Returns before/after ``file_metrics``.
    """
    import shutil

    old = path.rstrip("/") + ".__compact_old__"
    if os.path.isdir(old) and not os.path.exists(path):
        os.rename(old, path)  # recover a swap that crashed mid-rename
    before = file_metrics(path)
    n_files = max(1, round(before["total_mb"] / target_file_mb))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    if partition_by:
        from pyspark.sql import functions as F

        writer = (
            df.repartition(n_files, *[F.col(c) for c in partition_by])
            .write.mode("overwrite")
            .option("compression", compression)
            .partitionBy(*partition_by)
        )
    else:
        writer = (
            df.coalesce(n_files).write.mode("overwrite")
            .option("compression", compression)
        )
    writer.parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after = file_metrics(path)
    return {"before_files": before["n_files"], "after_files": after["n_files"],
            "before_mb": before["total_mb"], "after_mb": after["total_mb"]}
