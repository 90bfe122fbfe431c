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
