"""Versioned parquet table with pointer-file commits (S4/S6/E3).

The reference stages MERGE output on an object store before loading
(embeddings-pipeline.py:248-255, GCS staged parquet).  Object-store
semantics make "atomic directory rename" a non-operation — renames are
copy+delete and a crash mid-swap loses the live table.  The durable
pattern (what Delta/Iceberg do underneath) is:

* every commit writes a brand-new immutable version directory
  ``v00000001/``, ``v00000002/``, …
* a single tiny pointer file ``_CURRENT`` names the live version;
  readers resolve the pointer, then read only that directory
* the pointer is replaced LAST, via one atomic primitive (POSIX
  ``rename(2)`` of a same-directory temp file here; a single-key PUT
  on an object store) — a crash anywhere before the pointer swap
  leaves the previous version live and readable, and the orphaned
  half-written directory is invisible to readers
* old versions stay on disk until ``vacuum`` — time-travel for free,
  and concurrent readers of the previous version never see files
  disappear mid-scan

This module is the local-filesystem implementation of that contract.
Non-local URIs are rejected loudly: on a real cluster, swap this class
for Delta/Iceberg (same commit semantics, jar-provided).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"
_COMMITTED = "_COMMITTED"
_VERSION_RE = re.compile(r"^v(\d{8})$")
_REMOTE_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def _check_local(path: str) -> str:
    if _REMOTE_RE.match(path) and not path.startswith("file://"):
        raise ValueError(
            f"VersionedParquetTable commits via POSIX rename and only "
            f"supports local paths; got {path!r}. On HDFS/S3/GCS use a "
            f"table format with the same pointer-commit contract "
            f"(Delta Lake / Iceberg MERGE INTO)."
        )
    return path.removeprefix("file://")


class VersionedParquetTable:
    """A directory of immutable version subdirs + a ``_CURRENT`` pointer."""

    def __init__(self, root: str):
        self.root = _check_local(root).rstrip("/")

    # ------------------------------------------------------------ state
    def _pointer_path(self) -> str:
        return os.path.join(self.root, _POINTER)

    def current_version(self) -> int | None:
        """Version named by the pointer; None for a legacy plain-parquet
        directory (or an empty/absent table)."""
        try:
            with open(self._pointer_path()) as f:
                name = f.read().strip()
        except OSError:
            return None
        m = _VERSION_RE.match(name)
        if not m:
            raise ValueError(f"corrupt {_POINTER} pointer: {name!r}")
        return int(m.group(1))

    def _versions_on_disk(self) -> list[int]:
        try:
            names = os.listdir(self.root)
        except OSError:
            return []
        return sorted(
            int(m.group(1)) for n in names if (m := _VERSION_RE.match(n))
        )

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:08d}")

    def exists(self) -> bool:
        return os.path.isdir(self.root)

    # ------------------------------------------------------------- read
    def read(self, spark: SparkSession) -> DataFrame:
        """Read the live version.  A legacy directory (plain parquet
        files, no pointer) reads as-is — first commit adopts it."""
        v = self.current_version()
        if v is None:
            return spark.read.parquet(self.root)
        return spark.read.parquet(self._version_dir(v))

    def read_version(self, spark: SparkSession, version: int) -> DataFrame:
        """Time travel: read a specific committed (or current) version.

        Only versions that were actually live qualify — crash orphans
        (no ``_COMMITTED`` marker, never pointed at) raise the same
        error as a vacuumed version, so a reader can't observe a
        half-written snapshot."""
        vdir = self._version_dir(version)
        committed = os.path.exists(os.path.join(vdir, _COMMITTED))
        if not os.path.isdir(vdir) or not (
            committed or version == self.current_version()
        ):
            raise FileNotFoundError(
                f"version {version} not available (never committed or vacuumed)"
            )
        return spark.read.parquet(vdir)

    def versions(self) -> list[int]:
        """Committed (readable) versions, oldest first."""
        cur = self.current_version()
        return [
            v
            for v in self._versions_on_disk()
            if os.path.exists(os.path.join(self._version_dir(v), _COMMITTED))
            or v == cur
        ]

    # ----------------------------------------------------------- commit
    def commit(self, df: DataFrame) -> int:
        """Write ``df`` as the next version, then swap the pointer.

        Crash-window guarantees: dying during the version write or
        before the pointer swap leaves the previous version live; the
        orphan directory is skipped by version numbering (next commit
        takes max-on-disk + 1) and reclaimed by ``vacuum``."""
        versions = self._versions_on_disk()
        next_v = (versions[-1] + 1) if versions else 1
        vdir = self._version_dir(next_v)
        df.write.mode("overwrite").parquet(vdir)
        self._swap_pointer(next_v)
        # Lineage marker for vacuum: distinguishes versions that were
        # actually live from crash orphans.  Written after the swap, so
        # the current version is treated as committed regardless.
        with open(os.path.join(vdir, _COMMITTED), "w"):
            pass
        return next_v

    def _swap_pointer(self, version: int) -> None:
        tmp = self._pointer_path() + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(f"v{version:08d}\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path())  # the atomic commit point
        # fsync the directory so the rename itself is durable
        dfd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    # ----------------------------------------------------------- vacuum
    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Reclaim crash orphans (version dirs without a ``_COMMITTED``
        marker that are not current) and all but the newest
        ``keep_last - 1`` previously-live versions below the current
        one.  Never touches legacy files."""
        current = self.current_version()
        if current is None:
            return []
        committed_older = [
            v
            for v in self._versions_on_disk()
            if v < current
            and os.path.exists(os.path.join(self._version_dir(v), _COMMITTED))
        ]
        keep = {current}
        keep.update(committed_older[-(keep_last - 1):] if keep_last > 1 else [])
        dropped = []
        for v in self._versions_on_disk():
            if v not in keep:
                shutil.rmtree(self._version_dir(v), ignore_errors=True)
                dropped.append(v)
        return dropped
