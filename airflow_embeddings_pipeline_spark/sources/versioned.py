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
_LOCK = "_COMMIT_LOCK"
_VERSION_RE = re.compile(r"^v(\d{8})$")
_REMOTE_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


class ConcurrentCommitError(RuntimeError):
    """A second writer attempted to commit while another commit was in
    flight.  Mirrors the reference's ``max_active_runs=1`` run
    serialization (T7, embeddings-pipeline.py:92): overlapping writers
    are a configuration error and must fail loudly, not interleave."""


def _pid_alive(pid: int) -> bool:
    """Is `pid` a live process on this host?  (The table contract is
    local-filesystem, so the lock holder is by definition local.)"""
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


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
        files, no pointer) reads as-is — first commit adopts it.  If an
        adoption crashed mid-way (orphan ``v…`` dirs beside legacy
        files, pointer never written), read only the top-level files:
        the legacy data stays live and the orphans stay invisible
        (they're reclaimed by the next commit/vacuum)."""
        v = self.current_version()
        if v is not None:
            return spark.read.parquet(self._version_dir(v))
        if self._versions_on_disk():
            import glob

            if not glob.glob(os.path.join(self.root, "*.parquet")):
                # Version dirs exist but no pointer and no legacy files:
                # a first commit crashed before its pointer swap.  Say
                # so, instead of Spark's generic path-not-found.
                raise FileNotFoundError(
                    f"{self.root}: no committed version (version dirs "
                    "exist but the pointer was never written — crashed "
                    "first commit?); re-run the commit or vacuum"
                )
            return spark.read.parquet(os.path.join(self.root, "*.parquet"))
        return spark.read.parquet(self.root)

    def read_version(self, spark: SparkSession, version: int) -> DataFrame:
        """Time travel: read a specific committed (or current) version.

        Only versions that were actually live qualify: a version is
        readable when it carries the ``_COMMITTED`` marker AND is at or
        below the current pointer (a marker above the pointer is a
        crash orphan whose pointer swap never landed — it was never
        observable and must not become so retroactively), or when it IS
        the current pointer (compat with tables committed before the
        marker-first ordering)."""
        vdir = self._version_dir(version)
        cur = self.current_version()
        committed = os.path.exists(os.path.join(vdir, _COMMITTED))
        live_history = committed and cur is not None and version <= cur
        if not os.path.isdir(vdir) or not (live_history or version == cur):
            raise FileNotFoundError(
                f"version {version} not available (never committed or vacuumed)"
            )
        return spark.read.parquet(vdir)

    def versions(self) -> list[int]:
        """Committed (readable) versions, oldest first."""
        cur = self.current_version()
        if cur is None:
            return []
        return [
            v
            for v in self._versions_on_disk()
            if v == cur
            or (
                v < cur
                and os.path.exists(os.path.join(self._version_dir(v), _COMMITTED))
            )
        ]

    # ----------------------------------------------------------- commit
    def commit(self, df: DataFrame) -> int:
        """Write ``df`` as the next version, mark it ``_COMMITTED``,
        then swap the pointer (the single atomic commit point).

        Crash-window guarantees: dying during the version write, after
        the marker, or before the pointer swap leaves the previous
        version (or the legacy files) live; the orphan directory is
        above the pointer so no read path can observe it, and it is
        reclaimed here (reconcile) or by ``vacuum``.  Marker BEFORE
        pointer means every version that was ever live carries the
        marker — a later commit can never make live history look like
        an orphan.

        Single-writer guard: the whole commit runs under an exclusive
        lock file (``O_CREAT|O_EXCL`` — atomic on POSIX).  A second
        in-flight writer raises :class:`ConcurrentCommitError` loudly
        instead of interleaving version numbers / racing the pointer
        swap.  A lock left by a CRASHED committer (its pid no longer
        alive on this host) is stolen; a live holder is never."""
        self._acquire_lock()
        try:
            self._reconcile_orphans()
            versions = self._versions_on_disk()
            next_v = (versions[-1] + 1) if versions else 1
            vdir = self._version_dir(next_v)
            df.write.mode("overwrite").parquet(vdir)
            with open(os.path.join(vdir, _COMMITTED), "w") as f:
                f.flush()
                os.fsync(f.fileno())
            self._swap_pointer(next_v)
            return next_v
        finally:
            self._release_lock()

    def _lock_path(self) -> str:
        return os.path.join(self.root, _LOCK)

    def _acquire_lock(self) -> None:
        os.makedirs(self.root, exist_ok=True)
        for _ in range(2):  # second pass only after stale-lock steal
            try:
                fd = os.open(
                    self._lock_path(), os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                with os.fdopen(fd, "w") as f:
                    f.write(str(os.getpid()))
                return
            except FileExistsError:
                try:
                    with open(self._lock_path()) as f:
                        holder = int(f.read().strip() or 0)
                except (OSError, ValueError):
                    holder = 0
                if holder and holder != os.getpid() and not _pid_alive(holder):
                    # Crashed committer: steal ATOMICALLY via rename to a
                    # unique grave name — exactly one contending stealer's
                    # rename succeeds, so the unlink-then-create TOCTOU
                    # (slow stealer deleting the fast stealer's fresh
                    # lock) cannot occur.  The loser's rename raises and
                    # it retries the O_EXCL create, seeing the winner's
                    # new lock as a live holder.
                    import uuid

                    grave = f"{self._lock_path()}.stale.{uuid.uuid4().hex}"
                    try:
                        os.rename(self._lock_path(), grave)
                    except OSError:
                        pass  # another contender stole (or released) first
                    else:
                        try:
                            os.unlink(grave)  # we own the unique name
                        except OSError:
                            pass
                    continue
                raise ConcurrentCommitError(
                    f"{self.root}: commit already in flight (lock held by "
                    f"pid {holder or '?'}); serialize writers — this table "
                    "contract is single-writer (reference max_active_runs=1)"
                )
        raise ConcurrentCommitError(
            f"{self.root}: could not acquire commit lock after stale steal"
        )

    def _release_lock(self) -> None:
        try:
            os.unlink(self._lock_path())
        except OSError:
            pass

    def _reconcile_orphans(self) -> None:
        """Delete version dirs a crashed commit left above the pointer
        (or any version dirs on a pointer-less legacy table — a crashed
        adoption).  Safe by construction: nothing at or above these
        paths was ever named by the pointer, so no reader targets them."""
        cur = self.current_version()
        for v in self._versions_on_disk():
            if cur is None or v > cur:
                shutil.rmtree(self._version_dir(v), ignore_errors=True)

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
