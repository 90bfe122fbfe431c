"""Pluggable commit protocol for the versioned table.

The versioned table's commit sequence (lock → CAS → write → marker →
pointer publish) is correct on any storage that provides FOUR
primitives.  This module isolates them behind a seam so the
"object-store-safe" design claim is code, not prose:

========================  ==========================  =======================
primitive                 POSIX implementation        object-store mapping
========================  ==========================  =======================
``create_exclusive``      ``open(O_CREAT|O_EXCL)``    conditional PUT
                                                      (S3 ``If-None-Match:*``,
                                                      GCS ``ifGenerationMatch=0``)
``publish_pointer``       tmp file + ``rename(2)``    *rename-free*: the
                          of ``_CURRENT``             pointer IS a
                                                      conditionally-created
                                                      per-version object
                                                      ``_ptr-v{N}`` — the
                                                      create is the CAS
``delete_if_content``     read + ``unlink`` (same-    conditional DELETE
                          host TOCTOU documented)     (GCS generation
                                                      precondition / S3
                                                      ``If-Match`` ETag)
``put_file``              tmp + ``rename``            plain PUT (atomic
                                                      whole-object on every
                                                      store)
========================  ==========================  =======================

Two implementations ship:

* :class:`PosixCommitProtocol` (default) — today's behavior, byte-
  compatible with every table ever written: ``_CURRENT`` pointer file
  replaced via same-directory rename, grave-rename lock steal.
* :class:`ObjectStoreCommitProtocol` — the RENAME-FREE protocol: it
  never calls ``os.rename``/``os.replace``.  The live version is
  ``max`` over LIST of ``_ptr-v*`` marker objects (S3/GCS LIST is
  strongly consistent since 2020), published by conditional-create;
  ``put_file`` is a plain write (only ever used for objects that are
  invisible until the pointer names their version, so whole-object
  PUT atomicity — which every object store provides natively — is the
  only requirement); the lock steal uses ``delete_if_content``, whose
  LOCAL emulation has a read-check-unlink window that a real store
  closes with a generation/ETag precondition.  Suitable for local
  testing of the protocol contract and as the template for an
  fsspec-backed remote implementation.

Protocol choice is per-table state, not per-open: every writer and
reader of a table must use the same protocol (the object-store
protocol reads a legacy ``_CURRENT`` pointer as a MIGRATION fallback
when no ``_ptr-v*`` object exists yet, so switching posix →
object-store on an existing table is safe; the reverse is not).

The one-way contract is ENFORCED, not prose: the first object-store
publish stamps a ``_PROTOCOL`` marker object at the table root, and
every posix pointer read/publish re-checks it (one O(1) stat —
independent of table size), raising :class:`ProtocolMixingError`
instead of reading the permanently-stale ``_CURRENT`` (whose next
commit's orphan reconcile would rmtree every object-store-committed
version above it — silent destruction of committed data).  Tables
migrated by code that predates the marker are caught at the next
write: posix ``publish_pointer`` also LISTs for ``_ptr-v*`` objects,
and the table layer's version listing re-checks under the commit
lock before any reconcile runs.
"""

from __future__ import annotations

import os
import re

# \d{8,}: versions keep resolving past 99,999,999 — max() compares
# ints, so longer digit runs order correctly; only the zero-padded
# WIDTH is fixed at publish time, which sorts correctly for 8+ digits
# because shorter (8-digit) names are always numerically smaller
_PTR_RE = re.compile(r"^_ptr-v(\d{8,})$")

#: marker object stamped by the first object-store publish; posix
#: opens of a migrated table fail loudly on it instead of reading the
#: stale ``_CURRENT``
_PROTOCOL_MARKER = "_PROTOCOL"


class ProtocolMixingError(RuntimeError):
    """A posix-protocol handle touched a table that has object-store
    commits: its ``_CURRENT`` pointer is permanently stale, and acting
    on it would present old data (reads) or reconcile-away committed
    versions (writes).  Re-open the table with
    ``commit_protocol="object-store"`` (or ``None`` for
    auto-detection)."""


class PosixCommitProtocol:
    """POSIX primitives: O_EXCL create, rename-based atomic replace,
    grave-rename lock steal.  The default — matches every table
    written before the seam existed."""

    name = "posix"

    def __init__(self, root: str):
        self.root = root

    # ---- small-object I/O (lock file, markers)
    def read_small(self, rel: str) -> str | None:
        try:
            with open(os.path.join(self.root, rel)) as f:
                return f.read()
        except OSError:
            return None

    def put_file(self, rel: str, content: str) -> None:
        """Durable whole-file write.  POSIX: tmp + rename so a crashed
        write never leaves a partial file at the target name."""
        path = os.path.join(self.root, rel)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def create_exclusive(self, rel: str, content: str) -> bool:
        """Atomic create-if-absent.  True = created (we own it)."""
        try:
            fd = os.open(
                os.path.join(self.root, rel),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(content)
        return True

    def delete(self, rel: str) -> None:
        try:
            os.unlink(os.path.join(self.root, rel))
        except OSError:
            pass

    def delete_if_content(self, rel: str, expected: str) -> bool:
        """Delete ``rel`` only if it still holds ``expected`` — the
        lock-steal primitive.  POSIX: atomic grave-rename (exactly one
        contending stealer's rename succeeds), content re-checked in
        the grave, link-back if a fresh lock was renamed away by
        mistake.  Returns True when the expected content was buried."""
        import uuid

        path = os.path.join(self.root, rel)
        grave = f"{path}.stale.{uuid.uuid4().hex}"
        try:
            os.rename(path, grave)
        except OSError:
            return False  # another contender stole/released first
        try:
            with open(grave) as f:
                buried = f.read()
        except OSError:
            buried = ""
        if buried.strip() == expected.strip():
            try:
                os.unlink(grave)
            except OSError:
                pass
            return True
        # fresh lock renamed away by mistake: restore it without
        # clobbering a third contender's create
        try:
            os.link(grave, path)
        except OSError:
            pass  # a new lock exists; theirs stands
        try:
            os.unlink(grave)
        except OSError:
            pass
        return False

    # ---- protocol-mixing guard
    def _assert_not_migrated(self, *, list_ptrs: bool = False) -> None:
        """Raise :class:`ProtocolMixingError` when the table has
        object-store commits this posix handle cannot see.  The marker
        stat is O(1) and guards every pointer read; ``list_ptrs`` adds
        the LIST scan for tables migrated by pre-marker code — paid
        only at publish time (one listdir per commit)."""
        marker = self.read_small(_PROTOCOL_MARKER)
        if marker is not None and marker.strip() == "object-store":
            raise ProtocolMixingError(
                f"{self.root}: table has object-store commits "
                f"({_PROTOCOL_MARKER} marker); the posix protocol's "
                "_CURRENT pointer is permanently stale — re-open with "
                'commit_protocol="object-store" or None (auto-detect)'
            )
        if list_ptrs:
            try:
                names = os.listdir(self.root)
            except OSError:
                return
            if any(_PTR_RE.match(n) for n in names):
                raise ProtocolMixingError(
                    f"{self.root}: _ptr-v* pointer objects exist "
                    "(object-store commits, pre-marker) — the posix "
                    "protocol must not publish over them; re-open "
                    'with commit_protocol="object-store" or None'
                )

    # ---- pointer
    def _read_current(self) -> str | None:
        v = self.read_small("_CURRENT")
        return v.strip() if v is not None else None

    def read_pointer(self) -> str | None:
        """Raw pointer name (``v00000012``) or None (no table)."""
        self._assert_not_migrated()
        return self._read_current()

    def gc_pointers(self, keep_min_version: int) -> int:
        """Reclaim pointer metadata below the retention horizon —
        no-op for the single-file posix pointer; the object-store
        protocol deletes superseded ``_ptr-v*`` objects so its
        LIST-max resolution stays bounded by retention, not by table
        lifetime.  Returns the number of objects removed."""
        return 0

    def publish_pointer(self, name: str) -> None:
        """The atomic commit point."""
        # publish is the destructive commitment: re-check migration
        # with the full LIST (catches pre-marker migrated tables the
        # O(1) marker stat cannot) — one listdir per commit
        self._assert_not_migrated(list_ptrs=True)
        self.put_file("_CURRENT", f"{name}\n")
        # fsync the directory so the rename itself is durable
        dfd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)


class ObjectStoreCommitProtocol(PosixCommitProtocol):
    """Rename-free protocol: conditional-create of a per-version
    ``_ptr-v{N}`` object IS the publish (and, under the commit lock,
    cannot collide); the live version is the max listed pointer
    object.  Never calls ``os.rename``/``os.replace`` — every
    primitive maps 1:1 onto conditional object-store operations (see
    the module table).  The local file operations below EMULATE those
    store operations for testing; a remote deployment swaps the
    bodies for S3/GCS calls with the stated preconditions."""

    name = "object-store"

    def put_file(self, rel: str, content: str) -> None:
        # plain whole-object PUT: callers only use this for objects
        # that stay invisible until the pointer names their version,
        # so the store's native whole-object atomicity suffices and
        # no rename is needed
        path = os.path.join(self.root, rel)
        with open(path, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())

    def delete_if_content(self, rel: str, expected: str) -> bool:
        # conditional DELETE: a real store pins the read's
        # generation/ETag so the delete fails if the object changed;
        # the local emulation's read-unlink window is the documented
        # fidelity gap of the shim, not of the protocol
        cur = self.read_small(rel)
        if cur is None or cur.strip() != expected.strip():
            return False
        try:
            os.unlink(os.path.join(self.root, rel))
        except OSError:
            return False
        return True

    def _assert_not_migrated(self, *, list_ptrs: bool = False) -> None:
        # posix → object-store migration is the SUPPORTED direction:
        # this protocol reads the legacy pointer as a fallback and its
        # first publish stamps the marker, so no guard applies
        return

    def read_pointer(self) -> str | None:
        try:
            names = os.listdir(self.root)
        except OSError:
            return None
        vs = [m.group(1) for n in names if (m := _PTR_RE.match(n))]
        if vs:
            return f"v{max(int(v) for v in vs):08d}"
        # migration fallback: a table last written by the posix
        # protocol still resolves (first object-store commit then
        # publishes a _ptr-v* at a HIGHER version, which wins the max)
        return self._read_current()

    def gc_pointers(self, keep_min_version: int) -> int:
        # safe in any order and through crashes: the max pointer is
        # the CURRENT version, which is always >= keep_min_version,
        # so LIST-max resolution never changes while old ptrs go
        try:
            names = os.listdir(self.root)
        except OSError:
            return 0
        n = 0
        for name in names:
            m = _PTR_RE.match(name)
            if m and int(m.group(1)) < keep_min_version:
                self.delete(name)
                n += 1
        return n

    def publish_pointer(self, name: str) -> None:
        # stamp the one-way migration marker BEFORE the pointer goes
        # live: any posix handle's next pointer read fails loudly
        # (O(1) stat) instead of acting on the stale _CURRENT.
        # Idempotent plain PUT — rewriting the same content is safe,
        # and create-if-absent semantics are not needed here
        if (self.read_small(_PROTOCOL_MARKER) or "").strip() != "object-store":
            self.put_file(_PROTOCOL_MARKER, "object-store\n")
        ptr = f"_ptr-{name}"
        if not self.create_exclusive(ptr, f"{name}\n"):
            # under the commit lock this version number is ours alone;
            # an existing object means corruption or a protocol-mixing
            # writer — fail loudly, publish nothing
            raise FileExistsError(
                f"{os.path.join(self.root, ptr)}: version already "
                "published — concurrent writer outside the lock?"
            )
        dfd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)


_PROTOCOLS = {
    "posix": PosixCommitProtocol,
    "object-store": ObjectStoreCommitProtocol,
}


def resolve_protocol(spec, root: str):
    """``None``/name/class/instance → a protocol instance for root.

    ``None`` AUTO-DETECTS from the table's on-disk state: a table that
    has ever published a ``_ptr-v*`` pointer object is an object-store
    table and every later opener (including the merge/DML paths, which
    construct their own instances) must speak that protocol; anything
    else — including a brand-new root — defaults to posix.  The
    protocol therefore STICKS after the first object-store commit
    without any plumbing through the operator APIs.

    Detection cost: one O(1) ``_PROTOCOL`` marker read for any table
    written since the marker existed; the LIST scan only runs for
    marker-less roots (legacy migrated tables and posix tables —
    measured flat by tools/probe_version_scale.py)."""
    if spec is None:
        try:
            with open(os.path.join(root, _PROTOCOL_MARKER)) as f:
                if f.read().strip() == "object-store":
                    return ObjectStoreCommitProtocol(root)
        except OSError:
            pass
        try:
            if any(_PTR_RE.match(n) for n in os.listdir(root)):
                return ObjectStoreCommitProtocol(root)
        except OSError:
            pass
        return PosixCommitProtocol(root)
    if isinstance(spec, str):
        try:
            return _PROTOCOLS[spec](root)
        except KeyError:
            raise ValueError(
                f"unknown commit protocol {spec!r}; "
                f"one of {sorted(_PROTOCOLS)}"
            ) from None
    if isinstance(spec, type):
        return spec(root)
    return spec
