"""In-process object store with REAL conditional-operation semantics,
for exercising the rename-free commit protocol against the store
behaviors the posix shim cannot express.

The ``ObjectStoreCommitProtocol`` in :mod:`.commit_protocol` documents
its mapping onto S3/GCS conditional operations, but its local
emulation implements them with plain file ops — correct by
construction, with two honestly-documented fidelity gaps:

* ``delete_if_content`` has a read-check-unlink window (a real store
  pins the read's generation/ETag, making the delete ATOMIC);
* nothing exercises the 412-precondition-failed path of a conditional
  create racing another writer between LIST-max and PUT.

This module closes both for TESTING: :class:`EmulatedConditionalStore`
keeps a per-object GENERATION (GCS ``generation`` / S3 ETag analog)
and routes every mutation through one internal mutex — which is
exactly what makes a real store's preconditions atomic.  Objects are
backed by the filesystem so everything else (Spark scans, manifest
segments, DV sidecars) reads the same bytes.  Named RACE HOOKS fire at
the interleaving points a real store allows (between a caller's read
and its conditional delete; between LIST-max and a conditional
create), letting tests inject a competing writer at exactly the moment
the precondition must save us.

:class:`EmulatedStoreCommitProtocol` plugs the store under the
standard protocol surface, so the full table lifecycle — commit,
pruned MERGE (CoW + MoR), DV DELETE, time travel, CDF, restore,
vacuum — runs against true conditional semantics
(tests/test_object_store_emulation.py).  A remote fsspec-backed
implementation replaces the store calls 1:1:

==========================  ========================================
store method                real-store call
==========================  ========================================
``create``                  PUT + ``If-None-Match: *`` (S3) /
                            ``ifGenerationMatch=0`` (GCS); False ⇔
                            HTTP 412 Precondition Failed
``read``                    GET (returns body + generation/ETag)
``put``                     plain PUT (whole-object atomic)
``delete_if_generation``    DELETE + ``x-goog-if-generation-match`` /
                            ``If-Match: <etag>``; False ⇔ 412
``list``                    LIST (strongly consistent on S3/GCS
                            since 2020 — asserted by a test)
==========================  ========================================
"""

from __future__ import annotations

import os
import threading

from .commit_protocol import ObjectStoreCommitProtocol, _PROTOCOL_MARKER


class EmulatedConditionalStore:
    """Dict-of-generations over a filesystem directory; every mutation
    is atomic under one mutex (the store-side serialization a real
    object store provides natively).  ``hooks[name] = callable`` fires
    OUTSIDE the mutex at the named interleaving point — the window a
    racing writer could occupy on a real store."""

    def __init__(self, root: str):
        self.root = root
        self._mu = threading.Lock()
        self._gen: dict[str, int] = {}
        # per-name generation HIGH-WATER MARK, never reset by delete:
        # real stores (GCS generations, S3 ETag-on-content+time) never
        # reuse a generation for a recreated object, which is exactly
        # what makes a pinned conditional delete safe against
        # delete-then-recreate races
        self._gen_hwm: dict[str, int] = {}
        self.hooks: dict[str, object] = {}
        # telemetry for tests: how each conditional op resolved
        self.stats = {
            "create_ok": 0,
            "create_412": 0,
            "delete_ok": 0,
            "delete_412": 0,
        }

    # -- internals ----------------------------------------------------
    def _path(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def _fire(self, name: str, *args) -> None:
        h = self.hooks.get(name)
        if h is not None:
            h(*args)

    # -- store surface -------------------------------------------------
    def put(self, rel: str, content: str) -> int:
        """Plain PUT: whole-object atomic, bumps the generation."""
        with self._mu:
            path = self._path(rel)
            os.makedirs(os.path.dirname(path) or self.root, exist_ok=True)
            with open(path, "w") as f:
                f.write(content)
                f.flush()
                os.fsync(f.fileno())
            g = self._gen_hwm.get(rel, 0) + 1
            self._gen[rel] = g
            self._gen_hwm[rel] = g
            return g

    def create(self, rel: str, content: str) -> bool:
        """Conditional create (``ifGenerationMatch=0``).  False = the
        object already exists — HTTP 412, the loser of a race."""
        self._fire("before_create", rel)
        with self._mu:
            path = self._path(rel)
            if rel in self._gen or os.path.exists(path):
                self.stats["create_412"] += 1
                return False
            with open(path, "w") as f:
                f.write(content)
                f.flush()
                os.fsync(f.fileno())
            g = self._gen_hwm.get(rel, 0) + 1
            self._gen[rel] = g
            self._gen_hwm[rel] = g
            self.stats["create_ok"] += 1
            return True

    def read(self, rel: str):
        """GET: ``(content, generation)`` or None.  An object created
        outside the store (pre-existing file) reads at generation 0."""
        with self._mu:
            try:
                with open(self._path(rel)) as f:
                    content = f.read()
            except OSError:
                return None
            return content, self._gen.get(rel, 0)

    def delete(self, rel: str) -> None:
        with self._mu:
            try:
                os.unlink(self._path(rel))
            except OSError:
                pass
            self._gen.pop(rel, None)

    def delete_if_generation(self, rel: str, generation: int) -> bool:
        """Conditional DELETE: succeeds only if the object's current
        generation still matches — the atomicity the posix shim's
        read-check-unlink window lacks."""
        with self._mu:
            if self._gen.get(rel, 0) != generation or not os.path.exists(
                self._path(rel)
            ):
                self.stats["delete_412"] += 1
                return False
            try:
                os.unlink(self._path(rel))
            except OSError:
                self.stats["delete_412"] += 1
                return False
            self._gen.pop(rel, None)
            self.stats["delete_ok"] += 1
            return True

    def list(self, prefix: str = "") -> list[str]:
        """Strongly consistent LIST of top-level names (S3/GCS
        contract since 2020: a completed PUT is visible to the next
        LIST)."""
        self._fire("before_list", prefix)
        with self._mu:
            try:
                names = os.listdir(self.root)
            except OSError:
                return []
            return sorted(n for n in names if n.startswith(prefix))


class EmulatedStoreCommitProtocol(ObjectStoreCommitProtocol):
    """The rename-free protocol with every primitive routed through an
    :class:`EmulatedConditionalStore` — true 412 semantics on the
    conditional create (pointer publish, lock acquire) and a
    generation-pinned conditional delete (lock steal), plus race hooks
    at the read→delete and LIST→create windows."""

    name = "object-store-emulated"

    def __init__(self, root: str, store: EmulatedConditionalStore | None = None):
        super().__init__(root)
        self.store = store if store is not None else EmulatedConditionalStore(root)

    # -- small-object I/O
    def read_small(self, rel: str):
        got = self.store.read(rel)
        return got[0] if got is not None else None

    def put_file(self, rel: str, content: str) -> None:
        self.store.put(rel, content)

    def create_exclusive(self, rel: str, content: str) -> bool:
        return self.store.create(rel, content)

    def delete(self, rel: str) -> None:
        self.store.delete(rel)

    def delete_if_content(self, rel: str, expected: str) -> bool:
        """Read pins the generation; the delete carries it as a
        precondition — a mutation in between (the ``between_read_and_
        delete`` hook window) fails the delete with 412 instead of
        removing the NEW object (the posix shim's documented TOCTOU)."""
        got = self.store.read(rel)
        if got is None:
            return False
        content, generation = got
        if content.strip() != expected.strip():
            return False
        self.store._fire("between_read_and_delete", rel)
        return self.store.delete_if_generation(rel, generation)

    def read_pointer(self):
        from .commit_protocol import _PTR_RE

        names = self.store.list("_ptr-v")
        vs = [m.group(1) for n in names if (m := _PTR_RE.match(n))]
        if vs:
            return f"v{max(int(v) for v in vs):08d}"
        return self._read_current()

    def _read_current(self):
        got = self.store.read("_CURRENT")
        return got[0].strip() if got is not None else None

    def gc_pointers(self, keep_min_version: int) -> int:
        from .commit_protocol import _PTR_RE

        n = 0
        for name in self.store.list("_ptr-v"):
            m = _PTR_RE.match(name)
            if m and int(m.group(1)) < keep_min_version:
                self.store.delete(name)
                n += 1
        return n

    def publish_pointer(self, name: str) -> None:
        got = self.store.read(_PROTOCOL_MARKER)
        if got is None or got[0].strip() != "object-store":
            self.store.put(_PROTOCOL_MARKER, "object-store\n")
        ptr = f"_ptr-{name}"
        if not self.create_exclusive(ptr, f"{name}\n"):
            raise FileExistsError(
                f"{os.path.join(self.root, ptr)}: version already "
                "published — concurrent writer outside the lock?"
            )
