"""The rename-free commit protocol against TRUE conditional-operation
semantics (sources/object_store_emulation.py).

The posix-shimmed ObjectStoreCommitProtocol proved the protocol's
SHAPE; this suite proves it against the store behaviors the shim
cannot express: atomic 412 preconditions on conditional create and
generation-pinned conditional delete, strong LIST-after-write
consistency, and injected races at the exact interleaving points a
real store allows — a competing create landing between LIST-max and
the publish's conditional create, and a lock re-grab landing between a
stealer's read and its conditional delete."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators.merge import (
    merge_upsert_write_pruned,
)
from airflow_embeddings_pipeline_spark.sources.object_store_emulation import (
    EmulatedConditionalStore,
    EmulatedStoreCommitProtocol,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
)


def _table(spark, root, n=500, parts=4):
    proto = EmulatedStoreCommitProtocol(root)
    os.makedirs(root, exist_ok=True)
    t = VersionedParquetTable(root, commit_protocol=proto)
    t.commit_with_manifest(
        spark.range(n).selectExpr("id as k", "id * 2 as v"),
        "k",
        cluster_partitions=parts,
    )
    return t, proto


@pytest.fixture()
def emulated_everywhere(monkeypatch):
    """Route AUTO-DETECTED protocol instances (the merge/DML paths
    construct their own tables with commit_protocol=None) onto one
    emulated store per root, so the whole lifecycle truly runs through
    the conditional-semantics chokepoint."""
    from airflow_embeddings_pipeline_spark.sources import commit_protocol as cp
    from airflow_embeddings_pipeline_spark.sources import versioned as v

    stores: dict[str, EmulatedConditionalStore] = {}
    real = cp.resolve_protocol

    def routed(spec, root):
        if root in stores:
            return EmulatedStoreCommitProtocol(root, stores[root])
        if isinstance(spec, EmulatedStoreCommitProtocol):
            stores[root] = spec.store
            return spec
        return real(spec, root)

    monkeypatch.setattr(cp, "resolve_protocol", routed)
    # versioned.py imports the symbol inside __init__ via
    # `from .commit_protocol import resolve_protocol` at call time
    return stores


class TestConditionalPrimitives:
    def test_conditional_create_412_on_race(self, tmp_path):
        """Lost-conditional-create race: a competing writer creates the
        SAME pointer object between this writer's LIST-max and its
        conditional create.  The create must fail (412), never
        clobber — and publish_pointer surfaces it loudly."""
        root = str(tmp_path / "t")
        os.makedirs(root)
        proto = EmulatedStoreCommitProtocol(root)
        racer_done = {"n": 0}

        def racer(rel):
            # fire exactly once, on the pointer object being published
            if rel == "_ptr-v00000001" and racer_done["n"] == 0:
                racer_done["n"] += 1
                assert proto.store.create(rel, "v00000001\n")

        proto.store.hooks["before_create"] = racer
        with pytest.raises(FileExistsError):
            proto.publish_pointer("v00000001")
        assert proto.store.stats["create_412"] == 1
        # the racer's object survives untouched; resolution is sane
        assert proto.read_pointer() == "v00000001"

    def test_conditional_delete_412_on_regrab(self, tmp_path):
        """Lock steal vs re-grab: the stale lock is deleted and
        RE-CREATED by a new live writer between the stealer's read and
        its conditional delete.  The generation precondition fails the
        delete (412) — the new writer's lock survives.  This is the
        exact TOCTOU the posix shim documents as its fidelity gap."""
        root = str(tmp_path / "t")
        os.makedirs(root)
        proto = EmulatedStoreCommitProtocol(root)
        proto.store.put("_COMMIT_LOCK", "999999999")  # dead holder

        def regrab(rel):
            proto.store.delete(rel)  # dead holder's lock released...
            proto.store.put(rel, "12345")  # ...and a LIVE writer locked

        proto.store.hooks["between_read_and_delete"] = regrab
        assert proto.delete_if_content("_COMMIT_LOCK", "999999999") is False
        assert proto.store.stats["delete_412"] == 1
        got = proto.store.read("_COMMIT_LOCK")
        assert got is not None and got[0] == "12345"

    def test_list_after_write_consistency(self, tmp_path):
        """A completed conditional create is visible to the very next
        LIST from another thread (the strong-consistency contract the
        pointer resolution depends on)."""
        root = str(tmp_path / "t")
        os.makedirs(root)
        proto = EmulatedStoreCommitProtocol(root)
        seen = []

        def lister():
            seen.append(proto.read_pointer())

        proto.publish_pointer("v00000001")
        th = threading.Thread(target=lister)
        th.start()
        th.join()
        assert seen == ["v00000001"]

    def test_max_resolution_monotonic_under_concurrent_publish(
        self, tmp_path
    ):
        """A LIST racing a publish sees either the old or the new max,
        never less than a max it has already observed."""
        root = str(tmp_path / "t")
        os.makedirs(root)
        proto = EmulatedStoreCommitProtocol(root)
        proto.publish_pointer("v00000001")
        observed = []
        stop = threading.Event()

        def reader():
            while not stop.is_set():
                p = proto.read_pointer()
                if p is not None:
                    observed.append(int(p[1:]))

        th = threading.Thread(target=reader)
        th.start()
        for v in range(2, 30):
            proto.publish_pointer(f"v{v:08d}")
        stop.set()
        th.join()
        assert observed == sorted(observed)
        assert observed[-1] >= 1


class TestLifecycleOnEmulatedStore:
    def test_full_lifecycle(self, spark, tmp_path, emulated_everywhere):
        """The 9-step lifecycle (commit, pruned MERGE CoW + MoR, DV
        DELETE, update, time travel, CDF, restore, vacuum) runs
        entirely through the conditional-semantics store — and the
        table layer performs zero os.rename/os.replace under the
        root."""
        root = str(tmp_path / "t")
        calls: list[str] = []
        real_rename, real_replace = os.rename, os.replace

        def guard(fn):
            def inner(src, dst, **kw):
                if str(src).startswith(root) or str(dst).startswith(root):
                    calls.append(f"{src} -> {dst}")
                return fn(src, dst, **kw)

            return inner

        import unittest.mock as mock

        with mock.patch.object(os, "rename", guard(real_rename)), \
             mock.patch.object(os, "replace", guard(real_replace)):
            t, proto = _table(spark, root)
            emulated_everywhere[root] = proto.store
            # CoW pruned merge (prepare/publish split: staged data)
            stats = merge_upsert_write_pruned(
                root,
                spark.createDataFrame(
                    [(5, -1), (9_000, -2)], "k long, v long"
                ),
                "k",
                vacuum_keep_last=None,
            )
            assert stats["version"] == 2
            # MoR merge (DV sidecar + appends)
            stats = merge_upsert_write_pruned(
                root,
                spark.createDataFrame([(7, 777)], "k long, v long"),
                "k",
                write_mode="mor",
                vacuum_keep_last=None,
            )
            assert stats["write_mode"] == "mor"
            t2 = VersionedParquetTable(
                root,
                commit_protocol=EmulatedStoreCommitProtocol(
                    root, proto.store
                ),
            )
            v_before = t2.current_version()
            t2.delete_where(spark, "k >= 490 and k < 500")
            t2.update_where(spark, "k = 3", {"v": "v + 100"})
            got = {r["k"]: r["v"] for r in t2.read(spark).collect()}
            assert got[5] == -1 and got[9_000] == -2 and got[7] == 777
            assert got[3] == 106
            assert 490 not in got
            assert (
                t2.read_version(spark, v_before)
                .filter("k >= 490 and k < 500")
                .count()
                == 10
            )
            ch = t2.changes_between(spark, v_before, t2.current_version())
            assert (
                ch.filter(F.col("_change_type") == "delete").count() == 10
            )
            t2.restore(spark, v_before)
            t2.vacuum(keep_last=1)
            # 500 base rows + the k=9000 insert (updates add none)
            assert t2.read(spark).count() == 501
        assert calls == []  # rename-free under true store semantics
        # every publish went through the conditional-create path
        assert proto.store.stats["create_412"] == 0
        assert proto.store.stats["create_ok"] >= t2.current_version()

    def test_cas_conflict_through_store(self, spark, tmp_path):
        from airflow_embeddings_pipeline_spark.sources.versioned import (
            SnapshotConflictError,
        )

        root = str(tmp_path / "t")
        t, proto = _table(spark, root)
        man = t.manifest(1)
        t.delete_where(spark, "k = 0")
        with pytest.raises(SnapshotConflictError):
            t.commit_with_manifest(
                spark.createDataFrame([(10_000, 1)], "k long, v long"),
                "k",
                carried=man["files"],
                expected_base_version=1,
            )

    def test_crash_orphan_reconciled_through_store(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t, proto = _table(spark, root)
        orphan = os.path.join(root, "v00000002")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "junk.txt"), "w") as f:
            f.write("crash leftovers")
        assert t.current_version() == 1
        t.delete_where(spark, "k = 0")
        assert t.current_version() == 2
        assert not os.path.exists(os.path.join(orphan, "junk.txt"))
