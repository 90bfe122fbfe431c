"""Pluggable commit protocol (sources/commit_protocol.py).

The POSIX protocol is the default and byte-compatible with every
table previously written.  The OBJECT-STORE protocol is rename-free:
pointer publish is a conditional-create of ``_ptr-v{N}`` (the CAS
itself), the live version is the LIST-max pointer object, the lock
steal is a conditional delete.  The suite proves:

* the full table lifecycle (commit, pruned MERGE CoW+MoR, DV DELETE,
  time travel, CDF, restore, vacuum) is row-identical under both
  protocols;
* under the object-store protocol the table layer never calls
  ``os.rename``/``os.replace`` on anything inside the table root
  (Spark's own data-file committer is JVM-side and out of the table
  protocol's scope — a real deployment uses a cloud-native committer
  for data files);
* crash shapes: a crash before publish leaves the prior version live
  (orphan reconciled), a stale lock is stolen, CAS conflicts raise.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators.merge import (
    merge_upsert_write_pruned,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    SnapshotConflictError,
    VersionedParquetTable,
)

PROTOS = ["posix", "object-store"]


def _mk(spark, root, proto, n=500, parts=4):
    t = VersionedParquetTable(root, commit_protocol=proto)
    t.commit_with_manifest(
        spark.range(n).selectExpr("id as k", "id * 2 as v"),
        "k",
        cluster_partitions=parts,
    )
    return t


def _rows(spark, t, version=None):
    df = t.read(spark) if version is None else t.read_version(spark, version)
    return sorted(map(tuple, df.select("k", "v").collect()))


class TestLifecycleParity:
    @pytest.mark.parametrize("proto", PROTOS)
    def test_full_lifecycle(self, spark, tmp_path, proto):
        root = str(tmp_path / "t")
        t = _mk(spark, root, proto)
        assert t.current_version() == 1
        # pruned merge (CoW)
        src = spark.createDataFrame([(5, -1), (9_000, -2)], "k long, v long")
        stats = merge_upsert_write_pruned(
            root, src, "k", vacuum_keep_last=None
        )
        # the merge constructs its own instance with protocol=None —
        # AUTO-DETECTION must have routed it to this table's protocol
        assert stats["version"] == 2
        t2 = VersionedParquetTable(root, commit_protocol=proto)
        got = dict(_rows(spark, t2))
        assert got[5] == -1 and got[9_000] == -2
        # DV delete + time travel + CDF + restore, all protocol-pinned
        v_before = t2.current_version()
        t2.delete_where(spark, "k >= 490 and k < 500")
        assert t2.read(spark).filter("k >= 490 and k < 500").count() == 0
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
        assert t2.read(spark).filter("k >= 490 and k < 500").count() == 10
        t2.vacuum(keep_last=1)
        assert t2.read(spark).count() == 501

    def test_protocol_parity_rows(self, spark, tmp_path):
        outs = {}
        for proto in PROTOS:
            root = str(tmp_path / proto)
            t = _mk(spark, root, proto)
            t.delete_where(spark, "k % 100 = 7")
            t.update_where(spark, "k % 100 = 9", {"v": "v + 1"})
            outs[proto] = _rows(spark, t)
        assert outs["posix"] == outs["object-store"]


class TestObjectStoreRenameFree:
    def test_table_layer_never_renames(self, spark, tmp_path, monkeypatch):
        root = str(tmp_path / "t")
        calls: list[str] = []
        real_rename, real_replace = os.rename, os.replace

        def guard(fn):
            def inner(src, dst, **kw):
                if str(src).startswith(root) or str(dst).startswith(root):
                    calls.append(f"{src} -> {dst}")
                return fn(src, dst, **kw)

            return inner

        monkeypatch.setattr(os, "rename", guard(real_rename))
        monkeypatch.setattr(os, "replace", guard(real_replace))
        t = _mk(spark, root, "object-store")
        t.delete_where(spark, "k < 5")
        t.commit_with_manifest(
            spark.createDataFrame([(10_000, 1)], "k long, v long"),
            "k",
            carried=t.manifest(t.current_version())["files"],
            expected_base_version=t.current_version(),
        )
        t.vacuum(keep_last=1)
        assert t.read(spark).count() == 496
        assert calls == []  # zero python-side renames under the root
        # pointer objects exist; no _CURRENT was ever written
        names = os.listdir(root)
        assert any(n.startswith("_ptr-v") for n in names)
        assert "_CURRENT" not in names

    def test_pointer_is_list_max(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root, "object-store")
        t.delete_where(spark, "k = 1")
        t.delete_where(spark, "k = 2")
        assert t.current_version() == 3
        ptrs = sorted(
            n for n in os.listdir(root) if n.startswith("_ptr-v")
        )
        assert ptrs == ["_ptr-v00000001", "_ptr-v00000002", "_ptr-v00000003"]

    def test_posix_migration_fallback(self, spark, tmp_path):
        """A posix-written table opens under the object-store protocol
        (legacy _CURRENT read), and the first object-store commit
        publishes a _ptr object that wins the max.  One-way: _CURRENT
        goes stale afterwards — posix readers must not be mixed in."""
        root = str(tmp_path / "t")
        _mk(spark, root, "posix")
        t = VersionedParquetTable(root, commit_protocol="object-store")
        assert t.current_version() == 1
        t.delete_where(spark, "k = 0")
        assert t.current_version() == 2
        # the stale legacy pointer still says v1 (documented one-way)
        with open(os.path.join(root, "_CURRENT")) as f:
            assert f.read().strip() == "v00000001"

    def test_cas_conflict_still_raises(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root, "object-store")
        man = t.manifest(1)
        t.delete_where(spark, "k = 0")  # head moves to 2
        with pytest.raises(SnapshotConflictError):
            t.commit_with_manifest(
                spark.createDataFrame([(10_000, 1)], "k long, v long"),
                "k",
                carried=man["files"],
                expected_base_version=1,
            )

    def test_crash_before_publish_reconciled(self, spark, tmp_path):
        """A version dir written without a pointer object (crash
        between data write and publish) is invisible and reconciled
        away by the next commit."""
        root = str(tmp_path / "t")
        t = _mk(spark, root, "object-store")
        orphan = os.path.join(root, "v00000002")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "junk.txt"), "w") as f:
            f.write("crash leftovers")
        assert t.current_version() == 1
        t.delete_where(spark, "k = 0")
        assert t.current_version() == 2
        assert not os.path.exists(os.path.join(orphan, "junk.txt"))
        assert t.read(spark).count() == 499

    def test_vacuum_gcs_superseded_pointer_objects(self, spark, tmp_path):
        """Pointer objects below the retention horizon are reclaimed
        by vacuum, so LIST-max resolution stays bounded by retention —
        and time travel within retention still works (version dirs,
        not pointer objects, carry the history)."""
        root = str(tmp_path / "t")
        t = _mk(spark, root, "object-store")
        for i in range(4):
            t.delete_where(spark, f"k = {i}")
        assert t.current_version() == 5
        t.vacuum(keep_last=2)
        ptrs = sorted(
            n for n in os.listdir(root) if n.startswith("_ptr-v")
        )
        assert ptrs == ["_ptr-v00000004", "_ptr-v00000005"]
        assert t.current_version() == 5
        assert t.read_version(spark, 4).count() == 497

    def test_stale_lock_steal(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root, "object-store")
        # plant a lock held by a dead pid
        with open(os.path.join(root, "_COMMIT_LOCK"), "w") as f:
            f.write("999999999")
        t.delete_where(spark, "k = 0")  # steals and commits
        assert t.current_version() == 2

    def test_posix_over_migrated_table_raises(self, spark, tmp_path):
        """The one-way migration contract is ENFORCED: a posix handle
        on a table with object-store commits raises ProtocolMixingError
        on any pointer read — instead of reading the stale _CURRENT
        and letting its next commit's reconcile rmtree committed
        versions (the r10 review's data-destruction scenario)."""
        from airflow_embeddings_pipeline_spark.sources.commit_protocol import (
            ProtocolMixingError,
        )

        root = str(tmp_path / "t")
        _mk(spark, root, "posix")
        t_os = VersionedParquetTable(root, commit_protocol="object-store")
        t_os.delete_where(spark, "k = 0")  # migrates: _ptr-v2 + marker
        stale = VersionedParquetTable(root, commit_protocol="posix")
        with pytest.raises(ProtocolMixingError):
            stale.current_version()
        with pytest.raises(ProtocolMixingError):
            stale.commit_with_manifest(
                spark.createDataFrame([(1, 1)], "k long, v long"), "k"
            )
        # nothing was destroyed: the object-store handle still reads v2
        assert t_os.current_version() == 2
        assert t_os.read(spark).count() == 499

    def test_posix_guard_pre_marker_migration(self, spark, tmp_path):
        """A table migrated by pre-marker code (_ptr objects, no
        _PROTOCOL marker) is caught by the version-listing guard under
        the commit lock and by posix publish — not silently stale."""
        from airflow_embeddings_pipeline_spark.sources.commit_protocol import (
            ProtocolMixingError,
        )

        root = str(tmp_path / "t")
        _mk(spark, root, "posix")
        VersionedParquetTable(
            root, commit_protocol="object-store"
        ).delete_where(spark, "k = 0")
        os.unlink(os.path.join(root, "_PROTOCOL"))  # simulate pre-marker
        stale = VersionedParquetTable(root, commit_protocol="posix")
        # pointer READ cannot see the marker (O(1) stat only) — but the
        # commit path's version listing fires before any reconcile
        with pytest.raises(ProtocolMixingError):
            stale.commit_with_manifest(
                spark.createDataFrame([(1, 1)], "k long, v long"), "k"
            )
        # committed object-store versions are intact
        assert os.path.isdir(os.path.join(root, "v00000002"))

    def test_marker_auto_detection_is_o1(self, spark, tmp_path):
        """Auto-detection resolves object-store from the _PROTOCOL
        marker without listing the root (flat cost at any version
        count); marker-less roots keep the LIST fallback."""
        root = str(tmp_path / "t")
        t = _mk(spark, root, "object-store")
        t.delete_where(spark, "k = 0")
        auto = VersionedParquetTable(root)  # commit_protocol=None
        assert auto._protocol.name == "object-store"
        assert auto.current_version() == 2
        # pre-marker table: LIST fallback still detects
        os.unlink(os.path.join(root, "_PROTOCOL"))
        auto2 = VersionedParquetTable(root)
        assert auto2._protocol.name == "object-store"

    def test_pointer_past_eight_digits(self, tmp_path):
        """_ptr-v* names with 9+ digits keep resolving (the 8-digit
        regex cap would silently freeze the table at v99,999,999)."""
        from airflow_embeddings_pipeline_spark.sources.commit_protocol import (
            ObjectStoreCommitProtocol,
        )

        root = str(tmp_path / "t")
        os.makedirs(root)
        proto = ObjectStoreCommitProtocol(root)
        for v in (99_999_999, 100_000_000, 100_000_001):
            with open(os.path.join(root, f"_ptr-v{v:08d}"), "w") as f:
                f.write(f"v{v:08d}\n")
        assert proto.read_pointer() == f"v{100_000_001:08d}"

    def test_streaming_cdf_resolves_through_protocol(
        self, spark, tmp_path
    ):
        """The streaming CDF's pointer probe goes through the
        auto-detected protocol: an object-store table (no _CURRENT
        ever written, or a stale one after migration) streams its
        commits instead of stalling at the stale/absent pointer."""
        from airflow_embeddings_pipeline_spark.sources.versioned_stream import (
            read_changes_stream,
        )

        root = str(tmp_path / "t")
        _mk(spark, root, "posix")  # v1 under posix (_CURRENT = v1)
        t = VersionedParquetTable(root, commit_protocol="object-store")
        t.delete_where(spark, "k < 3")  # v2 published as _ptr-v2 only
        q = (
            read_changes_stream(spark, root, starting_version=1)
            .writeStream.format("memory")
            .queryName("proto_cdf")
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", str(tmp_path / "ckpt_proto_cdf")
            )
            .start()
        )
        q.awaitTermination()
        got = spark.table("proto_cdf")
        # the post-migration commit IS in the feed (the stale
        # _CURRENT=v1 would have hidden it)
        assert got.count() == 3
        assert set(
            r["_change_type"] for r in got.collect()
        ) == {"delete"}
