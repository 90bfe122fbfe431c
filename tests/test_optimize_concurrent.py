"""Maintenance ops (compact / purge / recluster / zorder) under
concurrent writers — the prepare/publish split applied to OPTIMIZE.

The reference's warehouse re-clusters micro-partitions as a background
service that never blocks the MERGE (embeddings-pipeline.py:294-352
relies on Snowflake's automatic clustering); the Spark-native analog is
a layout rewrite that (a) runs its Spark jobs OUTSIDE the commit lock,
(b) REBASES past racing commits that touched disjoint files, and
(c) yields (recompute or skip) when a racer rewrote a file it read.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.sources.versioned import (
    ConcurrentCommitError,
    SnapshotConflictError,
    StalePreparedError,
    VersionedParquetTable,
)


def _mk_small_files(spark, root: str, n: int = 3, rows_per: int = 4):
    """A table of ``n`` tiny single-file commits → compactable."""
    t = VersionedParquetTable(root)
    for i in range(n):
        df = spark.createDataFrame(
            [(i * rows_per + j, f"f{i}") for j in range(rows_per)],
            "k long, v string",
        )
        if i == 0:
            t.commit_with_manifest(df, "k", cluster_partitions=1)
        else:
            man = t.manifest(t.current_version())
            t.commit_with_manifest(
                df, "k", carried=man["files"], cluster_partitions=1
            )
    return t


def _race_once(monkeypatch, spark, action):
    """Arrange for ``action(table)`` to run exactly once, between a
    prepare and its publish (the window a real racing writer hits)."""
    real = VersionedParquetTable.prepare_commit
    state = {"fired": 0}

    def wrapped(self, *a, **kw):
        out = real(self, *a, **kw)
        if not state["fired"]:
            state["fired"] = 1
            action(VersionedParquetTable(self.root))
        return out

    monkeypatch.setattr(VersionedParquetTable, "prepare_commit", wrapped)
    return state


class TestCompactConcurrent:
    def test_compact_data_is_staged_and_lock_hold_is_metadata_only(
        self, spark, tmp_path, monkeypatch
    ):
        t = _mk_small_files(spark, str(tmp_path / "t"))
        # instrument the lock: the clustered write must happen before
        # acquisition (prepare phase), never inside the hold
        held = {"during_write": False, "acquired": 0}
        real_acquire = VersionedParquetTable._acquire_lock
        real_write = VersionedParquetTable._write_clustered_data

        def spy_acquire(self, *a, **kw):
            held["acquired"] += 1
            return real_acquire(self, *a, **kw)

        def spy_write(self, *a, **kw):
            if held["acquired"]:
                held["during_write"] = True
            return real_write(self, *a, **kw)

        monkeypatch.setattr(
            VersionedParquetTable, "_acquire_lock", spy_acquire
        )
        monkeypatch.setattr(
            VersionedParquetTable, "_write_clustered_data", spy_write
        )
        r = t.compact(spark, min_file_bytes=1 << 30)
        assert r["version"] == t.current_version()
        assert not held["during_write"], "write job ran under the lock"
        man = t.manifest(t.current_version())
        own = [
            e for e in man["files"] if e["path"].startswith("_staged" + os.sep)
        ]
        assert own, "compacted output should be content-addressed"
        assert r["bytes_rewritten"] == sum(e["bytes"] for e in own)
        assert {x["k"] for x in t.read(spark).collect()} == set(range(12))

    def test_compact_retries_after_scope_conflict(
        self, spark, tmp_path, monkeypatch
    ):
        # the racer REWRITES one of the small files compact read →
        # attempt 1 conflicts at publish; attempt 2 recomputes from
        # the new head and succeeds
        from airflow_embeddings_pipeline_spark.operators.merge import (
            merge_upsert_write_pruned,
        )

        root = str(tmp_path / "t")
        t = _mk_small_files(spark, root)

        def rewrite_scope_file(other):
            merge_upsert_write_pruned(
                other.root,
                spark.createDataFrame([(0, "UPD")], "k long, v string"),
                "k",
                vacuum_keep_last=None,
            )

        state = _race_once(monkeypatch, spark, rewrite_scope_file)
        r = t.compact(spark, min_file_bytes=1 << 30)
        assert state["fired"] == 1
        assert r["version"] == t.current_version()
        rows = {x["k"]: x["v"] for x in t.read(spark).collect()}
        assert rows[0] == "UPD" and len(rows) == 12

    def test_compact_single_attempt_raises_on_scope_conflict(
        self, spark, tmp_path, monkeypatch
    ):
        from airflow_embeddings_pipeline_spark.operators.merge import (
            merge_upsert_write_pruned,
        )

        root = str(tmp_path / "t")
        t = _mk_small_files(spark, root)

        def rewrite_scope_file(other):
            merge_upsert_write_pruned(
                other.root,
                spark.createDataFrame([(0, "UPD")], "k long, v string"),
                "k",
                vacuum_keep_last=None,
            )

        _race_once(monkeypatch, spark, rewrite_scope_file)
        head_before = None
        with pytest.raises(SnapshotConflictError):
            t.compact(spark, min_file_bytes=1 << 30, attempts=1)
        # the loser left no version and no staged garbage beyond the
        # grace-window sweep's reach: its staging was reclaimed at the
        # failed publish
        man = t.manifest(t.current_version())
        referenced = {e["path"] for e in man["files"]}
        sroot = os.path.join(root, "_staged")
        for name in os.listdir(sroot) if os.path.isdir(sroot) else []:
            rel_prefix = os.path.join("_staged", name) + os.sep
            assert any(
                r.startswith(rel_prefix) for r in referenced
            ), f"orphan staging {name} should have been discarded"
        rows = {x["k"]: x["v"] for x in t.read(spark).collect()}
        assert rows[0] == "UPD" and len(rows) == 12


class TestZorderConcurrent:
    def test_zorder_rebases_past_disjoint_append(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "t")
        t = VersionedParquetTable(root)
        df = spark.range(400).selectExpr(
            "id as k", "id % 20 as a", "cast(id % 7 as long) as b"
        )
        t.commit_with_manifest(df, "k", cluster_partitions=4)

        def append_rows(other):
            man = other.manifest(other.current_version())
            other.commit_with_manifest(
                spark.createDataFrame(
                    [(1000, 99, 99)], "k long, a long, b long"
                ),
                "k",
                carried=man["files"],
                cluster_partitions=1,
            )

        state = _race_once(monkeypatch, spark, append_rows)
        r = t.optimize_zorder(spark, ["a", "b"], buckets=8)
        assert state["fired"] == 1
        assert t._last_commit_rebase is not None
        man = t.manifest(r["version"])
        flagged = [e for e in man["files"] if e.get("clustered") == "zorder"]
        unflagged = [
            e for e in man["files"] if e.get("clustered") != "zorder"
        ]
        # z output flagged; the racer's append carried through UNflagged
        # (it is exactly the decay mass maintain() repairs later)
        assert len(flagged) == r["files_after"] and len(unflagged) == 1
        assert t.read(spark).count() == 401
        assert (
            t.read(spark).filter(F.col("k") == 1000).first()["a"] == 99
        )

    def test_scoped_zorder_repair_conflict_is_skipped_by_maintain(
        self, spark, tmp_path, monkeypatch
    ):
        # z table with decayed appends; a racer rewrites one decayed
        # file while the scoped repair prepares → maintain records the
        # skip instead of raising, and the table is untouched by it
        from airflow_embeddings_pipeline_spark.operators.merge import (
            merge_upsert_write_pruned,
        )

        root = str(tmp_path / "t")
        t = VersionedParquetTable(root)
        df = spark.range(400).selectExpr(
            "id as k", "id % 20 as a", "cast(id % 7 as long) as b"
        )
        t.commit_with_manifest(df, "k", cluster_partitions=2)
        t.optimize_zorder(spark, ["a", "b"], buckets=8)
        # decay: a plain merge append (unflagged file)
        merge_upsert_write_pruned(
            root,
            spark.createDataFrame(
                [(2000 + i, 1, 1) for i in range(200)],
                "k long, a long, b long",
            ),
            "k",
            vacuum_keep_last=None,
        )

        def rewrite_decayed(other):
            merge_upsert_write_pruned(
                other.root,
                spark.createDataFrame([(2000, 5, 5)], "k long, a long, b long"),
                "k",
                vacuum_keep_last=None,
            )

        _race_once(monkeypatch, spark, rewrite_decayed)
        out = t.maintain(spark, max_zorder_decay=0.05, max_small_files=1000)
        skips = [a for a in out["actions"] if a.get("skipped")]
        assert skips and skips[0]["action"] == "rezorder"
        assert (
            t.read(spark).filter(F.col("k") == 2000).first()["a"] == 5
        ), "the racing writer's update must win"


class TestMaintainConcurrent:
    def test_purge_rebases_past_disjoint_append(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "t")
        t = VersionedParquetTable(root)
        t.commit_with_manifest(
            spark.range(100).selectExpr("id as k", "'x' as v"),
            "k",
            cluster_partitions=2,
        )
        t.delete_where(spark, "k < 40")

        def append_rows(other):
            man = other.manifest(other.current_version())
            other.commit_with_manifest(
                spark.createDataFrame([(500, "race")], "k long, v string"),
                "k",
                carried=man["files"],
                cluster_partitions=1,
            )

        state = _race_once(monkeypatch, spark, append_rows)
        out = t.maintain(spark, max_dv_ratio=0.1, max_small_files=1000)
        assert state["fired"] == 1
        acts = {a["action"] for a in out["actions"] if not a.get("skipped")}
        assert "purge_dv" in acts or "reorg" in acts
        man = t.manifest(t.current_version())
        assert not any(e.get("dv") for e in man["files"])
        rows = {x["k"] for x in t.read(spark).collect()}
        assert rows == set(range(40, 100)) | {500}

class TestVacuumConcurrent:
    def test_vacuum_folds_interleaved_commit_into_keep(
        self, spark, tmp_path, monkeypatch
    ):
        # the loss window the locked sweep closes: a writer publishes
        # BETWEEN vacuum's keep computation and its sweep — unlocked,
        # that freshly committed version dir was "on disk, not in
        # keep, unreferenced" and got rmtree'd
        root = str(tmp_path / "t")
        t = _mk_small_files(spark, root, n=4)
        real_acquire = VersionedParquetTable._acquire_lock
        state = {"fired": 0}

        def racing_acquire(self, *a, **kw):
            if not state["fired"]:
                state["fired"] = 1
                other = VersionedParquetTable(self.root)
                man = other.manifest(other.current_version())
                other.commit_with_manifest(
                    spark.createDataFrame(
                        [(999, "race")], "k long, v string"
                    ),
                    "k",
                    carried=man["files"],
                    cluster_partitions=1,
                )
            return real_acquire(self, *a, **kw)

        monkeypatch.setattr(
            VersionedParquetTable, "_acquire_lock", racing_acquire
        )
        dropped = t.vacuum(keep_last=1)
        assert state["fired"] == 1
        head = t.current_version()
        assert head == 5, "the racer's publish must be the live head"
        rows = {x["k"]: x["v"] for x in t.read(spark).collect()}
        assert rows[999] == "race" and len(rows) == 17
        assert all(v < 4 for v in dropped), (
            "only pre-race history may drop; the interleaved commit "
            "and the vacuum-time head must survive"
        )

    def test_ride_along_vacuum_contention_does_not_fail_the_merge(
        self, spark, tmp_path, monkeypatch
    ):
        from airflow_embeddings_pipeline_spark.operators.merge import (
            merge_upsert_write_pruned,
        )

        root = str(tmp_path / "t")
        t = _mk_small_files(spark, root, n=2)

        def busy_vacuum(self, *a, **kw):
            raise ConcurrentCommitError("lock held by a racing writer")

        monkeypatch.setattr(VersionedParquetTable, "vacuum", busy_vacuum)
        r = merge_upsert_write_pruned(
            root,
            spark.createDataFrame([(0, "UPD")], "k long, v string"),
            "k",
            vacuum_keep_last=2,  # ride-along vacuum requested...
        )
        # ...and its contention is swallowed: the merge still commits
        assert r["version"] == t.current_version()
        assert t.read(spark).filter("v = 'UPD'").count() == 1


class TestStalePreparedFence:
    def test_publish_refuses_token_older_than_grace(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk_small_files(spark, root, n=2)
        v = t.current_version()
        df = spark.createDataFrame([(100, "new")], "k long, v string")
        prepared = t.prepare_commit(df, "k", base_version=v)
        sdir = os.path.join(root, prepared["staging_rel"])
        old = time.time() - t.staged_gc_grace_seconds - 10
        os.utime(sdir, (old, old))  # held past the grace window
        with pytest.raises(StalePreparedError):
            t.commit_with_manifest(
                None,
                "k",
                carried=t.manifest(v)["files"],
                prepared=prepared,
                expected_base_version=v,
            )
        assert not os.path.exists(sdir), "stale staging is reclaimed"
        assert t.current_version() == v, "nothing published"

    def test_publish_refuses_token_whose_staging_was_swept(
        self, spark, tmp_path
    ):
        import shutil

        root = str(tmp_path / "t")
        t = _mk_small_files(spark, root, n=2)
        v = t.current_version()
        df = spark.createDataFrame([(100, "new")], "k long, v string")
        prepared = t.prepare_commit(df, "k", base_version=v)
        shutil.rmtree(os.path.join(root, prepared["staging_rel"]))
        with pytest.raises(StalePreparedError, match="gone"):
            t.commit_with_manifest(
                None,
                "k",
                carried=t.manifest(v)["files"],
                prepared=prepared,
                expected_base_version=v,
            )
        assert t.current_version() == v

    def test_fresh_token_publishes_through_the_fence(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk_small_files(spark, root, n=2)
        v = t.current_version()
        df = spark.createDataFrame([(100, "new")], "k long, v string")
        prepared = t.prepare_commit(df, "k", base_version=v)
        nv = t.commit_with_manifest(
            None,
            "k",
            carried=t.manifest(v)["files"],
            prepared=prepared,
            expected_base_version=v,
        )
        assert nv == v + 1
        assert t.read(spark).filter("k = 100").count() == 1
