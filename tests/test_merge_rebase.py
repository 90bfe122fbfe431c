"""Conflict-scope-aware CAS rebase (Delta logical conflict detection).

Before this existed, ANY ``SnapshotConflictError`` triggered a full
merge recompute — the 32-writer stress recomputed all 82 conflicts.
Now the commit, under the same lock hold, diffs the planned base
against the live head (``_diff_file_maps``, O(changed segments)); when
every racing commit provably touched DISJOINT files and key ranges,
the prepared output publishes against the new head verbatim
(``stats["rebased"]``).  Overlap still recomputes — that is what keeps
serial equivalence.

The racing writer is injected deterministically: a monkeypatched
``commit_with_manifest`` runs a full disjoint/overlapping merge just
BEFORE the outer merge's commit acquires the lock, so the outer CAS
always finds a moved head.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators import merge as merge_mod
from airflow_embeddings_pipeline_spark.operators.merge import (
    merge_upsert_write_pruned,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
)


def _mk(spark, root, n=1_000, parts=8, segmented=False):
    t = VersionedParquetTable(root)
    if segmented:
        t.manifest_inline_max = 4
        t.manifest_segment_rows = 2
    t.commit_with_manifest(
        spark.range(n).selectExpr("id as k", "id * 2 as v"),
        "k",
        cluster_partitions=parts,
    )
    return t


def _src(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def _race(spark, root, rows, monkeypatch, **merge_kw):
    """Arrange for ``rows`` to be merged by a RACING writer exactly
    once, immediately before the next outer MERGE commit takes the
    lock.  Returns a counter dict tracking outer attempt count."""
    orig = VersionedParquetTable.commit_with_manifest
    state = {"armed": True, "attempts": 0}

    def inject(self, *a, **kw):
        if state["armed"] and str(kw.get("operation", "")).startswith(
            "MERGE"
        ):
            state["armed"] = False
            merge_upsert_write_pruned(
                root, _src(spark, rows), "k",
                vacuum_keep_last=None, **merge_kw,
            )
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        VersionedParquetTable, "commit_with_manifest", inject
    )
    real_attempt = merge_mod._pruned_merge_attempt

    def counting(*a, **kw):
        # NOTE: the injected racing merge runs through this wrapper
        # too, so every test's expected count includes its 1 attempt
        state["attempts"] += 1
        return real_attempt(*a, **kw)

    monkeypatch.setattr(merge_mod, "_pruned_merge_attempt", counting)
    return state


def _content(spark, t):
    return dict(
        map(tuple, t.read(spark).select("k", "v").collect())
    )


class TestRebase:
    @pytest.mark.parametrize("segmented", [False, True])
    def test_disjoint_conflict_rebases(
        self, spark, tmp_path, monkeypatch, segmented
    ):
        root = str(tmp_path / "t")
        t = _mk(spark, root, segmented=segmented)
        # racer touches the HIGH band + inserts far away; outer
        # touches the LOW band + inserts elsewhere — disjoint scopes
        state = _race(spark, root, [(900, -5), (50_000, -6)], monkeypatch)
        stats = merge_upsert_write_pruned(
            root, _src(spark, [(5, -1), (60_000, -2)]), "k",
            vacuum_keep_last=None,
        )
        assert stats["rebased"] is True
        assert state["attempts"] == 2  # racer 1 + outer 1, zero recomputes
        got = _content(spark, t)
        # both writers' effects are present (serial-equivalent)
        assert got[5] == -1 and got[60_000] == -2
        assert got[900] == -5 and got[50_000] == -6
        assert got[7] == 14 and len(got) == 1_002
        # durable audit trail in the manifest
        man = t._raw_manifest(t.current_version())
        assert man["rebase"]["onto"] == man["rebase"]["planned_base"] + 1

    def test_overlapping_file_conflict_recomputes(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        # racer updates k=6 — SAME file as the outer merge's k=5
        state = _race(spark, root, [(6, -5)], monkeypatch)
        stats = merge_upsert_write_pruned(
            root, _src(spark, [(5, -1)]), "k", vacuum_keep_last=None
        )
        assert stats["rebased"] is False
        assert state["attempts"] == 3  # racer 1 + outer 2 (one recompute)
        got = _content(spark, t)
        assert got[5] == -1 and got[6] == -5 and got[7] == 14

    def test_same_insert_key_conflict_recomputes(
        self, spark, tmp_path, monkeypatch
    ):
        """Racer inserts the SAME new key the outer batch inserts — a
        rebase would publish a duplicate row; the added-entry key test
        must force the recompute, which turns the outer insert into an
        update."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        state = _race(spark, root, [(50_000, -5)], monkeypatch)
        stats = merge_upsert_write_pruned(
            root, _src(spark, [(50_000, -9)]), "k", vacuum_keep_last=None
        )
        assert stats["rebased"] is False
        assert state["attempts"] == 3  # racer 1 + outer 2
        rows = (
            t.read(spark).filter(F.col("k") == 50_000).collect()
        )
        assert len(rows) == 1 and rows[0]["v"] == -9

    def test_metadata_change_declines_rebase(
        self, spark, tmp_path, monkeypatch
    ):
        """A racing commit that changed table METADATA (here: a new
        CHECK constraint) invalidates the prepared commit's inherited
        state — must recompute even though the files are disjoint."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        orig = VersionedParquetTable.commit_with_manifest
        state = {"armed": True}

        def inject(self, *a, **kw):
            if state["armed"] and str(kw.get("operation", "")).startswith(
                "MERGE"
            ):
                state["armed"] = False
                VersionedParquetTable(root).add_constraint(
                    spark, "v_not_tiny", "v >= -100"
                )
            return orig(self, *a, **kw)

        monkeypatch.setattr(
            VersionedParquetTable, "commit_with_manifest", inject
        )
        stats = merge_upsert_write_pruned(
            root, _src(spark, [(5, -1)]), "k", vacuum_keep_last=None
        )
        assert stats["rebased"] is False
        got = _content(spark, t)
        assert got[5] == -1
        # the recompute inherited the racer's constraint
        man = t._raw_manifest(t.current_version())
        assert "v_not_tiny" in (man.get("constraints") or {})

    def test_range_join_tier_rebases_via_batch_test(
        self, spark, tmp_path, monkeypatch
    ):
        """The >max_exact_keys tier holds no collected keys driver-
        side; its rebase scope is the BATCH test — one bounded range
        join of the racing entries against the distinct source keys —
        so a disjoint racer is absorbed with zero recompute."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        state = _race(spark, root, [(900, -5)], monkeypatch)
        stats = merge_upsert_write_pruned(
            root, _src(spark, [(5, -1), (60_000, -2)]), "k",
            vacuum_keep_last=None, max_exact_keys=0,
        )
        assert stats["pruning"] == "range-join"
        assert stats["rebased"] is True
        assert state["attempts"] == 2  # racer 1 + outer 1
        got = _content(spark, t)
        assert got[5] == -1 and got[900] == -5 and got[60_000] == -2

    def test_range_join_tier_recomputes_on_key_overlap(
        self, spark, tmp_path, monkeypatch
    ):
        """Batch-test negative: the racer inserts the SAME key the
        outer batch inserts — the racing entry's range contains a
        source key, so the tier recomputes (rebase would duplicate)."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        state = _race(spark, root, [(60_000, -5)], monkeypatch)
        stats = merge_upsert_write_pruned(
            root, _src(spark, [(60_000, -9)]), "k",
            vacuum_keep_last=None, max_exact_keys=0,
        )
        assert stats["pruning"] == "range-join"
        assert stats["rebased"] is False
        assert state["attempts"] == 3  # racer 1 + outer 2
        rows = t.read(spark).filter(F.col("k") == 60_000).collect()
        assert len(rows) == 1 and rows[0]["v"] == -9

    @pytest.mark.parametrize("segmented", [False, True])
    def test_mor_disjoint_conflict_rebases(
        self, spark, tmp_path, monkeypatch, segmented
    ):
        root = str(tmp_path / "t")
        t = _mk(spark, root, segmented=segmented)
        state = _race(spark, root, [(900, -5)], monkeypatch)
        stats = merge_upsert_write_pruned(
            root, _src(spark, [(5, -1), (60_000, -2)]), "k",
            vacuum_keep_last=None, write_mode="mor",
        )
        assert stats["write_mode"] == "mor"
        assert stats["rebased"] is True
        assert state["attempts"] == 2  # racer 1 + outer 1
        got = _content(spark, t)
        assert got[5] == -1 and got[900] == -5 and got[60_000] == -2
        assert got[7] == 14 and len(got) == 1_001

    def test_commit_level_rebase_records_manifest_field(
        self, spark, tmp_path
    ):
        """Deterministic commit-level check without the merge driver:
        a prepared commit with a stale expected_base_version and a
        disjoint scope publishes via rebase and records the audit
        field; without a scope it raises."""
        from airflow_embeddings_pipeline_spark.sources.versioned import (
            SnapshotConflictError,
        )

        root = str(tmp_path / "t")
        t = _mk(spark, root, n=200, parts=4)
        man_v1 = t.manifest(1)
        low = min(man_v1["files"], key=lambda e: e["min"])
        # a racing append moves the head to v2 (adds files, touches none)
        t.commit_with_manifest(
            _src(spark, [(10_000, 1)]), "k",
            carried=man_v1["files"], expected_base_version=1,
        )
        carried = [
            e for e in man_v1["files"] if e["path"] != low["path"]
        ]
        df = _src(spark, [(0, -1)])
        with pytest.raises(SnapshotConflictError):
            t.commit_with_manifest(
                df, "k", carried=carried, expected_base_version=1
            )
        v = t.commit_with_manifest(
            df, "k", carried=carried, expected_base_version=1,
            rebase_on_conflict={
                "touched": {low["path"]},
                "exclude": {low["path"]},
                "might_touch": lambda e: False,
            },
        )
        assert v == 3
        man = t._raw_manifest(3)
        assert man["rebase"] == {"planned_base": 1, "onto": 2}
        # head content: racer's append survived the rebase
        ks = {r["k"] for r in t.read(spark).collect()}
        assert 10_000 in ks and 0 in ks


class TestDmlRebase:
    """Row-level DML (delete_where / update_where) uses the same
    logical-rebase scope: its candidate files as the dependency set,
    its compiled predicate pruner as the racing-entry test."""

    def test_delete_rebases_on_disjoint_racing_merge(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        orig = VersionedParquetTable.commit_with_manifest
        state = {"armed": True}

        def inject(self, *a, **kw):
            if state["armed"] and kw.get("operation") == "DELETE":
                state["armed"] = False
                merge_upsert_write_pruned(
                    root, _src(spark, [(900, -5)]), "k",
                    vacuum_keep_last=None,
                )
            return orig(self, *a, **kw)

        monkeypatch.setattr(
            VersionedParquetTable, "commit_with_manifest", inject
        )
        r = t.delete_where(spark, "k < 10")
        assert r["rows_deleted"] == 10
        assert t._last_commit_rebase is not None  # absorbed, no recompute
        got = _content(spark, t)
        assert 0 not in got and 9 not in got
        assert got[900] == -5 and got[10] == 20

    def test_delete_recomputes_when_racing_insert_matches(
        self, spark, tmp_path, monkeypatch
    ):
        """A racing insert whose key MATCHES the delete predicate must
        force the recompute — serial execution deletes it."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        orig = VersionedParquetTable.commit_with_manifest
        state = {"armed": True}

        def inject(self, *a, **kw):
            if state["armed"] and kw.get("operation") == "DELETE":
                state["armed"] = False
                merge_upsert_write_pruned(
                    root, _src(spark, [(-5, -5)]), "k",
                    vacuum_keep_last=None,
                )
            return orig(self, *a, **kw)

        monkeypatch.setattr(
            VersionedParquetTable, "commit_with_manifest", inject
        )
        r = t.delete_where(spark, "k < 10")
        # the recompute saw the racing insert and deleted it too
        assert r["rows_deleted"] == 11
        assert t._last_commit_rebase is None
        got = _content(spark, t)
        assert -5 not in got and 0 not in got and got[10] == 20

    def test_update_rebases_on_disjoint_racing_merge(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        orig = VersionedParquetTable.commit_with_manifest
        state = {"armed": True}

        def inject(self, *a, **kw):
            if state["armed"] and kw.get("operation") == "UPDATE":
                state["armed"] = False
                merge_upsert_write_pruned(
                    root, _src(spark, [(900, -5)]), "k",
                    vacuum_keep_last=None,
                )
            return orig(self, *a, **kw)

        monkeypatch.setattr(
            VersionedParquetTable, "commit_with_manifest", inject
        )
        r = t.update_where(spark, "k < 10", {"v": "v + 1000"})
        assert r["rows_updated"] == 10
        assert t._last_commit_rebase is not None
        got = _content(spark, t)
        assert got[0] == 1000 and got[9] == 1018
        assert got[900] == -5 and got[10] == 20
