"""Deletion vectors (merge-on-read) — the row-level write path that
does NOT rewrite data files.

Reference parity: the reference's warehouse gets row-level DELETE /
UPDATE from Snowflake's micro-partition DML (embeddings-pipeline.py:
294-352 relies on MERGE ... WHEN MATCHED THEN UPDATE/DELETE); Delta's
deletion vectors are the lakehouse analog.  This suite asserts:

* ``delete_where`` marks rows in sidecars, never rewrites data files;
* repeated deletes accumulate; a fully-deleted file drops its entry;
* every reader (read / time travel / read_range / pruned merge
  subset) applies DVs;
* MERGE ``write_mode="mor"`` is row-identical to copy-on-write,
  including its CDF feed;
* vacuum / clone / restore / maintain(purge) keep DV lifecycles
  correct.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators.merge import (
    merge_upsert_write_pruned,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
)


def _mk(spark, root, n=1000, parts=4):
    t = VersionedParquetTable(root)
    t.commit_with_manifest(
        spark.range(n).selectExpr(
            "id as k", "id * 2 as v", "concat('x', id) as s"
        ),
        "k",
        cluster_partitions=parts,
    )
    return t


def _data_files(root):
    return {
        os.path.basename(p)
        for p in glob.glob(os.path.join(root, "v*", "*.parquet"))
        if not os.path.basename(p).startswith(("dv-", "_", "."))
    }


class TestDeleteWhere:
    def test_marks_rows_without_rewriting_files(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        before = _data_files(root)
        r = t.delete_where(spark, "k % 100 = 7")
        assert r["rows_deleted"] == 10
        assert _data_files(root) == before  # zero data files written
        live = t.read(spark)
        assert live.count() == 990
        assert live.filter("k % 100 = 7").count() == 0

    def test_accumulates_and_time_travels(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k < 10")
        t.delete_where(spark, "k >= 990")
        assert t.read(spark).count() == 980
        assert t.read_version(spark, 1).count() == 1000
        assert t.read_version(spark, 2).count() == 990
        # idempotent re-delete: rows already DV'd never re-match
        r = t.delete_where(spark, "k < 10")
        assert r["rows_deleted"] == 0

    def test_fully_deleted_file_drops_entry(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)  # 4 files of 250 rows
        n_before = len(t.manifest(1)["files"])
        t.delete_where(spark, "k >= 750")
        man = t.manifest(t.current_version())
        assert len(man["files"]) == n_before - 1
        assert t.read(spark).count() == 750

    def test_cap_raises_with_cow_guidance(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        with pytest.raises(ValueError, match="copy-on-write"):
            t.delete_where(spark, "k >= 0", max_dv_rows=10)

    def test_read_range_applies_dv(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k in (100, 150, 200)")
        got = t.read_range(spark, "k", 100, 200)
        assert got.count() == 98
        assert got.filter("k in (100, 150, 200)").count() == 0

    def test_noop_keeps_version(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        r = t.delete_where(spark, "k = -1")
        assert r == {"version": 1, "rows_deleted": 0, "files_affected": 0}


class TestMorMerge:
    def _src(self, spark):
        upd = spark.range(40).selectExpr(
            "id * 23 as k",
            "id * 1000 as v",
            "concat('upd', id) as s",
            "id % 5 = 2 as dead",
        )
        ins = spark.range(15).selectExpr(
            "5000 + id as k", "id as v", "concat('new', id) as s",
            "false as dead",
        )
        return upd.union(ins)

    def test_parity_with_cow(self, spark, tmp_path):
        ra, rb = str(tmp_path / "cow"), str(tmp_path / "mor")
        ta, tb = _mk(spark, ra), _mk(spark, rb)
        src = self._src(spark)
        kw = dict(
            update_columns=["v", "s"],
            delete_when=F.col("s.dead"),
            evolution_exclude=["dead"],
        )
        r_cow = merge_upsert_write_pruned(ra, src, "k", write_mode="cow", **kw)
        r_mor = merge_upsert_write_pruned(rb, src, "k", write_mode="mor", **kw)
        assert r_cow["write_mode"] == "cow"
        assert r_mor["write_mode"] == "mor"
        assert r_mor["dv_rows_added"] == 40  # every matched key DV'd
        # MoR writes orders of magnitude less: batch-sized appends
        assert r_mor["bytes_rewritten"] < r_cow["bytes_rewritten"]
        a, b = ta.read(spark), tb.read(spark)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        # the CDF of the MoR commit is identical to copy-on-write's
        ca = ta.changes_between(spark, 1, 2).orderBy("k", "_change_type")
        cb = tb.changes_between(spark, 1, 2).orderBy("k", "_change_type")
        assert ca.toPandas().equals(cb.toPandas())

    def test_two_rounds_accumulate(self, spark, tmp_path):
        ra, rb = str(tmp_path / "cow"), str(tmp_path / "mor")
        ta, tb = _mk(spark, ra), _mk(spark, rb)
        for mult in (23, 41):
            src = spark.range(30).selectExpr(
                f"id * {mult} as k", "id as v", f"'m{mult}' as s"
            )
            merge_upsert_write_pruned(
                ra, src, "k", update_columns=["v", "s"], write_mode="cow"
            )
            merge_upsert_write_pruned(
                rb, src, "k", update_columns=["v", "s"], write_mode="mor"
            )
        a, b = ta.read(spark), tb.read(spark)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_composite_key_parity(self, spark, tmp_path):
        def mk2(root):
            t = VersionedParquetTable(root)
            t.commit_with_manifest(
                spark.range(5000).selectExpr(
                    "id % 50 as k1",
                    "id as k2",
                    "id * 3 as v",
                ),
                "k1",
                stats_columns=["k1", "k2"],
                cluster_partitions=4,
            )
            return t

        ra, rb = str(tmp_path / "cow"), str(tmp_path / "mor")
        ta, tb = mk2(ra), mk2(rb)
        src = spark.range(20).selectExpr(
            "id % 50 as k1", "id * 100 as k2", "0 as v"
        )
        r_cow = merge_upsert_write_pruned(
            ra, src, ["k1", "k2"], write_mode="cow", vacuum_keep_last=None
        )
        r_mor = merge_upsert_write_pruned(
            rb, src, ["k1", "k2"], write_mode="mor", vacuum_keep_last=None
        )
        assert r_mor["write_mode"] == "mor"
        a, b = ta.read(spark), tb.read(spark)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        # composite-key CDF agrees across the two strategies
        ca = ta.changes_between(spark, 1, 2).orderBy("k1", "k2", "_change_type")
        cb = tb.changes_between(spark, 1, 2).orderBy("k1", "k2", "_change_type")
        assert ca.toPandas().equals(cb.toPandas())

    def test_null_key_falls_back_to_cow(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        src = spark.sql(
            "select * from values (cast(null as long), 1L, 'n') as t(k, v, s)"
        )
        r = merge_upsert_write_pruned(root, src, "k", write_mode="mor")
        assert r["write_mode"] == "cow"  # degenerate case: fallback
        live = t.read(spark)
        assert live.count() == 1001
        assert live.filter("k is null").count() == 1

    def test_dv_cap_falls_back_to_cow(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        src = spark.range(500).selectExpr("id as k", "id as v", "'u' as s")
        r = merge_upsert_write_pruned(
            root, src, "k", write_mode="mor", max_dv_rows=100
        )
        assert r["write_mode"] == "cow"
        assert t.read(spark).count() == 1000

    def test_mor_after_delete_where(self, spark, tmp_path):
        # a deleted row must never re-match a later merge
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k = 46")  # 46 = 2*23
        src = spark.range(5).selectExpr("id * 23 as k", "id as v", "'u' as s")
        r = merge_upsert_write_pruned(
            root, src, "k", update_columns=["v", "s"], write_mode="mor"
        )
        assert r["write_mode"] == "mor"
        live = t.read(spark)
        # k=46 was deleted, then re-inserted by the merge (source key)
        assert live.filter("k = 46").count() == 1
        assert live.filter("k = 46").first()["s"] == "u"
        assert live.count() == 1000 + 0  # 1 deleted, 1 re-inserted, 4 updated

    def test_cow_merge_reads_dv_subset(self, spark, tmp_path):
        # copy-on-write after delete_where: deleted rows must not
        # resurrect into the rewritten files
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k in (10, 20, 30)")
        src = spark.range(3).selectExpr("11 + id as k", "0 as v", "'u' as s")
        merge_upsert_write_pruned(
            root, src, "k", update_columns=["v", "s"], write_mode="cow"
        )
        live = t.read(spark)
        assert live.filter("k in (10, 20, 30)").count() == 0
        assert live.count() == 997


class TestUpdateWhere:
    def test_updates_without_rewriting_files(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        before = _data_files(root)
        r = t.update_where(
            spark, "k % 100 = 7", {"v": "v + 1000000", "s": "'touched'"}
        )
        assert r["rows_updated"] == 10
        # only the appended images are new; touched files untouched
        assert before <= _data_files(root)
        live = t.read(spark)
        assert live.count() == 1000
        got = live.filter("s = 'touched'").orderBy("k").collect()
        assert [x["k"] for x in got] == [7 + 100 * i for i in range(10)]
        assert got[0]["v"] == 14 + 1000000  # pre-update row visible

    def test_expressions_see_pre_update_row(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        # swap-style: both assignments read the OLD values
        t.update_where(spark, "k = 5", {"v": "k", "k": "v"})
        live = t.read(spark)
        assert live.filter("k = 10 and v = 5").count() == 1
        assert live.filter("k = 5").count() == 0

    def test_cdf_classifies_update(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root, n=100, parts=2)
        t.update_where(spark, "k = 42", {"v": "999"})
        ch = t.changes_between(spark, 1, 2)
        got = sorted((r["_change_type"], r["v"]) for r in ch.collect())
        assert got == [("update_postimage", 999), ("update_preimage", 84)]

    def test_noop_and_unknown_column(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        assert t.update_where(spark, "k = -1", {"v": "0"}) == {
            "version": 1,
            "rows_updated": 0,
            "files_affected": 0,
        }
        with pytest.raises(ValueError, match="unknown columns"):
            t.update_where(spark, "k = 1", {"nope": "0"})

    def test_constraint_enforced_on_updated_images(self, spark, tmp_path):
        from airflow_embeddings_pipeline_spark.sources.versioned import (
            ConstraintViolationError,
        )

        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.add_constraint(spark, "v_nonneg", "v >= 0")
        with pytest.raises(ConstraintViolationError):
            t.update_where(spark, "k = 3", {"v": "-1"})
        assert t.read(spark).filter("v < 0").count() == 0


class TestDmlSequenceModel:
    def test_random_dml_sequence_matches_model(self, spark, tmp_path):
        """Property-style: a seeded random sequence of delete_where /
        update_where / MoR merges tracks a pure-pandas model exactly —
        the DV read path, accumulation, and image appends compose
        under arbitrary interleavings, not just the curated cases."""
        import random

        import pandas as pd

        rng = random.Random(0xD5)
        root = str(tmp_path / "t")
        t = _mk(spark, root, n=500, parts=4)
        model = pd.DataFrame(
            {
                "k": range(500),
                "v": [i * 2 for i in range(500)],
                "s": [f"x{i}" for i in range(500)],
            }
        )
        for step in range(12):
            op = rng.choice(["delete", "update", "merge"])
            if op == "delete":
                lo = rng.randrange(0, 900)
                hi = lo + rng.randrange(1, 60)
                t.delete_where(spark, f"k >= {lo} and k < {hi}")
                model = model[~((model.k >= lo) & (model.k < hi))]
            elif op == "update":
                m = rng.randrange(3, 9)
                r = rng.randrange(0, m)
                t.update_where(
                    spark, f"k % {m} = {r}", {"v": f"v + {step + 1}"}
                )
                mask = (model.k % m) == r
                model = model.copy()
                model.loc[mask, "v"] += step + 1
            else:
                ks = sorted(rng.sample(range(0, 900), 8))
                src = spark.createDataFrame(
                    [(k, step, f"m{step}") for k in ks],
                    "k long, v long, s string",
                )
                merge_upsert_write_pruned(
                    root, src, "k", update_columns=["v", "s"],
                    write_mode="mor", vacuum_keep_last=None,
                )
                model = model[~model.k.isin(ks)]
                model = pd.concat(
                    [
                        model,
                        pd.DataFrame(
                            {
                                "k": ks,
                                "v": [step] * len(ks),
                                "s": [f"m{step}"] * len(ks),
                            }
                        ),
                    ]
                )
            got = (
                t.read(spark)
                .orderBy("k")
                .toPandas()
                .reset_index(drop=True)
            )
            want = model.sort_values("k").reset_index(drop=True)
            assert got["k"].tolist() == want["k"].tolist(), f"step {step}"
            assert got["v"].tolist() == want["v"].tolist(), f"step {step}"
            assert got["s"].tolist() == want["s"].tolist(), f"step {step}"


class TestHistoryAttribution:
    def test_history_operations_and_logical_rows(self, spark, tmp_path):
        # DESCRIBE HISTORY analog: engine writes self-attribute, and
        # n_rows is LOGICAL (physical minus deletion-vector rows)
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k < 5")
        t.update_where(spark, "k = 10", {"v": "0"})
        src = spark.range(2).selectExpr(
            "id * 100 as k", "id as v", "'m' as s"
        )
        merge_upsert_write_pruned(
            root, src, "k", write_mode="mor", vacuum_keep_last=None
        )
        t.compact(spark, min_file_bytes=1 << 30)
        h = {e["version"]: e for e in t.history()}
        assert h[1]["operation"] is None
        assert h[2]["operation"] == "DELETE"
        assert h[2]["n_rows"] == 995 and h[2]["dv_rows"] == 5
        assert h[3]["operation"] == "UPDATE"
        assert h[4]["operation"] == "MERGE[mor]"
        assert h[5]["operation"] == "OPTIMIZE[compact]"
        assert h[5]["dv_rows"] == 0  # compact folded the DVs
        # logical rows track the MoR history: the merge re-inserts
        # k=0 (deleted at v2) and updates k=100 → +1 row; compact
        # changes nothing logically
        assert h[3]["n_rows"] == 995
        assert h[4]["n_rows"] == h[5]["n_rows"] == 996


class TestDetail:
    def test_detail_summarizes_live_snapshot(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k < 5")
        t.add_bloom_index("v")
        t.rename_column("v", "val")
        d = t.detail()
        assert d["n_rows"] == 995 and d["dv_rows"] == 5
        assert d["key"] == "k" and d["bloom_columns"] == ["val"]
        assert d["operation"] == "ALTER[rename]"
        # k < 5 is range-clustered into ONE file: exactly one DV
        assert d["n_files"] == 4 and d["dv_files"] == 1


class TestDmlConcurrency:
    def test_racing_deletes_both_land(self, spark, tmp_path):
        # the DML paths CAS on their scanned snapshot and
        # recompute-on-conflict (same loop as the pruned MERGE): two
        # racing deletes must both apply, never silently lose one
        import threading
        import time

        from airflow_embeddings_pipeline_spark.sources.versioned import (
            ConcurrentCommitError,
            SnapshotConflictError,
        )

        root = str(tmp_path / "t")
        t = _mk(spark, root)
        errs = []

        def run(cond):
            # lock contention (ConcurrentCommitError) is the CALLER's
            # to retry (single-writer contract, same as the merge
            # stress); snapshot conflicts recompute inside delete_where
            try:
                for _ in range(60):
                    try:
                        VersionedParquetTable(root).delete_where(
                            spark, cond, conflict_retries=5
                        )
                        return
                    except SnapshotConflictError:
                        raise
                    except ConcurrentCommitError:
                        time.sleep(0.1)
                errs.append(TimeoutError(cond))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ths = [
            threading.Thread(target=run, args=(c,))
            for c in ("k < 10", "k >= 990", "k = 500")
        ]
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        assert not errs, errs
        live = t.read(spark)
        assert live.count() == 1000 - 10 - 10 - 1
        assert live.filter("k < 10 or k >= 990 or k = 500").count() == 0


class TestLifecycles:
    def test_vacuum_keeps_referenced_sidecars(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k % 100 = 7")
        t.delete_where(spark, "k in (1, 2, 3)")
        t.vacuum(keep_last=1)
        assert t.read(spark).count() == 987  # sidecars survived
        # the v2 sidecar is still referenced by v3 entries
        assert glob.glob(os.path.join(root, "v*", "dv-*"))  # file or dir form

    def test_maintain_purges_heavy_dv(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k % 2 = 0")  # dv_ratio 0.5
        m = t.maintain(spark, max_small_files=1000)
        assert [a["action"] for a in m["actions"]] == ["purge_dv"]
        assert m["signals"]["dv_ratio"] == 0.5
        man = t.manifest(t.current_version())
        assert not any(e.get("dv") for e in man["files"])
        assert t.read(spark).count() == 500
        t.vacuum(keep_last=1)
        assert not glob.glob(os.path.join(root, "v*", "dv-*"))
        assert t.read(spark).count() == 500

    def test_maintain_below_ratio_no_purge(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k = 1")
        m = t.maintain(spark, max_small_files=1000)
        assert all(a["action"] != "purge_dv" for a in m["actions"])
        assert m["signals"]["dv_files"] == 1

    def test_clone_rewrites_dv_sidecar(self, spark, tmp_path):
        root, dest = str(tmp_path / "t"), str(tmp_path / "c")
        t = _mk(spark, root)
        t.delete_where(spark, "k % 100 = 7")
        t.clone_to(dest)
        tc = VersionedParquetTable(dest)
        got = tc.read(spark)
        assert got.count() == 990
        assert got.filter("k % 100 = 7").count() == 0
        # independent lifecycles
        tc.delete_where(spark, "k = 10")
        assert tc.read(spark).count() == 989
        assert t.read(spark).count() == 990

    def test_restore_resurrects_via_cdf(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root, n=100, parts=2)
        t.delete_where(spark, "k in (5, 50, 99)")
        ch = t.changes_between(spark, 1, 2)
        assert sorted(
            (r["k"], r["_change_type"]) for r in ch.collect()
        ) == [(5, "delete"), (50, "delete"), (99, "delete")]
        t.restore(spark, 1)
        ch2 = t.changes_between(spark, 2, 3)
        assert sorted(
            (r["k"], r["_change_type"]) for r in ch2.collect()
        ) == [(5, "insert"), (50, "insert"), (99, "insert")]
        assert t.read(spark).count() == 100

    def test_changes_file_diff_counts_dv(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k = 500")
        v = t.current_version()
        d = t.changes_file_diff(v - 1, v)
        assert d["files_dv_changed"] == 1
        assert d["files_old"] == 0 and d["files_new"] == 0

    def test_stream_cdf_matches_batch_across_dv_commits(
        self, spark, tmp_path
    ):
        # the streaming CDF source reads DV deltas (only the delta
        # positions, never the whole carried file) — stream ≡ batch
        # per-commit across a DV delete, a MoR merge, and a restore
        from airflow_embeddings_pipeline_spark.sources.versioned_stream import (
            read_changes_stream,
        )

        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k in (5, 500)")
        src = spark.range(2).selectExpr(
            "5 + id * 700 as k", "42 as v", "'mor' as s"
        )
        merge_upsert_write_pruned(
            root, src, "k", update_columns=["v", "s"], write_mode="mor",
            vacuum_keep_last=None,
        )
        t.restore(spark, 2)  # undo the merge; its DV delta reverses
        q = (
            read_changes_stream(spark, root, starting_version=1)
            .writeStream.format("memory")
            .queryName("dv_cdf_q")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        got = spark.table("dv_cdf_q")
        exp = (
            t.changes_between(spark, 1, 2)
            .unionAll(t.changes_between(spark, 2, 3))
            .unionAll(t.changes_between(spark, 3, 4))
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, exp.collect())
        )
        # v1→v2 is the two deletes; v3→v4 (restore) reverses the merge
        assert (
            got.filter("_commit_version = 2 and _change_type = 'delete'")
            .count()
            == 2
        )

    def test_net_cdf_across_delete_and_merge(self, spark, tmp_path):
        # multi-commit NET diff spanning a DV delete then a MoR merge
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k in (100, 200)")
        src = spark.range(2).selectExpr(
            "100 + id * 100 as k", "7 as v", "'re' as s"
        )
        merge_upsert_write_pruned(
            root, src, "k", update_columns=["v", "s"], write_mode="mor",
            vacuum_keep_last=None,
        )
        # net: delete(old image) + insert(new image) nets to UPDATE
        ch = t.changes_since(spark, 1)
        got = sorted((r["k"], r["_change_type"], r["v"]) for r in ch.collect())
        assert got == [
            (100, "update_postimage", 7),
            (100, "update_preimage", 200),
            (200, "update_postimage", 7),
            (200, "update_preimage", 400),
        ]


class TestDistributedSidecar:
    """The r9 executor-side DV sidecar write: positions never cross
    the driver (only per-file counts do), and the validation that the
    driver path did in numpy rides the write job as an Observation."""

    def test_sidecar_is_directory_and_sorted(self, spark, tmp_path, monkeypatch):
        from airflow_embeddings_pipeline_spark.sources import versioned as V

        # force the distributed path at fixture scale (below the cap a
        # DML this small takes the cheaper driver dict path)
        monkeypatch.setattr(V, "_DV_INLINE_MAX", 0)
        root = str(tmp_path / "t")
        t = _mk(spark, root, n=10_000, parts=8)
        t.delete_where(spark, "k % 5 = 2")
        man = t.manifest(t.current_version())
        dv_refs = {e["dv"]["path"] for e in man["files"] if e.get("dv")}
        assert len(dv_refs) == 1
        sc = os.path.join(root, dv_refs.pop())
        assert os.path.isdir(sc)  # Spark-written directory form
        import pyarrow.parquet as pq

        tbl = pq.read_table(sc)
        assert tbl.column_names == ["_path", "_pos"]
        assert tbl.num_rows == 2_000
        # per-file positions sorted (the _dv_read_positions contract
        # re-sorts anyway; this pins the write-side layout)
        import numpy as np

        for e in man["files"]:
            if not e.get("dv"):
                continue
            pos = t._dv_positions_of(e)
            assert len(pos) == e["dv"]["rows"]
            assert bool(np.all(pos[:-1] < pos[1:]))

    def test_out_of_range_position_fails_before_publish(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        man = t.manifest(1)
        rel = man["files"][0]["path"]
        bad = spark.createDataFrame(
            [(rel, 10**9)], "__file string, __pos long"
        )
        with pytest.raises(ValueError, match="out of range"):
            t.commit_with_manifest(
                spark.createDataFrame([], "k long, v long, s string"),
                "k",
                carried=man["files"],
                cluster_partitions=1,
                dv_updates_df=bad,
                dv_delta_counts={rel: 1},
                skip_data_write=True,
                expected_base_version=1,
            )
        assert t.current_version() == 1  # nothing published

    def test_overlapping_delta_fails_loud(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k = 3")
        man = t.manifest(t.current_version())
        dv_e = next(e for e in man["files"] if e.get("dv"))
        import numpy as np

        prior = t._dv_positions_of(dv_e)
        dup = spark.createDataFrame(
            [(dv_e["path"], int(prior[0]))], "__file string, __pos long"
        )
        # delta + prior implies one MORE deleted row than the sidecar
        # can hold distinct — the observed-count tripwire fires
        with pytest.raises(ValueError, match="duplicate|overlap"):
            t.commit_with_manifest(
                spark.createDataFrame([], "k long, v long, s string"),
                "k",
                carried=man["files"],
                cluster_partitions=1,
                dv_updates_df=dup,
                dv_delta_counts={dv_e["path"]: 1},
                skip_data_write=True,
                expected_base_version=t.current_version(),
            )

    def test_fully_deleted_file_dropped_from_manifest(
        self, spark, tmp_path, monkeypatch
    ):
        from airflow_embeddings_pipeline_spark.sources import versioned as V

        monkeypatch.setattr(V, "_DV_INLINE_MAX", 0)  # distributed path
        root = str(tmp_path / "t")
        t = _mk(spark, root, n=1000, parts=4)
        man1 = t.manifest(1)
        lo_file = min(man1["files"], key=lambda e: e["min"])
        # delete every row of the lowest-range file via the df path
        r = t.delete_where(
            spark, f"k >= {lo_file['min']} and k <= {lo_file['max']}"
        )
        assert r["rows_deleted"] == lo_file["n_rows"]
        man2 = t.manifest(t.current_version())
        assert lo_file["path"] not in {e["path"] for e in man2["files"]}
        assert t.read(spark).count() == 1000 - lo_file["n_rows"]

    def test_mutually_exclusive_forms_rejected(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        man = t.manifest(1)
        rel = man["files"][0]["path"]
        df = spark.createDataFrame([(rel, 0)], "__file string, __pos long")
        with pytest.raises(ValueError, match="not both"):
            t.commit_with_manifest(
                spark.createDataFrame([], "k long, v long, s string"),
                "k",
                carried=man["files"],
                dv_updates={rel: [0]},
                dv_updates_df=df,
                dv_delta_counts={rel: 1},
                skip_data_write=True,
            )
        with pytest.raises(ValueError, match="dv_delta_counts"):
            t.commit_with_manifest(
                spark.createDataFrame([], "k long, v long, s string"),
                "k",
                carried=man["files"],
                dv_updates_df=df,
                skip_data_write=True,
            )


class TestReorg:
    def test_reorg_one_commit_purges_and_binpacks(self, spark, tmp_path):
        """DV'd SMALL files + the small-file signal firing together
        must produce ONE commit (OPTIMIZE[reorg]) that both purges the
        DVs and bin-packs — not a purge whose output a second compact
        commit rewrites again."""
        root = str(tmp_path / "t")
        t = VersionedParquetTable(root)
        # 12 small files, all DV'd
        t.commit_with_manifest(
            spark.range(12_000).selectExpr(
                "id as k", "id * 2 as v", "concat('x', id) as s"
            ),
            "k",
            cluster_partitions=12,
        )
        t.delete_where(spark, "k % 2 = 0")  # dv_ratio 0.5 on every file
        v_before = t.current_version()
        m = t.maintain(spark, max_small_files=4)
        assert [a["action"] for a in m["actions"]] == ["reorg"]
        # exactly ONE new commit
        assert t.current_version() == v_before + 1
        man = t.manifest(t.current_version())
        assert not any(e.get("dv") for e in man["files"])
        # bin-packed: far fewer files than the 12 rewritten
        assert len(man["files"]) < 12
        assert t.read(spark).count() == 6_000
        assert t.read(spark).filter("k % 2 = 0").count() == 0
        # history attributes the combined op
        assert t.history()[0]["operation"] == "OPTIMIZE[reorg]"
        # second maintain is a no-op: both signals satisfied by one pass
        m2 = t.maintain(spark, max_small_files=4)
        assert m2["actions"] == []

    def test_purge_alone_when_small_signal_quiet(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root, n=1000, parts=2)
        t.delete_where(spark, "k % 2 = 0")
        m = t.maintain(spark, max_small_files=1000)
        assert [a["action"] for a in m["actions"]] == ["purge_dv"]
        assert t.history()[0]["operation"] == "OPTIMIZE[purge-dv]"


    def test_small_delta_over_heavy_priors_stays_executor_side(
        self, spark, tmp_path, monkeypatch
    ):
        """_dv_plan's middle branch: the probe is small but the touched
        files' PRIOR DV mass exceeds the inline cap — the union must
        not read that mass to the driver, so the commit takes the
        executor-side path with probe-derived exact counts."""
        from airflow_embeddings_pipeline_spark.sources import versioned as V

        root = str(tmp_path / "t")
        t = _mk(spark, root, n=2_000, parts=2)
        # first wave: 200 positions (dict path at the patched cap)
        monkeypatch.setattr(V, "_DV_INLINE_MAX", 300)
        r1 = t.delete_where(spark, "k % 10 = 3")
        assert r1["rows_deleted"] == 200
        # second wave: probe 200 <= 300 but prior 200 pushes past the
        # cap -> df path; assert the directory sidecar form proves it
        r2 = t.delete_where(spark, "k % 10 = 7")
        assert r2["rows_deleted"] == 200
        man = t.manifest(t.current_version())
        dv_refs = {e["dv"]["path"] for e in man["files"] if e.get("dv")}
        assert len(dv_refs) == 1
        assert os.path.isdir(os.path.join(root, dv_refs.pop()))
        assert t.read(spark).count() == 1_600
        assert t.read(spark).filter("k % 10 in (3, 7)").count() == 0
        # per-file rows exact: delta counts + prior, no double count
        assert sum(e["dv"]["rows"] for e in man["files"] if e.get("dv")) == 400


class TestCloneDvSpark:
    def test_clone_spark_dv_remap_matches_driver_path(
        self, spark, tmp_path
    ):
        """Above the DV-mass threshold clone_to remaps the sidecar with
        a Spark job (directory sidecar, no driver position read); the
        clone must read identically to the driver-path clone."""
        root = str(tmp_path / "t")
        t = _mk(spark, root, n=4_000, parts=4)
        t.delete_where(spark, "k % 3 = 1")
        a, b = str(tmp_path / "ca"), str(tmp_path / "cb")
        t.clone_to(a)  # driver path (mass below default threshold)
        t.clone_to(b, spark=spark, dv_spark_threshold=0)  # forced job
        ta, tb = VersionedParquetTable(a), VersionedParquetTable(b)
        ra = sorted(map(tuple, ta.read(spark).collect()))
        rb = sorted(map(tuple, tb.read(spark).collect()))
        assert ra == rb and len(ra) == 4_000 - len(
            [k for k in range(4_000) if k % 3 == 1]
        )
        # the spark-path sidecar is a directory; refs and rows intact
        man_b = tb.manifest(1)
        dv_refs = {e["dv"]["path"] for e in man_b["files"] if e.get("dv")}
        assert len(dv_refs) == 1
        assert os.path.isdir(os.path.join(b, dv_refs.pop()))
        assert sum(
            e["dv"]["rows"] for e in man_b["files"] if e.get("dv")
        ) == len([k for k in range(4_000) if k % 3 == 1])
        # lifecycle: further DML on the spark-path clone works
        tb.delete_where(spark, "k = 0")
        assert tb.read(spark).count() == len(ra) - 1
