"""Segmented manifests — commit metadata I/O bounded by TOUCHED
entries, not table size.

The inline manifest form rewrites the full file-entry list as one JSON
document per commit; at 100 TB (~800k files) that is ~250 MB of
metadata rewrite for a one-file DML commit — the scale wall Delta
solves with log segments + checkpoints and Iceberg with manifest
files.  Above ``manifest_inline_max`` entries the manifest stores its
entries in immutable ``_mseg-*.parquet`` segments and each commit
carries every untouched segment by reference.

This suite pins:

* storage form switches at the threshold; readers see ONE shape;
* append / DML / metadata-only commits carry untouched segments
  (metadata-only writes ZERO new segments);
* every lifecycle (read, time travel, DML, merge, CDF batch+stream,
  restore, clone, vacuum partial-GC, crash orphans) is row-identical
  to an inline twin table driven through the same operations.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators.merge import (
    merge_upsert_write_pruned,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
)


def _mk(spark, root, n=200, parts=8, segmented=True):
    t = VersionedParquetTable(root)
    if segmented:
        t.manifest_inline_max = 4
        t.manifest_segment_rows = 3
    t.commit_with_manifest(
        spark.range(n).selectExpr("id as k", "id * 2 as v"),
        "k",
        cluster_partitions=parts,
    )
    return t


def _segs(t, v=None):
    raw = t._raw_manifest(v if v is not None else t.current_version())
    return {r["path"] for r in (raw or {}).get("file_segments") or []}


def _rows(spark, t):
    return sorted(map(tuple, t.read(spark).select("k", "v").collect()))


class TestStorageForm:
    def test_inline_below_threshold(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), parts=2, segmented=False)
        raw = t._raw_manifest(t.current_version())
        assert "files" in raw and "file_segments" not in raw

    def test_segmented_above_threshold(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        raw = t._raw_manifest(t.current_version())
        assert "files" not in raw and "file_segments" in raw
        assert raw["files_n"] == 8
        # materialized view is shape-identical to the inline form
        man = t.manifest(t.current_version())
        assert len(man["files"]) == 8
        assert "file_segments" not in man
        assert t.read(spark).count() == 200

    def test_segments_invisible_to_data_scans(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        seg_files = glob.glob(os.path.join(root, "v*", "_mseg-*.parquet"))
        assert seg_files  # they exist on disk
        # but no manifest entry ever names one
        man = t.manifest(t.current_version())
        assert not any("_mseg-" in e["path"] for e in man["files"])

    def test_segment_doc_is_small(self, spark, tmp_path):
        """The committed JSON doc carries refs, not entries — its size
        is O(segments), the point of the feature."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        v = t.current_version()
        doc = os.path.join(root, f"v{v:08d}", "_MANIFEST.json")
        inline_size = len(json.dumps(t.manifest(v)))
        # at test scale (3 segments of ≤3 entries) the per-ref
        # envelope is entry-sized, so the doc is merely smaller; the
        # O(segments)-vs-O(files) growth law is what matters and is
        # recorded by tools/probe_manifest_scale.py (167× at 4096
        # files)
        assert os.path.getsize(doc) < inline_size


class TestSegmentCarry:
    def test_append_carries_untouched_segments(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        v1 = t.current_version()
        man = t.manifest(v1)
        t.commit_with_manifest(
            spark.range(200, 210).selectExpr("id as k", "id * 2 as v"),
            "k",
            carried=man["files"],
            cluster_partitions=1,
            expected_base_version=v1,
        )
        s1, s2 = _segs(t, v1), _segs(t)
        assert s1 <= s2  # every v1 segment carried verbatim
        assert len(s2 - s1) == 1  # one new segment for the new file
        assert t.read(spark).count() == 210

    def test_metadata_only_commit_writes_zero_segments(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        v1 = t.current_version()
        t.add_constraint(spark, "v_nonneg", "v >= 0")
        assert _segs(t) == _segs(t, v1)
        # and the new version dir holds no segment files at all
        vdir = os.path.join(t.root, f"v{t.current_version():08d}")
        assert not glob.glob(os.path.join(vdir, "_mseg-*"))

    def test_dml_rewrites_only_affected_segments(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        v1 = t.current_version()
        # keys 0..24 live in the lowest file(s): one segment dirtied
        t.delete_where(spark, "k < 5")
        s1, s2 = _segs(t, v1), _segs(t)
        assert len(s1 & s2) >= 1  # untouched segments carried
        assert s2 != s1  # the affected one was rewritten
        assert t.read(spark).count() == 195


class TestLifecycleParity:
    """Drive an inline twin and a segmented table through the same
    operations; every read surface must match exactly."""

    def _twins(self, spark, tmp_path):
        a = _mk(spark, str(tmp_path / "inline"), segmented=False)
        b = _mk(spark, str(tmp_path / "seg"))
        return a, b

    def test_dml_and_merge_parity(self, spark, tmp_path):
        a, b = self._twins(spark, tmp_path)
        batch = spark.range(150, 260).selectExpr(
            "id as k", "id * 7 as v"
        )
        for t in (a, b):
            t.delete_where(spark, "k % 10 = 3")
            merge_upsert_write_pruned(t.root, batch, "k")
            t.update_where(spark, "k < 20", {"v": "v + 1"})
        assert _rows(spark, a) == _rows(spark, b)

    def test_cdf_parity(self, spark, tmp_path):
        a, b = self._twins(spark, tmp_path)
        for t in (a, b):
            t.delete_where(spark, "k between 40 and 60")
            merge_upsert_write_pruned(
                t.root,
                spark.range(0, 30).selectExpr("id as k", "id * 9 as v"),
                "k",
                vacuum_keep_last=None,
            )
        ca = a.changes_between(spark, 1, a.current_version())
        cb = b.changes_between(spark, 1, b.current_version())
        assert sorted(map(tuple, ca.collect())) == sorted(
            map(tuple, cb.collect())
        )

    def test_restore_and_time_travel_parity(self, spark, tmp_path):
        a, b = self._twins(spark, tmp_path)
        for t in (a, b):
            t.delete_where(spark, "k >= 100")
            t.restore(spark, 1)
        assert _rows(spark, a) == _rows(spark, b)
        assert (
            a.read_version(spark, 2).count()
            == b.read_version(spark, 2).count()
        )

    def test_clone_parity(self, spark, tmp_path):
        _, b = self._twins(spark, tmp_path)
        b.delete_where(spark, "k % 7 = 0")
        b.clone_to(str(tmp_path / "seg_clone"))
        c = VersionedParquetTable(str(tmp_path / "seg_clone"))
        assert _rows(spark, c) == _rows(spark, b)


class TestVacuum:
    def test_carried_segments_survive_partial_gc(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        man = t.manifest(t.current_version())
        # several small appends: v1's segments stay carried while v1
        # itself becomes a dead version
        for i in range(3):
            man = t.manifest(t.current_version())
            t.commit_with_manifest(
                spark.range(300 + i * 10, 310 + i * 10).selectExpr(
                    "id as k", "id * 2 as v"
                ),
                "k",
                carried=man["files"],
                cluster_partitions=1,
            )
        live_segs = _segs(t)
        assert any(s.startswith("v00000001/") for s in live_segs)
        t.vacuum(keep_last=1)
        for s in live_segs:
            assert os.path.exists(os.path.join(root, s)), s
        assert t.read(spark).count() == 230
        # a fresh instance (cold cache) materializes fine too
        t2 = VersionedParquetTable(root)
        assert t2.read(spark).count() == 230

    def test_dead_segments_are_collected(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        # full rewrite: v1 segments become unreferenced
        t.commit_with_manifest(
            t.read(spark).selectExpr("k", "v + 0 as v"),
            "k",
            cluster_partitions=8,
        )
        t.vacuum(keep_last=1)
        assert not glob.glob(os.path.join(root, "v00000001", "_mseg-*"))
        assert t.read(spark).count() == 200

    def test_crash_orphan_segments_cleaned(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        # simulate a crashed commit: an above-pointer vdir w/ segments
        orphan = os.path.join(root, "v00000099")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "_mseg-dead.parquet"), "wb") as f:
            f.write(b"x")
        t.add_constraint(spark, "c", "v >= 0")  # any commit reconciles
        assert not os.path.exists(orphan)


class TestStreamingCDF:
    def test_stream_matches_batch_over_segmented_table(
        self, spark, tmp_path
    ):
        from airflow_embeddings_pipeline_spark.sources.versioned_stream import (
            register_versioned_changes,
        )

        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k % 10 = 3")
        merge_upsert_write_pruned(
            root,
            spark.range(190, 220).selectExpr("id as k", "id * 5 as v"),
            "k",
            vacuum_keep_last=None,  # the stream replays from v1
        )
        register_versioned_changes(spark)
        stream = (
            spark.readStream.format("versioned_changes")
            .option("path", root)
            .option("startingVersion", "1")
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("seg_cdf_q")
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", str(tmp_path / "ckpt_seg_cdf")
            )
            .start()
        )
        q.awaitTermination()
        got = spark.table("seg_cdf_q")
        exp = t.changes_between(spark, 1, 2).unionAll(
            t.changes_between(spark, 2, 3)
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, exp.collect())
        )


class TestMetadataFastPath:
    def test_history_and_detail_match_inline_twin(self, spark, tmp_path):
        a = _mk(spark, str(tmp_path / "i"), segmented=False)
        b = _mk(spark, str(tmp_path / "s"))
        for t in (a, b):
            t.delete_where(spark, "k % 10 = 3")
            t.add_constraint(spark, "c", "v >= 0")
        strip = lambda d: {
            k: v for k, v in d.items() if k != "committed_at"
        }
        assert [strip(h) for h in a.history()] == [
            strip(h) for h in b.history()
        ]
        assert a.detail() == b.detail()

    def test_metadata_queries_do_not_materialize(self, spark, tmp_path):
        """history()/detail() on a segmented table answer from ref
        sums — a FRESH instance must not read a single segment file."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k % 10 = 3")
        t2 = VersionedParquetTable(root)
        t2.history()
        t2.detail()
        assert t2._seg_cache == {}


class TestEnvelopePruning:
    """Segment refs carry the union interval of their entries' stats
    (Iceberg manifest-list partition-summary analog): point/range
    reads materialize only the segments their interval touches."""

    def test_read_range_materializes_only_touched_segments(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "t")
        t = _mk(spark, root)  # 8 files over k=0..199, 3 segments
        t2 = VersionedParquetTable(root)  # cold cache
        got = sorted(
            r["k"] for r in t2.read_range(spark, "k", 0, 10).collect()
        )
        assert got == list(range(11))
        n_total = len(_segs(t))
        assert 0 < len(t2._seg_cache) < n_total

    def test_read_eq_and_where_prune_segments(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t2 = VersionedParquetTable(root)
        assert t2.read_eq(spark, "k", 3).count() == 1
        assert 0 < len(t2._seg_cache) < len(_segs(t))
        t3 = VersionedParquetTable(root)
        assert t3.read_where(spark, "k >= 190 AND v >= 0").count() == 10
        assert 0 < len(t3._seg_cache) < len(_segs(t))

    def test_unprunable_predicate_materializes_everything(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t2 = VersionedParquetTable(root)
        # arithmetic atom: compiles to might-match → all segments read
        assert t2.read_where(spark, "k * 2 < 20").count() == 10
        assert len(t2._seg_cache) == len(_segs(t))

    def test_envelope_survives_dml_and_carry(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k % 10 = 3")
        t.update_where(spark, "k between 50 and 60", {"v": "v + 1"})
        raw = t._raw_manifest(t.current_version())
        for ref in raw["file_segments"]:
            assert "env" in ref, ref
        t2 = VersionedParquetTable(root)
        got = {
            (r["k"], r["v"])
            for r in t2.read_range(spark, "k", 50, 55).collect()
        }
        assert got == {
            (k, k * 2 + 1) for k in range(50, 56) if k % 10 != 3
        }
        assert 0 < len(t2._seg_cache) < len(_segs(t))


class TestDmlOTouched:
    """Row-level DML on a segmented table is O(touched) driver-side:
    candidate materialization is envelope-pruned, the commit carries
    the base version by reference, and far segments are neither
    loaded nor rewritten (the carried-by-base commit form)."""

    def test_delete_loads_and_rewrites_only_touched_segments(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "t")
        t = _mk(spark, root, n=400, parts=16)  # 16 files, ~6 segments
        v1 = t.current_version()
        n_segs = len(_segs(t, v1))
        t2 = VersionedParquetTable(root)  # cold cache
        r = t2.delete_where(spark, "k < 20")
        assert r["rows_deleted"] == 20
        # the whole op (prune + scan + commit) touched a strict
        # subset of segments
        assert 0 < len(t2._seg_cache) < n_segs + r["files_affected"]
        raw2 = t2._raw_manifest(t2.current_version())
        carried = _segs(t2, v1) & {
            x["path"] for x in raw2["file_segments"]
        }
        assert len(carried) >= n_segs - 2  # far segments carried
        assert t2.read(spark).count() == 380

    def test_update_where_o_touched(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root, n=400, parts=16)
        v1 = t.current_version()
        n_segs = len(_segs(t, v1))
        t2 = VersionedParquetTable(root)
        r = t2.update_where(spark, "k between 100 and 110", {"v": "v + 7"})
        assert r["rows_updated"] == 11
        raw2 = t2._raw_manifest(t2.current_version())
        carried = _segs(t2, v1) & {
            x["path"] for x in raw2["file_segments"]
        }
        assert len(carried) >= n_segs - 2
        got = {
            (row["k"], row["v"])
            for row in t2.read_range(spark, "k", 100, 110).collect()
        }
        assert got == {(k, k * 2 + 7) for k in range(100, 111)}

    def test_carried_base_validations(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        man = t.manifest(t.current_version())
        with pytest.raises(ValueError, match="not both"):
            t.commit_with_manifest(
                spark.range(1).selectExpr("id as k", "id as v"),
                "k",
                carried=man["files"],
                carried_base_version=t.current_version(),
                expected_base_version=t.current_version(),
            )
        with pytest.raises(ValueError, match="expected_base_version"):
            t.commit_with_manifest(
                spark.range(1).selectExpr("id as k", "id as v"),
                "k",
                carried_base_version=t.current_version(),
            )

    def test_pruned_merge_o_touched_cow_and_mor(
        self, spark, tmp_path, monkeypatch
    ):
        """The pruned MERGE on a segmented table: touched-test runs on
        segment envelopes first, the commit carries the base by
        reference, and far segments are neither loaded nor rewritten
        — both write modes."""
        loads: list[str] = []
        orig = VersionedParquetTable._load_segment

        def counting(self, rel):
            loads.append(rel)
            return orig(self, rel)

        monkeypatch.setattr(
            VersionedParquetTable, "_load_segment", counting
        )
        for mode in ("cow", "mor"):
            root = str(tmp_path / f"t_{mode}")
            t = _mk(spark, root, n=400, parts=16)
            v1 = t.current_version()
            n_segs = len(_segs(t, v1))
            batch = spark.range(40, 60).selectExpr(
                "id as k", "id * 11 as v"
            )
            loads.clear()
            stats = merge_upsert_write_pruned(
                root, batch, "k",
                write_mode=mode, vacuum_keep_last=None,
            )
            assert stats["write_mode"] == mode, stats
            assert stats["files_total"] == 16
            assert stats["files_touched"] < 4
            # the WHOLE merge (prune + scan + commit) loaded a strict
            # subset of segments — envelopes kept the far ones cold
            assert 0 < len(set(loads)) < n_segs, loads
            t2 = VersionedParquetTable(root)
            raw2 = t2._raw_manifest(t2.current_version())
            carried = _segs(t, v1) & {
                x["path"] for x in raw2["file_segments"]
            }
            assert len(carried) >= n_segs - 2
            got = {
                (r["k"], r["v"])
                for r in t2.read_range(spark, "k", 40, 59).collect()
            }
            assert got == {(k, k * 11) for k in range(40, 60)}
            assert t2.read(spark).count() == 400

    def test_pruned_merge_o_touched_range_join_tier(
        self, spark, tmp_path, monkeypatch
    ):
        """The >max_exact_keys tier (keys never collected; two-pass
        envelope range join) keeps the SAME O(touched) segment-load
        guarantee as the exact tier: the whole merge — envelope
        range-join, candidate materialization, scan, carried-by-base
        commit — loads a strict subset of the base's segments, with
        the far ones never read.  Pins the r10 two-pass fix
        (merge.py seg_fast range-join) with a cold-instance load
        count, mirroring the exact-tier test above."""
        loads: list[str] = []
        orig = VersionedParquetTable._load_segment

        def counting(self, rel):
            loads.append(rel)
            return orig(self, rel)

        monkeypatch.setattr(
            VersionedParquetTable, "_load_segment", counting
        )
        root = str(tmp_path / "t_rj")
        t = _mk(spark, root, n=400, parts=16)
        v1 = t.current_version()
        n_segs = len(_segs(t, v1))
        batch = spark.range(40, 60).selectExpr("id as k", "id * 11 as v")
        loads.clear()
        # force the range-join tier: 20 distinct keys > cap of 8
        stats = merge_upsert_write_pruned(
            root, batch, "k",
            max_exact_keys=8, vacuum_keep_last=None,
        )
        assert stats["pruning"] == "range-join", stats
        assert stats["files_total"] == 16
        assert stats["files_touched"] < 4
        assert stats["rows_source"] == 20  # true distinct count
        assert 0 < len(set(loads)) < n_segs, sorted(set(loads))
        t2 = VersionedParquetTable(root)
        raw2 = t2._raw_manifest(t2.current_version())
        carried = _segs(t, v1) & {
            x["path"] for x in raw2["file_segments"]
        }
        assert len(carried) >= n_segs - 2
        got = {
            (r["k"], r["v"])
            for r in t2.read_range(spark, "k", 40, 59).collect()
        }
        assert got == {(k, k * 11) for k in range(40, 60)}
        assert t2.read(spark).count() == 400

    def test_dml_on_inline_table_unchanged(self, spark, tmp_path):
        """The carried-base form on an INLINE manifest (small table)
        takes the delegation path and stays row-identical."""
        a = _mk(spark, str(tmp_path / "i"), segmented=False)
        b = _mk(spark, str(tmp_path / "s"))
        for t in (a, b):
            t.delete_where(spark, "k % 9 = 2")
            t.update_where(spark, "k < 30", {"v": "v - 1"})
        assert _rows(spark, a) == _rows(spark, b)


class TestCdfOChanged:
    def test_changes_between_loads_only_changed_segments(
        self, spark, tmp_path
    ):
        """The CDF diff skips segments shared by ref between the two
        versions — on a one-file DML commit it materializes the dirty
        segment(s) only."""
        root = str(tmp_path / "t")
        t = _mk(spark, root, n=400, parts=16)
        n_segs = len(_segs(t))
        t.delete_where(spark, "k < 10")
        t2 = VersionedParquetTable(root)  # cold cache
        feed = t2.changes_between(spark, 1, 2)
        rows = feed.collect()
        assert len(rows) == 10
        assert all(r["_change_type"] == "delete" for r in rows)
        assert 0 < len(t2._seg_cache) < n_segs
        d = t2.changes_file_diff(1, 2)
        assert d["files_dv_changed"] == 1
        assert d["files_carried"] == 15
        assert d["files_old"] == 0 and d["files_new"] == 0


class TestMaintenanceLifecycle:
    """Maintenance / layout / metadata ops on SEGMENTED tables stay
    row-identical to an inline twin driven through the same ops — the
    storage form must be unobservable through every write shape, not
    just DML."""

    def test_compact_zorder_bloom_on_segmented(self, spark, tmp_path):
        a = _mk(spark, str(tmp_path / "i"), segmented=False)
        b = _mk(spark, str(tmp_path / "s"))
        for t in (a, b):
            t.compact(spark, min_file_bytes=1 << 30)  # all files small
            t.optimize_zorder(spark, ["k", "v"], buckets=4)
            t.add_bloom_index("v")
        assert _rows(spark, a) == _rows(spark, b)
        # the storage form ADAPTS: the full rewrites shrank the file
        # count, so the form follows the entry count against the
        # threshold — either way the content is identical
        raw = b._raw_manifest(b.current_version())
        n_files = (
            raw["files_n"]
            if "file_segments" in raw
            else len(raw["files"])
        )
        assert ("file_segments" in raw) == (n_files > b.manifest_inline_max)
        # bloom-indexed point read works through segments
        assert (
            sorted(r["k"] for r in b.read_eq(spark, "v", 100).collect())
            == sorted(r["k"] for r in a.read_eq(spark, "v", 100).collect())
        )

    def test_maintain_reorg_on_segmented(self, spark, tmp_path):
        b = _mk(spark, str(tmp_path / "s"))
        b.delete_where(spark, "k % 3 = 0")  # DV mass on many files
        m = b.maintain(
            spark, min_file_bytes=1 << 30, max_small_files=2, max_dv_ratio=0.01
        )
        assert m["triggered"], m
        assert b.read(spark).count() == 200 - 67
        # the reorg bin-packed everything into few files, so the form
        # adapts back to inline below the threshold — content intact
        d = b.detail()
        assert d["n_rows"] == 133 and d["dv_rows"] == 0

    def test_rename_widen_on_segmented(self, spark, tmp_path):
        def mk(root, segmented):
            t = VersionedParquetTable(root)
            if segmented:
                t.manifest_inline_max = 4
                t.manifest_segment_rows = 3
            t.commit_with_manifest(
                spark.range(200).selectExpr(
                    "id as k", "cast(id * 2 as int) as v"
                ),
                "k",
                cluster_partitions=8,
            )
            return t

        a = mk(str(tmp_path / "i"), False)
        b = mk(str(tmp_path / "s"), True)
        for t in (a, b):
            t.rename_column("v", "val")
            t.widen_column("val", "bigint")
            t.update_where(spark, "k < 5", {"val": "val + 1"})
        ra = sorted(
            map(tuple, a.read(spark).select("k", "val").collect())
        )
        rb = sorted(
            map(tuple, b.read(spark).select("k", "val").collect())
        )
        assert ra == rb
        # rename/widen are metadata-only on BOTH forms: zero new
        # segments for the segmented table's two ALTER commits
        segs_v1 = _segs(b, 1)
        assert _segs(b, 2) == segs_v1 and _segs(b, 3) == segs_v1


class TestFromBaseEquivalence:
    """Generative white-box property: for ANY exclude/replace edit
    set, `_persist_manifest_from_base` (the O(touched) segment-wise
    writer) must produce a manifest that MATERIALIZES identically to
    the standard writer given the explicitly-built full list.  This is
    the storage-equivalence contract every carried-by-base DML/merge
    commit rests on."""

    def test_random_edit_sets_match_standard_writer(
        self, spark, tmp_path
    ):
        import random
        import shutil

        from hypothesis import given, settings
        from hypothesis import strategies as st

        root = str(tmp_path / "t")
        t = _mk(spark, root, n=400, parts=16)
        base_v = t.current_version()
        base_files = t.manifest(base_v)["files"]
        paths = [e["path"] for e in base_files]
        meta = {
            k: v
            for k, v in t.manifest(base_v).items()
            if k not in ("files",)
        }
        scratch = str(tmp_path / "scratch")

        @settings(max_examples=25, deadline=None)
        @given(st.randoms(use_true_random=False))
        def prop(rng):
            k_ex = rng.randrange(0, 6)
            k_rep = rng.randrange(0, 6)
            picked = rng.sample(paths, min(len(paths), k_ex + k_rep))
            ex_paths, rep_paths = picked[:k_ex], picked[k_ex:]
            by_path = {e["path"]: e for e in base_files}
            exclude = {p: by_path[p] for p in ex_paths}
            replaced = {
                p: {
                    **by_path[p],
                    "dv": {"path": "v00000001/dv-fake.parquet", "rows": 1},
                }
                for p in rep_paths
            }
            new_entries = [
                {
                    "path": f"v{base_v:08d}/fake-new-{i}.parquet",
                    "n_rows": 5,
                    "bytes": 100,
                    "min": 1000 + i,
                    "max": 1001 + i,
                }
                for i in range(rng.randrange(0, 3))
            ]
            expected_files = [
                replaced.get(e["path"], e)
                for e in base_files
                if e["path"] not in exclude
            ] + new_entries

            for form in ("a", "b"):
                shutil.rmtree(
                    os.path.join(scratch, form), ignore_errors=True
                )
                os.makedirs(os.path.join(scratch, form))
            # O(touched) writer
            t._persist_manifest_from_base(
                os.path.join(scratch, "a"),
                dict(meta),
                base_v,
                exclude=exclude,
                replaced=replaced,
                new_entries=new_entries,
            )
            # standard writer over the explicit list
            t._persist_manifest(
                os.path.join(scratch, "b"),
                {**meta, "files": expected_files},
                base_version=base_v,
            )

            def materialize(d):
                with open(os.path.join(d, "_MANIFEST.json")) as f:
                    raw = json.load(f)
                if "file_segments" not in raw:
                    return raw["files"]
                out = []
                for ref in raw["file_segments"]:
                    # refs are root-relative; new scratch segments
                    # resolve via the ".." components relpath produced
                    p = os.path.join(t.root, ref["path"])
                    import pyarrow.parquet as pq

                    tbl = pq.read_table(p)
                    out.extend(
                        json.loads(j)
                        for j in tbl.column("entry").to_pylist()
                    )
                return out

            key = lambda e: e["path"]
            got = sorted(materialize(os.path.join(scratch, "a")), key=key)
            want = sorted(
                materialize(os.path.join(scratch, "b")), key=key
            )
            assert got == want

        prop()


class TestModelSequence:
    def test_seeded_op_sequence_tracks_inline_twin(self, spark, tmp_path):
        """Randomized (seeded) interleaving of append / delete /
        update / merge / metadata ops, mirrored on an inline twin —
        the storage form must be unobservable at every step."""
        import random

        rng = random.Random(17)
        a = _mk(spark, str(tmp_path / "i"), segmented=False)
        b = _mk(spark, str(tmp_path / "s"))
        for step in range(8):
            op = rng.choice(["delete", "update", "merge", "meta"])
            lo = rng.randrange(0, 180)
            hi = lo + rng.randrange(5, 40)
            for t in (a, b):
                if op == "delete":
                    t.delete_where(spark, f"k between {lo} and {hi}")
                elif op == "update":
                    t.update_where(
                        spark, f"k between {lo} and {hi}", {"v": "v + 100"}
                    )
                elif op == "merge":
                    merge_upsert_write_pruned(
                        t.root,
                        spark.range(lo, hi).selectExpr(
                            "id as k", f"id * {step + 3} as v"
                        ),
                        "k",
                    )
                else:
                    t.add_constraint(spark, f"c{step}", "k >= 0")
            assert _rows(spark, a) == _rows(spark, b), f"step {step} ({op})"
