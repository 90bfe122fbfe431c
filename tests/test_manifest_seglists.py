"""LEVEL-2 manifest list (segment-of-segments, sources/versioned.py
``_store_seg_refs`` / ``_seg_refs`` / ``_write_seg_lists``).

One segment level keeps per-commit metadata O(touched) to ~10⁷ files;
past that the REF LIST itself becomes the per-commit rewrite (a ~10⁸-
file table's 24k refs ≈ multi-MB doc).  The second level chunks refs
into immutable ``_msegl-*.json`` files with envelope rollups; unchanged
chunks carry by reference exactly like level-1 segments.  Thresholds
are scaled down here (the production default engages past ~16.7M
files) — same trick the level-1 suite uses for manifest_inline_max."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators.merge import (
    merge_upsert_write_pruned,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
)


def _mk(spark, root, n=800, parts=16, two_level=True):
    t = VersionedParquetTable(root)
    t.manifest_inline_max = 8
    t.manifest_segment_rows = 4
    if two_level:
        t.manifest_seglist_inline_max = 2
        t.manifest_seglist_chunk_refs = 2
    t.commit_with_manifest(
        spark.range(n).selectExpr("id as k", "id * 2 as v"),
        "k",
        cluster_partitions=parts,
    )
    return t


def _tune(t, two_level=True):
    t.manifest_inline_max = 8
    t.manifest_segment_rows = 4
    if two_level:
        t.manifest_seglist_inline_max = 2
        t.manifest_seglist_chunk_refs = 2
    return t


def _rows(spark, t, version=None):
    df = t.read(spark) if version is None else t.read_version(spark, version)
    return sorted(map(tuple, df.select("k", "v").collect()))


class TestTwoLevelForm:
    def test_doc_shape_and_inline_twin_parity(self, spark, tmp_path):
        """The same data under the one-level and two-level forms
        materializes identical manifests and identical rows."""
        r1, r2 = str(tmp_path / "l1"), str(tmp_path / "l2")
        t1 = _mk(spark, r1, two_level=False)
        t2 = _mk(spark, r2, two_level=True)
        raw1 = t1._raw_manifest(1)
        raw2 = t2._raw_manifest(1)
        assert "file_segments" in raw1 and "seg_ref_lists" not in raw1
        assert "seg_ref_lists" in raw2 and "file_segments" not in raw2
        assert len(raw2["seg_ref_lists"]) >= 2
        # refs resolve identically (paths differ, stats/envelopes the
        # same count and coverage)
        refs1 = t1._seg_refs(raw1)
        refs2 = t2._seg_refs(raw2)
        assert len(refs1) == len(refs2)
        assert sum(r["n"] for r in refs1) == sum(r["n"] for r in refs2)
        m1, m2 = t1.manifest(1), t2.manifest(1)
        assert len(m1["files"]) == len(m2["files"]) == 16
        assert _rows(spark, t1) == _rows(spark, t2)
        # chunk rollups carry the aggregate sums (detail() stays
        # O(chunks) on the two-level form)
        d = t2.detail()
        assert d["n_files"] == 16 and d["n_rows"] == 800

    def test_chunk_carry_forward(self, spark, tmp_path):
        """A small append rewrites only the chunks holding changed
        segments; every other chunk carries by reference (same
        immutable file path in both versions)."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        lrefs_v1 = {
            l["path"] for l in t._raw_manifest(1)["seg_ref_lists"]
        }
        man = t.manifest(1)
        t.commit_with_manifest(
            spark.createDataFrame([(10_000, 1)], "k long, v long"),
            "k",
            carried=man["files"],
            expected_base_version=1,
            cluster_partitions=1,
        )
        lrefs_v2 = {
            l["path"] for l in t._raw_manifest(2)["seg_ref_lists"]
        }
        carried = lrefs_v1 & lrefs_v2
        assert carried, "no chunk carried by reference"
        # the carried chunks live in v1's dir; only the new/changed
        # chunks were written into v2's dir
        new_in_v2 = {p for p in lrefs_v2 if p.startswith("v00000002")}
        assert new_in_v2 and len(new_in_v2) < len(lrefs_v2)

    def test_dml_from_base_loads_touched_chunks_only(
        self, spark, tmp_path
    ):
        """A narrow DELETE on a two-level table loads only the chunks
        (and segments) whose envelopes cover the touched keys — the
        O(touched) guarantee one level up."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t2 = _tune(VersionedParquetTable(root))  # cold caches
        r = t2.delete_where(spark, "k >= 10 and k < 14")
        assert r["rows_deleted"] == 4
        # 800 rows / 16 files → 4-ref chunks cover ~200 keys each; a
        # 4-key delete touches 1 chunk (2 conservatively) and a couple
        # of segments — never all 8 chunks / 16 segments
        assert len(t2._seglist_cache) <= 3
        assert len(t2._seg_cache) <= 4
        got = dict(_rows(spark, t2))
        assert 10 not in got and 14 in got

    def test_pruned_merge_seg_fast_on_two_level(self, spark, tmp_path):
        """The pruned MERGE's segmented fast path engages on the
        two-level form (seg_fast detects seg_ref_lists) and stays
        O(touched)."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        import airflow_embeddings_pipeline_spark.sources.versioned as v

        real_init = VersionedParquetTable.__init__

        def tuned_init(self, *a, **kw):
            real_init(self, *a, **kw)
            _tune(self)

        # the merge constructs its own instances; tune them all
        VersionedParquetTable.__init__ = tuned_init
        try:
            stats = merge_upsert_write_pruned(
                root,
                spark.createDataFrame(
                    [(20, -1), (9_000, -2)], "k long, v long"
                ),
                "k",
                vacuum_keep_last=None,
            )
        finally:
            VersionedParquetTable.__init__ = real_init
        assert stats["files_total"] == 16
        assert stats["files_touched"] <= 2
        got = dict(_rows(spark, t))
        assert got[20] == -1 and got[9_000] == -2
        raw = t._raw_manifest(t.current_version())
        assert "seg_ref_lists" in raw

    def test_point_read_prunes_chunks(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        tr = _tune(VersionedParquetTable(root))
        man = tr._materialize_pruned(
            1,
            lambda e: e.get("min") is None
            or (e["max"] >= 100 and e["min"] <= 120),
        )
        assert len(tr._seglist_cache) <= 2
        assert 1 <= len(man["files"]) <= 4
        got = tr.read_range(spark, "k", 100, 120)
        assert got.count() == 21

    def test_cdf_across_two_level_commits(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.delete_where(spark, "k = 5")
        ch = t.changes_between(spark, 1, 2)
        rows = ch.collect()
        assert len(rows) == 1 and rows[0]["_change_type"] == "delete"
        # chunk-level shared skip: the diff loaded only non-shared
        # chunks
        td = _tune(VersionedParquetTable(root))
        td._diff_file_maps(1, 2)
        assert len(td._seglist_cache) <= 4

    def test_vacuum_keeps_referenced_chunks(self, spark, tmp_path):
        """Partial GC: a dead version whose chunks/segments are carried
        by live manifests keeps exactly those files."""
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        man = t.manifest(1)
        t.commit_with_manifest(
            spark.createDataFrame([(10_000, 1)], "k long, v long"),
            "k",
            carried=man["files"],
            expected_base_version=1,
            cluster_partitions=1,
        )
        t.vacuum(keep_last=1)
        # v1's dir survives partially: carried data files + carried
        # chunks + carried segments
        assert t.read(spark).count() == 801
        raw2 = t._raw_manifest(2)
        for lref in raw2["seg_ref_lists"]:
            assert os.path.exists(os.path.join(root, lref["path"]))
        for ref in t._seg_refs(raw2):
            assert os.path.exists(os.path.join(root, ref["path"]))

    def test_restore_and_time_travel(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        before = _rows(spark, t)
        t.delete_where(spark, "k < 100")
        assert t.read(spark).count() == 700
        assert _rows(spark, t, version=1) == before
        t.restore(spark, 1)
        assert _rows(spark, t) == before
