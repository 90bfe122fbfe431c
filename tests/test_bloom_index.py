"""Bloom-filter file skipping (Delta bloomFilter column-index analog).

Range stats prune equality lookups only when values correlate with the
clustering layout; per-file BLOOM sidecars prune them regardless —
point lookups (``read_eq``) and pruned MERGEs on uncorrelated keys
skip every file whose bloom proves absence.  False positives cost a
file read; false negatives are impossible (pruning stays
conservative).  These tests pin correctness, the pruning wins, the
lifecycle (inheritance / vacuum / clone / compact / rename), and the
DV interplay.
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
    _bloom_build,
    _bloom_might_contain,
)


def _mk(spark, root, n=20_000, parts=8):
    """Table clustered on k with u = shuffled permutation (equality on
    u gets nothing from range stats) and sparse k (every 7th int)."""
    t = VersionedParquetTable(root)
    t.commit_with_manifest(
        spark.range(n).selectExpr(
            "id * 7 as k",
            f"(id * 48271) % {n} as u",
            "concat('x', id) as s",
        ),
        "k",
        cluster_partitions=parts,
    )
    return t


class TestBloomCore:
    def test_build_probe_roundtrip_ints(self):
        import numpy as np

        vals = np.arange(0, 10_000, 3, dtype=np.int64)
        b = _bloom_build(vals)
        assert bool(np.all(_bloom_might_contain(b, vals)))  # no false neg
        absent = np.arange(1, 10_000, 3, dtype=np.int64)
        fp = float(np.mean(_bloom_might_contain(b, absent)))
        assert fp < 0.05  # ~1% design point

    def test_build_probe_strings_and_scalar_kinds(self):
        import numpy as np

        vals = np.array([f"doc-{i}" for i in range(5_000)], dtype=object)
        b = _bloom_build(vals)
        assert bool(np.all(_bloom_might_contain(b, vals[:100])))
        absent = np.array([f"doc-{i}" for i in range(5_000, 6_000)], dtype=object)
        assert float(np.mean(_bloom_might_contain(b, absent))) < 0.05
        # probe canonicalizes python scalars to the stored kind
        bi = _bloom_build(np.arange(100, dtype=np.int64))
        assert bool(_bloom_might_contain(bi, [50])[0])

    def test_point_lookup_prunes_and_answers(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        v = t.add_bloom_index("u")
        man = t.manifest(v)
        assert man["bloom_columns"] == ["u"]
        assert all(
            "u" in e["bloom"]["cols"] for e in man["files"]
        )
        val = (777 * 48271) % 20_000
        kept = t._eq_prune(man, "u", [val])
        assert len(kept) <= 2  # 8 files, one holds it (+ rare fp)
        got = t.read_eq(spark, "u", val).collect()
        assert [r["k"] for r in got] == [777 * 7]
        # absent value: definitely-absent files all pruned
        assert t.read_eq(spark, "u", 10**9).count() == 0
        assert len(t._eq_prune(man, "u", [10**9])) <= 1

    def test_merge_absent_keys_touch_zero_files(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.add_bloom_index("k")
        src = spark.range(10).selectExpr(
            "id * 14000 + 4 as k", "0 as u", "'ins' as s"
        )  # in-range but absent (k is every 7th int)
        r = merge_upsert_write_pruned(root, src, "k", vacuum_keep_last=None)
        # ~pure append: range stats alone touch ~10 files (one per
        # scattered key); blooms prove absence for all but the ~1%
        # false-positive tail (10 keys × 8 files ⇒ E[fp] < 1 — allow 2)
        assert r["files_touched"] <= 2
        assert t.read(spark).count() == 20_010
        # true updates still touch their files and apply
        src2 = spark.range(5).selectExpr(
            "id * 14000 as k", "1 as u", "'upd' as s"
        )
        r2 = merge_upsert_write_pruned(
            root, src2, "k", update_columns=["s"], vacuum_keep_last=None
        )
        assert 0 < r2["files_touched"] <= 7
        assert t.read(spark).filter("s = 'upd'").count() == 5

    def test_inheritance_new_commit_files_get_blooms(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.add_bloom_index("u")
        src = spark.range(5).selectExpr(
            "id * 7 as k", "1000000 + id as u", "'upd' as s"
        )
        merge_upsert_write_pruned(root, src, "k", vacuum_keep_last=None)
        man = t.manifest(t.current_version())
        assert man.get("bloom_columns") == ["u"]
        new = [
            e
            for e in man["files"]
            if e["path"].startswith(f"v{t.current_version():08d}")
        ]
        assert new and all("u" in e["bloom"]["cols"] for e in new)
        # the merged-in value is findable through the new file's bloom
        assert t.read_eq(spark, "u", 1000002).count() == 1


class TestBloomLifecycle:
    def test_vacuum_keeps_referenced_bloom_sidecars(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.add_bloom_index("u")
        t.vacuum(keep_last=1)
        assert glob.glob(os.path.join(root, "v*", "bloom-*.parquet"))
        assert t.read_eq(spark, "u", (5 * 48271) % 20_000).count() == 1

    def test_clone_rewrites_bloom_sidecar(self, spark, tmp_path):
        root, dest = str(tmp_path / "t"), str(tmp_path / "c")
        t = _mk(spark, root)
        t.add_bloom_index("u")
        t.clone_to(dest)
        tc = VersionedParquetTable(dest)
        man = tc.manifest(1)
        assert man.get("bloom_columns") == ["u"]
        val = (99 * 48271) % 20_000
        assert len(tc._eq_prune(man, "u", [val])) <= 2
        assert tc.read_eq(spark, "u", val).count() == 1

    def test_compact_rebuilds_blooms_for_new_files(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.add_bloom_index("u")
        stats = t.compact(spark, min_file_bytes=1 << 30)
        man = t.manifest(stats["version"])
        assert all(
            "u" in (e.get("bloom") or {}).get("cols", [])
            for e in man["files"]
        )
        val = (123 * 48271) % 20_000
        assert t.read_eq(spark, "u", val).count() == 1
        assert len(t._eq_prune(man, "u", [val])) <= 2

    def test_rename_keeps_bloom_by_physical_identity(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.add_bloom_index("u")
        t.rename_column("u", "user_hash")
        man = t.manifest(t.current_version())
        val = (42 * 48271) % 20_000
        assert len(t._eq_prune(man, "user_hash", [val])) <= 2
        got = t.read_eq(spark, "user_hash", val).collect()
        assert [r["k"] for r in got] == [42 * 7]

    def test_dv_interplay_conservative(self, spark, tmp_path):
        # deleted rows may still bloom-hit (false positive direction):
        # the exact filter wins, results stay right
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        t.add_bloom_index("u")
        val = (10 * 48271) % 20_000
        t.delete_where(spark, f"u = {val}")
        assert t.read_eq(spark, "u", val).count() == 0

    def test_missing_column_files_skip_gracefully(self, spark, tmp_path):
        # schema evolution: files written before the column have no
        # bloom for it and are never wrongly pruned
        root = str(tmp_path / "t")
        t = _mk(spark, root)
        src = spark.range(3).selectExpr(
            "id * 7 as k",
            "id as u",
            "'e' as s",
            "id * 10 as extra",
        )
        merge_upsert_write_pruned(
            root, src, "k", schema_evolution=True, vacuum_keep_last=None
        )
        t.add_bloom_index("extra")  # old files lack the column
        man = t.manifest(t.current_version())
        old = [
            e
            for e in man["files"]
            if "extra" not in (e.get("bloom") or {}).get("cols", [])
        ]
        assert old  # the pre-evolution files carry no 'extra' bloom
        got = t.read_eq(spark, "extra", 20).collect()
        assert len(got) == 1 and got[0]["k"] == 14
