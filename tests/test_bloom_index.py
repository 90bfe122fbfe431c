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

    def test_build_probe_roundtrip_temporals(self):
        """Build side = pyarrow column as numpy datetime64 (ns for
        timestamps, D for dates), probe side = python datetime/date —
        the exact pair that diverged under str() canonicalization
        (datetime64[ns].tolist() yields epoch-ns INTEGERS)."""
        import datetime as dt

        import numpy as np
        import pandas as pd

        base = dt.datetime(2020, 1, 1, 5, 0, 0)
        pys = [base + dt.timedelta(seconds=37 * i) for i in range(2_000)]
        built = np.array(pys, dtype="datetime64[ns]")  # pyarrow view
        b = _bloom_build(built)
        assert b["kind"] == "t"
        # python datetime probes (collected Spark rows / read_eq args)
        assert bool(np.all(_bloom_might_contain(b, pys[:200])))
        # pd.Timestamp and datetime64 probes hash identically too
        assert bool(_bloom_might_contain(b, [pd.Timestamp(pys[3])])[0])
        assert bool(
            _bloom_might_contain(b, np.array(pys[:5], "datetime64[ns]"))[0]
        )
        absent = [base + dt.timedelta(seconds=37 * i + 11) for i in range(500)]
        assert float(np.mean(_bloom_might_contain(b, absent))) < 0.05

        days = [dt.date(2020, 1, 1) + dt.timedelta(days=i) for i in range(800)]
        bd = _bloom_build(np.array(days, dtype="datetime64[D]"))
        assert bd["kind"] == "t"
        assert bool(np.all(_bloom_might_contain(bd, days[:100])))
        far = [dt.date(2031, 1, 1) + dt.timedelta(days=i) for i in range(200)]
        assert float(np.mean(_bloom_might_contain(bd, far))) < 0.05

    def test_legacy_string_bloom_temporal_probe_is_conservative(self):
        """A pre-fix sidecar (kind 's' built over stringified epoch-ns
        ints) must never report a temporal probe absent — the guard
        returns all-maybe instead of trusting a divergent hash."""
        import datetime as dt

        import numpy as np

        legacy = _bloom_build(
            np.array(["1577881815000000000"], dtype=object)
        )
        assert legacy["kind"] == "s"
        probe = [dt.datetime(2020, 1, 1, 12, 30, 15)]
        assert bool(_bloom_might_contain(legacy, probe)[0])
        assert bool(_bloom_might_contain(legacy, [dt.date(2020, 1, 1)])[0])
        # genuinely-string probes still prune through a string bloom
        assert not bool(_bloom_might_contain(legacy, ["nope"])[0])

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

    def test_timestamp_bloom_end_to_end(self, spark, tmp_path):
        """The ADVICE repro: add_bloom_index('ts') then read_eq on a
        PRESENT timestamp must return the row (pre-fix: 0 rows), and a
        pruned merge keyed on the timestamp must UPDATE, not duplicate."""
        import datetime as dt

        root = str(tmp_path / "t")
        t = VersionedParquetTable(root)
        base = dt.datetime(2020, 1, 1, 0, 0, 0)
        df = spark.range(4_000).selectExpr(
            "timestamp'2020-01-01 00:00:00' + make_interval(0,0,0,0,0,0,"
            "id * 61) as ts",
            "id as n",
        )
        t.commit_with_manifest(df, "n", cluster_partitions=8)
        t.add_bloom_index("ts")
        probe = base + dt.timedelta(seconds=61 * 777)
        got = t.read_eq(spark, "ts", probe).collect()
        assert [r["n"] for r in got] == [777]
        man = t.manifest(t.current_version())
        # bloom does the skipping (ts correlates with layout here, so
        # range stats also help — assert the combined prune is tight)
        assert len(t._eq_prune(man, "ts", [probe])) <= 2
        # absent-but-in-range probe: blooms prove absence
        absent = base + dt.timedelta(seconds=61 * 777 + 30)
        assert t.read_eq(spark, "ts", absent).count() == 0
        assert len(t._eq_prune(man, "ts", [absent])) <= 1

        # merge keyed on ts: matched keys must route to their files
        # (pre-fix the bloom refinement proved them "absent" → silent
        # duplicate inserts)
        src = spark.range(5).selectExpr(
            "timestamp'2020-01-01 00:00:00' + make_interval(0,0,0,0,0,0,"
            "id * 61 * 100) as ts",
            "id + 900000 as n",
        )
        merge_upsert_write_pruned(
            root, src, "ts", update_columns=["n"], vacuum_keep_last=None
        )
        assert t.read(spark).count() == 4_000  # updates, NOT inserts
        assert t.read(spark).filter("n >= 900000").count() == 5

    def test_date_bloom_end_to_end(self, spark, tmp_path):
        import datetime as dt

        root = str(tmp_path / "t")
        t = VersionedParquetTable(root)
        df = spark.range(2_000).selectExpr(
            "date_add(date'2020-01-01', cast(id as int)) as d", "id as n"
        )
        t.commit_with_manifest(df, "n", cluster_partitions=4)
        t.add_bloom_index("d")
        got = t.read_eq(spark, "d", dt.date(2020, 1, 1) + dt.timedelta(days=365)).collect()
        assert [r["n"] for r in got] == [365]
        assert t.read_eq(spark, "d", dt.date(2035, 1, 1)).count() == 0

    def test_unbloomable_type_rejected_loud(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = VersionedParquetTable(root)
        df = spark.range(10).selectExpr(
            "id as n",
            "cast(id as decimal(10,2)) as dec",
            "array(id) as arr",
        )
        t.commit_with_manifest(df, "n")
        with pytest.raises(ValueError, match="no bloom canonicalization"):
            t.add_bloom_index("dec")
        with pytest.raises(ValueError, match="no bloom canonicalization"):
            t.add_bloom_index("arr")

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
        base_paths = {
            e["path"] for e in t.manifest(t.current_version())["files"]
        }
        merge_upsert_write_pruned(root, src, "k", vacuum_keep_last=None)
        man = t.manifest(t.current_version())
        assert man.get("bloom_columns") == ["u"]
        # the merge's own output: whatever the base manifest did not
        # hold (prepared commits place new files under _staged/, not
        # the version dir)
        new = [e for e in man["files"] if e["path"] not in base_paths]
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
