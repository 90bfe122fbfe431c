"""Round-10 review fixes, pinned.

1. Sentinel temporal probes (datetime.min/max, far past/future) must
   never crash the pruning path: pandas' ns-epoch range (~1677-2262)
   previously made ``_stat_canon``'s NTZ branch raise OverflowError,
   which the callers' conservative guards (TypeError only) did not
   catch — a ``read_range(hi=datetime.max)`` on an NTZ column crashed
   the query instead of degrading to might-match.
2. The driver's manifest-segment cache evicts LRU bounded by total
   cached ENTRY ROWS instead of a wholesale clear() at 512 segments
   (which repeatedly flushed segments loaded earlier in the SAME
   materialization pass on >512-segment manifests).
3. The seg_fast range-join merge tier (>max_exact_keys batches) no
   longer materializes the FULL file list on the driver: segment
   envelopes range-join first, and only candidate segments load —
   the O(touched) commit guarantee now holds for large batches too.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators.merge import (
    merge_upsert_write_pruned,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
    _stat_canon,
    _to_epoch_us,
)


class TestSentinelTemporalProbes:
    def test_stat_canon_outside_pandas_ns_range(self):
        from pyspark.sql.types import TimestampNTZType, TimestampType

        ntz = TimestampNTZType()
        # sentinel + far-past/future wall probes all convert to ints,
        # order preserved (no pandas, no OverflowError)
        vals = [
            dt.datetime.min,
            dt.datetime(1500, 6, 1, 12, 30),
            dt.datetime(2024, 1, 1),
            dt.datetime(3000, 1, 1),
            dt.datetime.max,
        ]
        canon = [_stat_canon(v, ntz) for v in vals]
        assert all(isinstance(c, int) for c in canon)
        assert canon == sorted(canon) and len(set(canon)) == len(canon)
        # instant rule (TimestampType / typeless): must not raise for
        # the same sentinels — either a valid int or the conservative
        # unconverted passthrough (callers' TypeError guard keeps)
        for v in vals:
            r = _stat_canon(v, TimestampType())
            assert isinstance(r, (int, dt.datetime))
        # dates outside pandas' range convert too (instant rule)
        assert isinstance(_to_epoch_us(dt.date(1500, 1, 1)), int)
        assert isinstance(_to_epoch_us(dt.date.max), int)
        # aware datetimes outside the range: UTC wall, pandas-free
        aware = dt.datetime(
            1500, 1, 1, 1, 0, tzinfo=dt.timezone(dt.timedelta(hours=1))
        )
        assert _to_epoch_us(aware) == _stat_canon(
            dt.datetime(1500, 1, 1), ntz
        )

    def test_read_paths_survive_sentinel_bounds(self, spark, tmp_path):
        """read_range / read_eq with datetime.min/max bounds on an NTZ
        key: no crash, exact results (full keep is acceptable — the
        exact filter decides)."""
        t = VersionedParquetTable(str(tmp_path / "t"))
        df = spark.range(2_000).select(
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(mins=F.col("id").cast("int"))
            )
            .cast("timestamp_ntz")
            .alias("ts"),
            F.col("id").alias("k"),
        )
        t.commit_with_manifest(df, "ts", cluster_partitions=4)
        n = t.read_range(
            spark, "ts", lo=dt.datetime.min, hi=dt.datetime.max
        ).count()
        assert n == 2_000
        assert (
            t.read_range(spark, "ts", lo=dt.datetime(3000, 1, 1)).count()
            == 0
        )
        assert t.read_eq(spark, "ts", [dt.datetime.max]).count() == 0
        # the in-range probe still hits exactly
        probe = dt.datetime(2024, 1, 1, 0, 10)
        assert t.read_eq(spark, "ts", [probe]).count() == 1


class TestSegCacheLRU:
    def test_rows_bound_holds_without_wholesale_flush(
        self, spark, tmp_path
    ):
        t = VersionedParquetTable(str(tmp_path / "t"))
        t.manifest_inline_max = 2
        t.manifest_segment_rows = 2
        t.commit_with_manifest(
            spark.range(400).selectExpr("id as k", "id*2 as v"),
            "k",
            cluster_partitions=12,
        )  # 12 files → 6 segments of ≤2 entries
        # cold instance with a bound smaller than the manifest
        t2 = VersionedParquetTable(str(tmp_path / "t"))
        t2._SEG_CACHE_MAX_ROWS = 5  # < 12 entries total
        man = t2.manifest(t2.current_version())
        assert len(man["files"]) == 12  # materialization complete
        assert t2._seg_cache_rows <= 5
        assert t2._seg_cache_rows == sum(
            len(v) for v in t2._seg_cache.values()
        )
        # under a roomy bound, a repeat materialization is pure cache
        # hits: the cached row lists are the SAME objects (no re-read)
        t3 = VersionedParquetTable(str(tmp_path / "t"))
        t3.manifest(t3.current_version())
        before = {k: id(v) for k, v in t3._seg_cache.items()}
        t3.manifest(t3.current_version())
        after = {k: id(v) for k, v in t3._seg_cache.items()}
        assert before == after and len(before) == 6

    def test_lru_evicts_oldest_not_everything(self, spark, tmp_path):
        t = VersionedParquetTable(str(tmp_path / "t"))
        t.manifest_inline_max = 2
        t.manifest_segment_rows = 2
        t.commit_with_manifest(
            spark.range(200).selectExpr("id as k", "id*2 as v"),
            "k",
            cluster_partitions=8,
        )  # 4 segments
        t2 = VersionedParquetTable(str(tmp_path / "t"))
        t2._SEG_CACHE_MAX_ROWS = 4  # room for 2 segments of 2
        refs = [
            r["path"]
            for r in t2._raw_manifest(t2.current_version())["file_segments"]
        ]
        t2._load_segment(refs[0])
        t2._load_segment(refs[1])
        # touch refs[0] → refs[1] becomes LRU
        t2._load_segment(refs[0])
        t2._load_segment(refs[2])  # evicts refs[1] only
        assert refs[0] in t2._seg_cache
        assert refs[1] not in t2._seg_cache
        assert refs[2] in t2._seg_cache


class TestSegFastRangeJoinTwoPass:
    def test_only_candidate_segments_materialize(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "t")
        t = VersionedParquetTable(root)
        t.manifest_inline_max = 4
        t.manifest_segment_rows = 2
        t.commit_with_manifest(
            spark.range(1_600).selectExpr("id as k", "id*2 as v"),
            "k",
            cluster_partitions=16,
        )  # 16 files → 8 segments
        all_segs = {
            r["path"]
            for r in t._raw_manifest(t.current_version())["file_segments"]
        }
        assert len(all_segs) == 8
        source = spark.createDataFrame(
            [(5, 999), (1_590, 999), (10_000, 1)], "k long, v long"
        )
        calls: list[str] = []
        orig = VersionedParquetTable._load_segment

        def spy(self, rel):
            calls.append(rel)
            return orig(self, rel)

        monkeypatch.setattr(VersionedParquetTable, "_load_segment", spy)
        stats = merge_upsert_write_pruned(
            root, source, "k", vacuum_keep_last=None, max_exact_keys=0
        )
        assert stats["pruning"] == "range-join"
        assert stats["rows_source"] == 3
        assert 0 < stats["files_touched"] < stats["files_total"]
        # the O(touched) guarantee: only candidate segments were ever
        # requested — a strict subset of the manifest's segments
        assert set(calls) and set(calls) < all_segs
        # correctness vs the expected upsert
        got = dict(
            t.read(spark).select("k", "v").toPandas().itertuples(
                index=False, name=None
            )
        )
        assert got[5] == 999 and got[1_590] == 999 and got[10_000] == 1
        assert len(got) == 1_601 and got[7] == 14

    def test_range_join_tiers_agree_exact_vs_segmented(
        self, spark, tmp_path
    ):
        """Same merge through exact tier and two-pass range-join tier
        produces identical table content."""
        rows = [(i, i * 2) for i in range(300)]
        src = [(7, -1), (250, -1), (999, -1)]
        out = {}
        for name, cap in (("exact", 200_000), ("rj", 0)):
            root = str(tmp_path / name)
            t = VersionedParquetTable(root)
            t.manifest_inline_max = 4
            t.manifest_segment_rows = 2
            t.commit_with_manifest(
                spark.createDataFrame(rows, "k long, v long"),
                "k",
                cluster_partitions=8,
            )
            merge_upsert_write_pruned(
                root,
                spark.createDataFrame(src, "k long, v long"),
                "k",
                vacuum_keep_last=None,
                max_exact_keys=cap,
            )
            out[name] = sorted(
                map(tuple, t.read(spark).select("k", "v").collect())
            )
        assert out["exact"] == out["rj"]
