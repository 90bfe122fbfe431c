"""Temporal (timestamp/date) file statistics — skipping on time.

Before this layer, ``_stat_value`` dropped every non-(int, float, str)
footer stat, so a timestamp or date column — the DOMINANT predicate
dimension of an events table at 100 TB — got ZERO file skipping from
``read_range``/``read_eq`` and zero pruning from the file-pruned MERGE.
Temporal stats now canonicalize to epoch-microsecond ints in the
manifest (the bloom layer's vetted representation); probe values
canonicalize through ``_stat_canon`` (PySpark-collect semantics), and
stats flowing back INTO Spark (the range-join frame, band-split
literals) restore typed values via ``_stat_restore``.  Requires
TIMESTAMP_MICROS output (session.py) — INT96 pages carry no footer
min/max at all.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators.merge import (
    merge_upsert_write_pruned,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
    _stat_canon,
    _stat_restore,
    _stat_value,
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _mk_ts_table(spark, root, n=100_000, parts=16):
    """Table keyed on an event timestamp: id i → T0 + i minutes."""
    t = VersionedParquetTable(root)
    df = spark.range(n).select(
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("ts"),
        F.col("id").alias("k"),
        F.to_date(
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("d"),
    )
    t.commit_with_manifest(
        df, "ts", cluster_partitions=parts, stats_columns=["ts", "d"]
    )
    return t


class TestStatHelpers:
    def test_stat_value_temporal_roundtrip(self):
        from pyspark.sql.types import DateType, TimestampType

        dt = datetime.datetime(2024, 6, 1, 12, 30, 15, 123456)
        us = _stat_value(dt.replace(tzinfo=datetime.timezone.utc))
        assert isinstance(us, int)
        # probe side (UTC host): same instant → same epoch-us
        assert _stat_canon(dt) == us
        # restore side: AWARE UTC (DST-fold-free; Spark's toInternal
        # converts aware values through utctimetuple exactly) — the
        # same instant, and _stat_value inverts it
        restored = _stat_restore(us, TimestampType())
        assert restored.tzinfo is datetime.timezone.utc
        assert restored == dt.replace(tzinfo=datetime.timezone.utc)
        assert _stat_value(restored) == us
        d = datetime.date(2024, 6, 1)
        dus = _stat_value(d)
        assert isinstance(dus, int)
        assert _stat_canon(d) == dus
        assert _stat_restore(dus, DateType()) == d

    def test_stat_value_order_preserved(self):
        vals = [
            datetime.datetime(2023, 12, 31, 23, 59, 59, 999999),
            datetime.datetime(2024, 1, 1),
            datetime.datetime(2024, 1, 1, 0, 0, 0, 1),
        ]
        canon = [
            _stat_value(v.replace(tzinfo=datetime.timezone.utc))
            for v in vals
        ]
        assert canon == sorted(canon) and len(set(canon)) == 3

    def test_non_temporal_passthrough(self):
        from pyspark.sql.types import LongType, StringType

        assert _stat_value(42) == 42 and _stat_canon(42) == 42
        assert _stat_restore(42, LongType()) == 42
        assert _stat_restore("x", StringType()) == "x"
        assert _stat_value(True) is None  # bool still rejected


class TestTimestampSkipping:
    def test_manifest_records_epoch_us_ints(self, spark, tmp_path):
        t = _mk_ts_table(spark, str(tmp_path / "t"), n=20_000, parts=4)
        man = t.manifest(t.current_version())
        assert all(isinstance(e["min"], int) for e in man["files"])
        ds = [(e.get("stats") or {}).get("d") for e in man["files"]]
        assert all(s and isinstance(s[0], int) for s in ds)

    def test_read_range_prunes_and_is_exact(self, spark, tmp_path):
        t = _mk_ts_table(spark, str(tmp_path / "t"))
        lo = T0 + datetime.timedelta(minutes=10_000)
        hi = T0 + datetime.timedelta(minutes=12_000)
        man = t.manifest(t.current_version())
        from airflow_embeddings_pipeline_spark.sources.versioned import (
            _stat_canon as canon,
        )
        kept = [
            e
            for e in man["files"]
            if e["min"] is None
            or (e["max"] >= canon(lo) and e["min"] <= canon(hi))
        ]
        assert len(kept) < len(man["files"])  # the skip actually happens
        got = t.read_range(spark, "ts", lo, hi)
        exp = t.read(spark).filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
        assert got.orderBy("k").collect() == exp.orderBy("k").collect()
        assert got.count() == 2001

    def test_read_range_on_date_stats_column(self, spark, tmp_path):
        t = _mk_ts_table(spark, str(tmp_path / "t"))
        lo, hi = datetime.date(2024, 1, 10), datetime.date(2024, 1, 12)
        got = t.read_range(spark, "d", lo, hi)
        exp = t.read(spark).filter((F.col("d") >= lo) & (F.col("d") <= hi))
        assert got.count() == exp.count() > 0

    def test_read_eq_timestamp_point_lookup(self, spark, tmp_path):
        t = _mk_ts_table(spark, str(tmp_path / "t"), n=20_000, parts=8)
        probe = T0 + datetime.timedelta(minutes=777)
        rows = t.read_eq(spark, "ts", probe).collect()
        assert [r["k"] for r in rows] == [777]
        # pruning: the probe lies in exactly one file's range
        man = t.manifest(t.current_version())
        from airflow_embeddings_pipeline_spark.sources.versioned import (
            _stat_canon as canon,
        )
        hits = [
            e
            for e in man["files"]
            if e["min"] is not None
            and e["min"] <= canon(probe) <= e["max"]
        ]
        assert len(hits) == 1

    def test_absent_range_reads_zero_files(self, spark, tmp_path):
        t = _mk_ts_table(spark, str(tmp_path / "t"), n=20_000, parts=4)
        lo = T0 + datetime.timedelta(days=400)
        hi = T0 + datetime.timedelta(days=401)
        assert t.read_range(spark, "ts", lo, hi).count() == 0


class TestTimestampMergePruning:
    def _src(self, spark, lo_min, n):
        return spark.range(n).select(
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(
                    mins=(F.col("id") + lo_min).cast("int")
                )
            ).alias("ts"),
            (F.col("id") + 1_000_000).alias("k"),
            F.to_date(
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(
                    mins=(F.col("id") + lo_min).cast("int")
                )
            ).alias("d"),
        )

    @pytest.mark.parametrize("max_exact", [200_000, 0], ids=["exact", "range-join"])
    def test_pruned_merge_on_ts_key_touches_a_band(
        self, spark, tmp_path, max_exact
    ):
        root = str(tmp_path / f"t{max_exact}")
        t = _mk_ts_table(spark, root, n=60_000, parts=12)
        src = self._src(spark, 20_000, 500)  # narrow mid-range band
        stats = merge_upsert_write_pruned(
            root, src, "ts", max_exact_keys=max_exact
        )
        assert stats["files_touched"] < stats["files_total"]
        assert stats["files_touched"] >= 1
        # updates replaced k in the touched band; count is unchanged
        after = t.read(spark)
        assert after.count() == 60_000
        updated = after.filter(F.col("k") >= 1_000_000).count()
        assert updated == 500

    def test_merge_inserts_beyond_range_append_only(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = _mk_ts_table(spark, root, n=20_000, parts=4)
        src = self._src(spark, 100_000, 300)  # strictly after every file
        stats = merge_upsert_write_pruned(root, src, "ts")
        assert stats["files_touched"] == 0  # pure append, nothing read
        assert t.read(spark).count() == 20_300
        # the appended band got its own file(s) with valid int stats
        man = t.manifest(t.current_version())
        assert all(isinstance(e["min"], int) for e in man["files"])
