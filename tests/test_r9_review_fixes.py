"""Regression pins for the round-9 review findings: temporal
canonicalization type-awareness (instant vs wall), mistyped-probe
TypeError degrade, z-order long-width interleave, key_columns
inheritance, DST-fold-free stat restore, and O(segments)
app_metadata_of."""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
    _stat_canon,
    _stat_restore,
    _stat_value,
)


class TestTemporalCanon:
    def test_ntz_probe_canonicalizes_wall_not_instant(self):
        """Under a non-UTC host timezone, an NTZ probe must convert
        UNSHIFTED (wall micros, matching _stat_value's timegm of the
        not-adjusted-to-UTC footer), while the typeless/instant rule
        localizes system-local.  Shifted NTZ probes silently skipped
        files holding matching rows."""
        from pyspark.sql.types import TimestampNTZType

        old = os.environ.get("TZ")
        os.environ["TZ"] = "America/New_York"
        time.tzset()
        try:
            probe = dt.datetime(2024, 1, 1, 12, 0, 0)
            wall = _stat_canon(probe, TimestampNTZType())
            instant = _stat_canon(probe)
            # wall == what the footer records for the same value
            assert wall == _stat_value(probe)
            # the instant rule shifts by the NY offset (5h in January)
            assert instant - wall == 5 * 3600 * 1_000_000
        finally:
            if old is None:
                os.environ.pop("TZ", None)
            else:
                os.environ["TZ"] = old
            time.tzset()

    def test_restore_is_aware_utc_and_round_trips(self):
        """TimestampType restore returns an AWARE UTC datetime — no
        system-local naive value, hence no DST fall-back fold
        ambiguity — and _stat_value inverts it exactly."""
        from pyspark.sql.types import TimestampType

        # an instant inside the US DST fall-back hour
        v = 1_699_164_000_123_456  # 2023-11-05T06:00:00.123456Z
        restored = _stat_restore(v, TimestampType())
        assert restored.tzinfo is dt.timezone.utc
        assert _stat_value(restored) == v


class TestMistypedProbeDegrade:
    def _ts_table(self, spark, root):
        t = VersionedParquetTable(root)
        df = spark.range(100).select(
            F.to_timestamp(
                F.concat(
                    F.lit("2024-01-"),
                    F.lpad((F.col("id") % 28 + 1).cast("string"), 2, "0"),
                )
            ).alias("ts"),
            F.col("id").alias("v"),
        )
        t.commit_with_manifest(df, "ts", cluster_partitions=4)
        return t

    def test_string_bounds_keep_rows_instead_of_crashing(
        self, spark, tmp_path
    ):
        """String probes against temporal stats must degrade to a
        conservative scan + exact filter (the pre-stats behavior),
        never raise TypeError."""
        t = self._ts_table(spark, str(tmp_path / "t"))
        got = t.read_range(
            spark, "ts", "2024-01-01", "2024-01-03"
        ).count()
        exp = (
            t.read(spark)
            .filter(
                (F.col("ts") >= "2024-01-01")
                & (F.col("ts") <= "2024-01-03")
            )
            .count()
        )
        assert got == exp > 0
        assert (
            t.read_eq(spark, "ts", "2024-01-02 00:00:00").count()
            == t.read(spark).filter(F.col("ts") == "2024-01-02").count()
        )


class TestZorderWidth:
    def test_over_62_bits_fails_loud(self, spark, tmp_path):
        t = VersionedParquetTable(str(tmp_path / "t"))
        df = spark.range(5000).select(
            F.col("id").alias("k"),
            *[
                ((F.col("id") * (i + 3)) % 4999).alias(f"c{i}")
                for i in range(7)
            ],
        )
        t.commit_with_manifest(df, "k", cluster_partitions=4)
        with pytest.raises(ValueError, match="interleaved bits"):
            t.optimize_zorder(
                spark, [f"c{i}" for i in range(7)], buckets=1024
            )

    def test_past_31_bits_still_clusters_correctly(self, spark, tmp_path):
        """4 cols x 256 buckets = 32 interleaved bits — past the int
        wrap boundary that silently scrambled the layout before the
        long cast."""
        t = VersionedParquetTable(str(tmp_path / "t"))
        df = spark.range(4000).select(
            F.col("id").alias("k"),
            *[
                ((F.col("id") * (i + 3)) % 3989).alias(f"c{i}")
                for i in range(4)
            ],
        )
        t.commit_with_manifest(df, "k", cluster_partitions=4)
        before = sorted(
            map(tuple, t.read(spark).select("k", "c0").collect())
        )
        r = t.optimize_zorder(
            spark, [f"c{i}" for i in range(4)], buckets=256
        )
        assert r["z_bits"] >= 32
        after = sorted(
            map(tuple, t.read(spark).select("k", "c0").collect())
        )
        assert before == after


class TestInheritance:
    def test_key_columns_inherits_when_all_other_fields_supplied(
        self, spark, tmp_path
    ):
        t = VersionedParquetTable(str(tmp_path / "t"))
        df = spark.range(50).selectExpr("id as k", "id as s", "id as v")
        t.commit_with_manifest(
            df, "k", cluster_partitions=2, key_columns=["k", "s"]
        )
        man = t.manifest(t.current_version())
        t.commit_with_manifest(
            df.limit(5),
            "k",
            carried=man["files"],
            cluster_partitions=1,
            column_mapping={},
            retired_physical=[],
            constraints={},
            bloom_columns=[],
            clustering={},
        )
        raw = t._raw_manifest(t.current_version())
        assert raw.get("key_columns") == ["k", "s"]


class TestAppMetadataFastPath:
    def test_app_metadata_of_reads_zero_segments(self, spark, tmp_path):
        root = str(tmp_path / "t")
        t = VersionedParquetTable(root)
        t.manifest_inline_max = 4
        t.manifest_segment_rows = 3
        t.commit_with_manifest(
            spark.range(200).selectExpr("id as k", "id as v"),
            "k",
            cluster_partitions=8,
            app_metadata={"wm": 7},
        )
        t2 = VersionedParquetTable(root)
        assert t2.app_metadata_of() == {"wm": 7}
        assert t2._seg_cache == {}
