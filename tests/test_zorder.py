"""OPTIMIZE ZORDER BY — multi-dimensional clustering for data skipping.

Single-key range clustering gives ``read_range``/``read_eq`` file
pruning on the key and NOTHING on any other column; ``optimize_zorder``
rewrites the live table along a Morton curve over k columns so every
file's [min, max] is tight in EVERY z dimension (the Delta/Iceberg
``OPTIMIZE ... ZORDER BY`` analog — equi-depth ``approxQuantile`` cut
points, JVM-side bucket assignment + bit interleave, no UDFs, no
row-scale driver transfer).  These tests pin content parity, the
skip wins on each dimension, lifecycle interplay (maintain's overlap
exemption, DV purge-on-rewrite, column mapping, marker inheritance),
and the loud type/argument vetting.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
    _stat_canon,
)


def _touched(t: VersionedParquetTable, col: str, lo, hi) -> tuple[int, int]:
    """(files a stats-pruned [lo, hi] scan must read, total files) —
    manifest arithmetic identical to read_range's keep rule."""
    lo, hi = _stat_canon(lo), _stat_canon(hi)
    man = t.manifest(t.current_version())
    kept = 0
    for e in man["files"]:
        if man.get("key") == col:
            r = (e["min"], e["max"])
        else:
            s = (e.get("stats") or {}).get(col)
            r = (s[0], s[1]) if s else (None, None)
        if r[0] is None or (r[1] >= lo and r[0] <= hi):
            kept += 1
    return kept, len(man["files"])


def _mk(spark, root, n=120_000, parts=16):
    """k-clustered table; b is a modular-multiplicative shuffle of the
    domain (uncorrelated with k), x a small double."""
    t = VersionedParquetTable(root)
    t.commit_with_manifest(
        spark.range(n).select(
            F.col("id").alias("k"),
            ((F.col("id") * 2654435761) % 100_000).alias("b"),
            (F.col("id") % 97).cast("double").alias("x"),
        ),
        "k",
        cluster_partitions=parts,
        stats_columns=["k", "b"],
    )
    return t


class TestZorderLayout:
    def test_content_parity_and_both_dim_skipping(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        before = t.read(spark).orderBy("k").collect()
        lin_b, total = _touched(t, "b", 40_000, 45_000)
        assert lin_b == total  # uncorrelated column: range stats useless
        lin_k, _ = _touched(t, "k", 10_000, 15_000)
        assert lin_k <= 3  # key prunes hard under linear clustering

        res = t.optimize_zorder(
            spark, ["k", "b"], buckets=32, cluster_partitions=16
        )
        assert res["files_after"] >= 2 and res["z_bits"] == 10
        assert t.read(spark).orderBy("k").collect() == before  # layout-only

        z_b, total = _touched(t, "b", 40_000, 45_000)
        z_k, _ = _touched(t, "k", 10_000, 15_000)
        assert z_b <= total // 2  # the whole point: b now prunes
        assert z_b < lin_b
        assert z_k < total  # key tightness decays but survives

    def test_read_range_and_read_eq_exact_after_zorder(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        t.optimize_zorder(spark, ["k", "b"], buckets=32)
        full = t.read(spark)
        got = t.read_range(spark, "b", 40_000, 45_000)
        exp = full.filter((F.col("b") >= 40_000) & (F.col("b") <= 45_000))
        assert got.orderBy("k").collect() == exp.orderBy("k").collect()
        probe = [v["b"] for v in full.limit(3).collect()]
        assert sorted(
            r["k"] for r in t.read_eq(spark, "b", probe).collect()
        ) == sorted(r["k"] for r in full.filter(F.col("b").isin(probe)).collect())

    def test_history_detail_and_marker_inheritance(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), n=20_000, parts=4)
        t.optimize_zorder(spark, ["k", "b"], buckets=16)
        assert t.history()[0]["operation"] == "OPTIMIZE[zorder(k,b)]"
        d = t.detail()
        assert d["clustering"] == {
            "type": "zorder",
            "columns": ["k", "b"],
            "buckets": 16,
        }
        # a later plain commit CARRIES the marker and the per-file flag
        man = t.manifest(t.current_version())
        t.commit_with_manifest(
            t.read(spark).limit(10),
            "k",
            carried=man["files"],
            cluster_partitions=1,
        )
        d2 = t.detail()
        assert d2["clustering"]["type"] == "zorder"
        man2 = t.manifest(t.current_version())
        flags = {e.get("clustered") for e in man2["files"]}
        assert "zorder" in flags  # carried entries keep it
        assert None in flags  # the new key-clustered file does not

    def test_maintain_exempts_z_files_but_not_plain_overlap(
        self, spark, tmp_path
    ):
        t = _mk(spark, str(tmp_path / "t"), n=40_000, parts=8)
        t.optimize_zorder(spark, ["k", "b"], buckets=16, cluster_partitions=8)
        man = t.manifest(t.current_version())
        # z files DO overlap on k (the trade) ...
        spans = sorted((e["min"], e["max"]) for e in man["files"])
        assert any(
            b_lo <= a_hi for (_, a_hi), (b_lo, _) in zip(spans, spans[1:])
        )
        # ... yet the overlap signal stays quiet (flag-exempt)
        m = t.maintain(spark, min_file_bytes=1)
        assert m["signals"]["overlap_files"] == 0
        assert not any(a["action"] == "recluster" for a in m["actions"])
        # control: an overlapping layout WITHOUT the flag still triggers
        t3 = VersionedParquetTable(str(tmp_path / "t3"))
        base = spark.range(10_000).select(
            F.col("id").alias("k"), F.lit(1).alias("b")
        )
        t3.commit_with_manifest(base, "k", cluster_partitions=4)
        man3 = t3.manifest(t3.current_version())
        t3.commit_with_manifest(
            base, "k", carried=man3["files"], cluster_partitions=4
        )  # duplicate ranges: every file overlaps its twin
        m3 = t3.maintain(spark, min_file_bytes=1)
        assert m3["signals"]["overlap_files"] > 0

    def test_dv_rows_resolved_by_rewrite(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), n=20_000, parts=4)
        t.delete_where(spark, "k % 10 = 3")
        assert t.detail()["dv_rows"] > 0
        expect = t.read(spark).orderBy("k").collect()
        t.optimize_zorder(spark, ["k", "b"], buckets=16)
        d = t.detail()
        assert d["dv_rows"] == 0 and d["dv_files"] == 0  # purged by rewrite
        assert t.read(spark).orderBy("k").collect() == expect

    def test_zorder_after_rename_uses_logical_names(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), n=20_000, parts=4)
        t.rename_column("b", "bucket")
        before = t.read(spark).orderBy("k").collect()
        t.optimize_zorder(spark, ["k", "bucket"], buckets=16)
        assert t.read(spark).orderBy("k").collect() == before
        # manifest stats are physical; read_range resolves the logical
        # name itself — assert through the API
        got = t.read_range(spark, "bucket", 40_000, 45_000).count()
        exp = t.read(spark).filter(
            (F.col("bucket") >= 40_000) & (F.col("bucket") <= 45_000)
        ).count()
        assert got == exp

    def test_date_and_double_columns(self, spark, tmp_path):
        t = VersionedParquetTable(str(tmp_path / "t"))
        df = spark.range(20_000).select(
            F.col("id").alias("k"),
            F.date_add(
                F.to_date(F.lit("2020-01-01")),
                ((F.col("id") * 48271) % 1000).cast("int"),
            ).alias("d"),
            ((F.col("id") * 2654435761) % 1_000_000 / 7.0).alias("v"),
        )
        t.commit_with_manifest(
            df, "k", cluster_partitions=8, stats_columns=["k", "d", "v"]
        )
        before = t.read(spark).orderBy("k").collect()
        t.optimize_zorder(spark, ["d", "v"], buckets=16, cluster_partitions=8)
        assert t.read(spark).orderBy("k").collect() == before
        lo = datetime.date(2020, 3, 1)
        hi = datetime.date(2020, 3, 20)
        kept, total = _touched(t, "d", lo, hi)
        assert kept < total  # date dimension prunes (temporal stats)
        got = t.read_range(spark, "d", lo, hi).count()
        exp = t.read(spark).filter(
            (F.col("d") >= lo) & (F.col("d") <= hi)
        ).count()
        assert got == exp

    def test_equi_depth_handles_skew(self, spark, tmp_path):
        # 80% of rows share one heavy b value; equi-width buckets would
        # collapse the tail into one cell — equi-depth still prunes a
        # tail range query
        t = VersionedParquetTable(str(tmp_path / "t"))
        df = spark.range(40_000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 5 < 4, F.lit(7)).otherwise(
                (F.col("id") * 48271) % 1_000_000
            ).alias("b"),
        )
        t.commit_with_manifest(
            df, "k", cluster_partitions=8, stats_columns=["k", "b"]
        )
        t.optimize_zorder(spark, ["k", "b"], buckets=32, cluster_partitions=8)
        kept, total = _touched(t, "b", 800_000, 900_000)
        assert kept < total

    def test_loud_vetting(self, spark, tmp_path):
        t = VersionedParquetTable(str(tmp_path / "t"))
        t.commit_with_manifest(
            spark.range(100).select(
                F.col("id").alias("k"),
                F.concat(F.lit("s"), F.col("id")).alias("s"),
                F.col("id").cast("decimal(10,2)").alias("m"),
            ),
            "k",
            cluster_partitions=1,
        )
        with pytest.raises(ValueError, match="no order-preserving"):
            t.optimize_zorder(spark, ["k", "s"])
        with pytest.raises(ValueError, match="no order-preserving"):
            t.optimize_zorder(spark, ["k", "m"])
        with pytest.raises(ValueError, match="unknown column"):
            t.optimize_zorder(spark, ["k", "nope"])
        with pytest.raises(ValueError, match=">= 2 columns"):
            t.optimize_zorder(spark, ["k"])
        with pytest.raises(ValueError, match="buckets"):
            t.optimize_zorder(spark, ["k", "m"], buckets=2)
        with pytest.raises(ValueError, match="append_split"):
            t.commit_with_manifest(
                spark.range(10).selectExpr("id as k"),
                "k",
                append_split=(0, 5),
                cluster_by=F.col("k"),
            )

    def test_constant_column_noop(self, spark, tmp_path):
        t = VersionedParquetTable(str(tmp_path / "t"))
        t.commit_with_manifest(
            spark.range(1000).select(
                F.lit(1).alias("a"), F.lit(2).alias("b"),
                F.col("id").alias("k"),
            ),
            "k",
            cluster_partitions=2,
        )
        v0 = t.current_version()
        res = t.optimize_zorder(spark, ["a", "b"], buckets=16)
        # both z columns constant: single bucket each still yields a
        # 2-bit curve with one cell — rewrite happens but is harmless,
        # OR the all-constant fast path returns unchanged; accept both
        assert t.current_version() in (v0, res["version"])
        assert t.read(spark).count() == 1000
