"""Z-order decay repair in ``maintain()`` (round 10).

``optimize_zorder`` documents that later merges decay the layout —
incremental merges append key-clustered files whose secondary-column
ranges are table-wide.  ``maintain()`` now measures the decay (the
unflagged row fraction / file count on a table whose ``clustering``
marker says zorder) and, past ``max_zorder_decay``, re-zorders ONLY
the decayed portion: per-file stats tightness is a per-file property,
so the repair costs O(decayed bytes) and carries the existing z mass
untouched.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators.merge import (
    merge_upsert_write_pruned,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
    _stat_canon,
)


def _mk_z(spark, root, n=60_000, parts=8):
    t = VersionedParquetTable(root)
    t.commit_with_manifest(
        spark.range(n).select(
            F.col("id").alias("k"),
            ((F.col("id") * 2654435761) % 50_000).alias("b"),
            F.lit("p").alias("s"),
        ),
        "k",
        cluster_partitions=parts,
    )
    t.optimize_zorder(spark, ["k", "b"], buckets=16, cluster_partitions=parts)
    return t


def _b_touched(t):
    """(files a b-range scan must read, total) — read_range keep rule."""
    lo, hi = _stat_canon(10_000), _stat_canon(12_000)
    man = t.manifest(t.current_version())
    kept = 0
    for e in man["files"]:
        s = (e.get("stats") or {}).get("b")
        r = (s[0], s[1]) if s else (None, None)
        if r[0] is None or (r[1] >= lo and r[0] <= hi):
            kept += 1
    return kept, len(man["files"])


def _decay(spark, t, root, n, rounds, rows_per):
    """Append ``rounds`` unflagged batches via incremental merges."""
    for i in range(rounds):
        lo = n + i * rows_per
        src = spark.range(lo, lo + rows_per).select(
            F.col("id").alias("k"),
            ((F.col("id") * 2654435761) % 50_000).alias("b"),
            F.lit("m").alias("s"),
        )
        merge_upsert_write_pruned(root, src, "k", vacuum_keep_last=None)


class TestZorderDecay:
    def test_healthy_z_table_noops(self, spark, tmp_path):
        t = _mk_z(spark, str(tmp_path / "t"))
        m = t.maintain(spark, min_file_bytes=1)
        assert m["signals"]["zorder_decayed_files"] == 0
        assert m["signals"]["zorder_decayed_ratio"] == 0.0
        assert not any(a["action"] == "rezorder" for a in m["actions"])

    def test_decayed_table_reclusters_scoped(self, spark, tmp_path):
        root = str(tmp_path / "t")
        n = 60_000
        t = _mk_z(spark, root, n=n)
        v_z = t.current_version()
        z_paths = {
            e["path"]
            for e in t.manifest(v_z)["files"]
            if e.get("clustered") == "zorder"
        }
        # decay: ~33% unflagged rows via incremental merges
        _decay(spark, t, root, n, rounds=10, rows_per=3_000)
        kept_before, total_before = _b_touched(t)
        m = t.maintain(spark, min_file_bytes=1, max_small_files=10**9)
        sig = m["signals"]
        assert sig["zorder_decayed_ratio"] > 0.25
        acts = [a for a in m["actions"] if a["action"] == "rezorder"]
        assert len(acts) == 1
        # scoped repair: the original z files were CARRIED, not
        # rewritten (bytes bounded by the decayed mass)
        man = t.manifest(t.current_version())
        survived = {e["path"] for e in man["files"]} & z_paths
        assert survived == z_paths
        assert all(
            e.get("clustered") == "zorder" for e in man["files"]
        )
        # post-repair: decay signal resets and the secondary-dim skip
        # rate is restored (a b-range scan prunes again)
        m2 = t.maintain(spark, min_file_bytes=1, max_small_files=10**9)
        assert m2["signals"]["zorder_decayed_files"] == 0
        assert not any(a["action"] == "rezorder" for a in m2["actions"])
        kept_after, total_after = _b_touched(t)
        # decayed: every unflagged append is table-wide in b (always
        # touched); repaired: the b-scan prunes a strictly larger
        # fraction than it could pre-repair
        assert kept_after < total_after
        assert kept_after / total_after < kept_before / total_before
        # content parity across the repair
        assert t.read(spark).count() == n + 30_000

    def test_file_count_trigger_without_ratio(self, spark, tmp_path):
        """A trickle of small appends (ratio below the threshold but
        count above max_small_files) also repairs — the accumulation
        shape that would otherwise grow scan task count unboundedly."""
        root = str(tmp_path / "t")
        n = 60_000
        t = _mk_z(spark, root, n=n)
        _decay(spark, t, root, n, rounds=5, rows_per=200)  # ~1.6% rows
        m = t.maintain(spark, min_file_bytes=1, max_small_files=4)
        sig = m["signals"]
        assert sig["zorder_decayed_ratio"] < 0.25
        assert sig["zorder_decayed_files"] > 4
        assert any(a["action"] == "rezorder" for a in m["actions"])
        man = t.manifest(t.current_version())
        assert all(
            e.get("clustered") == "zorder" for e in man["files"]
        )

    def test_non_z_table_has_no_z_signals(self, spark, tmp_path):
        t = VersionedParquetTable(str(tmp_path / "t"))
        t.commit_with_manifest(
            spark.range(1_000).selectExpr("id as k", "id as b"),
            "k",
            cluster_partitions=2,
        )
        m = t.maintain(spark, min_file_bytes=1)
        assert "zorder_decayed_files" not in m["signals"]


class TestZorderCompactInterplay:
    def test_z_fragments_fold_into_rezorder_not_compact(
        self, spark, tmp_path
    ):
        """On a z table the generic small-file compact is skipped —
        it would rewrite z fragments key-clustered and DROP the flag;
        instead small z files fold into the scoped re-zorder and the
        repaired table stays fully z-flagged."""
        root = str(tmp_path / "t")
        t = _mk_z(spark, root, n=40_000, parts=12)  # many small z files
        m = t.maintain(
            spark,
            min_file_bytes=1 << 30,  # everything counts as small
            max_small_files=4,
        )
        acts = {a["action"] for a in m["actions"]}
        assert "compact" not in acts
        assert "rezorder" in acts
        assert m["signals"]["zorder_fragments"] == 12
        man = t.manifest(t.current_version())
        assert all(
            e.get("clustered") == "zorder" for e in man["files"]
        )
        assert t.read(spark).count() == 40_000
        # repaired: a second pass is quiet
        m2 = t.maintain(
            spark, min_file_bytes=1 << 30, max_small_files=4
        )
        acts2 = {a["action"] for a in m2["actions"]}
        assert "rezorder" not in acts2 and "compact" not in acts2
