"""Vacuum at scale: the salted-Bloom referenced-file tier and the
lock-free bulk deletion of condemned below-head version dirs.

What round 11's restructured sweep must guarantee:

* the lock hold is metadata-only — condemned versions lose their
  markers (and orphans ABOVE the head, whose numbers the next commit
  reuses, are reclaimed) under the lock, but the bulk file deletion of
  below-head history runs AFTER release, so writers never queue behind
  the rmtree of a deep history;
* a condemned version stops being readable/restorable the moment the
  lock drops, even if its data files are still being deleted;
* the Bloom referenced-set tier (driver memory O(1.75 B/kept file)
  instead of O(~100 B)) never deletes a referenced file (one-sided
  error), and its per-run salt makes false-positive over-retention
  transient — a lingering dead file clears on a later vacuum.
"""

import os
import shutil

import pytest

from airflow_embeddings_pipeline_spark.operators.merge import (
    merge_upsert_write_pruned,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
    _SaltedBloomRefs,
)


def _walk_files(root: str) -> set:
    out = set()
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            out.add(os.path.relpath(os.path.join(dirpath, fn), root))
    return out


def _mk_history(spark, root: str, versions: int = 6):
    """A table whose later manifests CARRY files from earlier version
    dirs (so vacuum's partial GC and referenced-file keeps engage),
    with a couple of merges mixing in fresh files and DV sidecars."""
    t = VersionedParquetTable(root)
    df = spark.createDataFrame(
        [(i, f"v{i % 7}") for i in range(200)], "k long, v string"
    )
    t.commit_with_manifest(df, "k", cluster_partitions=4)
    for i in range(1, versions):
        upd = spark.createDataFrame(
            [(j, f"u{i}") for j in range(i * 10, i * 10 + 5)],
            "k long, v string",
        )
        merge_upsert_write_pruned(root, upd, "k", vacuum_keep_last=None)
    return t


class TestSaltedBloom:
    def test_no_false_negatives_ever(self):
        b = _SaltedBloomRefs(5000)
        items = [f"v{i:08d}/part-{i:05d}.parquet" for i in range(5000)]
        b.update(items)
        assert all(x in b for x in items)

    def test_false_positive_rate_bounded(self):
        b = _SaltedBloomRefs(5000)
        b.update(f"v{i:08d}/part-{i:05d}.parquet" for i in range(5000))
        dead = [f"w{i:08d}/dead-{i:05d}.parquet" for i in range(20000)]
        fp = sum(1 for x in dead if x in b) / len(dead)
        assert fp < 0.02, f"fp rate {fp} above the design bound"

    def test_salt_makes_runs_independent(self):
        # the property that turns over-retention from permanent into
        # transient: two filters over the SAME membership err on
        # (essentially) disjoint false-positive subsets
        items = [f"v{i:08d}/part-{i:05d}.parquet" for i in range(5000)]
        b1, b2 = _SaltedBloomRefs(5000), _SaltedBloomRefs(5000)
        b1.update(items)
        b2.update(items)
        dead = [f"w{i:08d}/dead-{i:05d}.parquet" for i in range(20000)]
        both = sum(1 for x in dead if x in b1 and x in b2)
        assert both <= 2, (
            f"{both} of 20000 dead paths false-positive in BOTH "
            "salted runs — salts are not independent"
        )


class TestBloomTierParity:
    def test_bloom_vacuum_matches_exact_and_converges(
        self, spark, tmp_path
    ):
        root_a = str(tmp_path / "exact")
        root_b = str(tmp_path / "bloom")
        _mk_history(spark, root_a)
        shutil.copytree(root_a, root_b)

        ta = VersionedParquetTable(root_a)
        ta.vacuum(keep_last=2)
        assert ta._last_vacuum_ref_mode == "exact"

        tb = VersionedParquetTable(root_b)
        tb.vacuum_bloom_min_refs = -1  # force the Bloom tier
        tb.vacuum(keep_last=2)
        assert tb._last_vacuum_ref_mode == "bloom"

        surv_a, surv_b = _walk_files(root_a), _walk_files(root_b)
        # one-sided error: the Bloom run may over-RETAIN, never
        # over-delete
        assert surv_a <= surv_b
        # per-run salting: lingering false-positive files clear on
        # later vacuums (independent ~0.4% each run)
        for _ in range(4):
            if _walk_files(root_b) == surv_a:
                break
            tb.vacuum(keep_last=2)
        assert _walk_files(root_b) == surv_a, (
            "Bloom over-retention did not converge to the exact "
            "survivor set across salted re-runs"
        )
        # both tables read identically at head and at the kept prior
        # version
        rows_a = sorted(
            (r["k"], r["v"]) for r in ta.read(spark).collect()
        )
        rows_b = sorted(
            (r["k"], r["v"]) for r in tb.read(spark).collect()
        )
        assert rows_a == rows_b
        kept_prior = [
            v for v in tb.versions() if v != tb.current_version()
        ]
        assert kept_prior, "keep_last=2 must retain one prior version"
        assert (
            tb.read_version(spark, kept_prior[-1]).count()
            == ta.read_version(spark, kept_prior[-1]).count()
        )

    def test_auto_tier_stays_exact_below_threshold(self, spark, tmp_path):
        t = _mk_history(spark, str(tmp_path / "t"))
        t.vacuum(keep_last=2)
        assert t._last_vacuum_ref_mode == "exact"


class TestLockFreeBulkDeletion:
    def test_bulk_delete_runs_outside_the_lock(
        self, spark, tmp_path, monkeypatch
    ):
        t = _mk_history(spark, str(tmp_path / "t"))
        lock_state = {"held": False}
        real_acquire = VersionedParquetTable._acquire_lock
        real_release = VersionedParquetTable._release_lock
        real_sweep = VersionedParquetTable._sweep_version_dirs
        calls = []

        def acq(self, *a, **kw):
            r = real_acquire(self, *a, **kw)
            lock_state["held"] = True
            return r

        def rel(self, *a, **kw):
            lock_state["held"] = False
            return real_release(self, *a, **kw)

        def sweep(self, condemned, referenced, *, dry_run):
            calls.append(
                {
                    "locked": lock_state["held"],
                    "dry_run": dry_run,
                    "n": len(condemned),
                }
            )
            return real_sweep(
                self, condemned, referenced, dry_run=dry_run
            )

        monkeypatch.setattr(VersionedParquetTable, "_acquire_lock", acq)
        monkeypatch.setattr(VersionedParquetTable, "_release_lock", rel)
        monkeypatch.setattr(
            VersionedParquetTable, "_sweep_version_dirs", sweep
        )
        dropped = t.vacuum(keep_last=2)
        assert dropped, "history must actually be reclaimed"
        bulk = [c for c in calls if not c["dry_run"] and c["n"] > 0]
        assert bulk, "the destructive sweep must run"
        assert all(not c["locked"] for c in bulk), (
            "below-head bulk deletion must run AFTER the lock "
            f"releases; calls: {calls}"
        )

    def test_condemned_version_unreadable_before_files_deleted(
        self, spark, tmp_path, monkeypatch
    ):
        # markers are stripped under the lock; even if the bulk file
        # deletion never runs (crash between release and sweep), the
        # condemned version reads/restores as cleanly ABSENT rather
        # than as a partially-deleted snapshot
        t = _mk_history(spark, str(tmp_path / "t"))
        victim = t.versions()[0]
        monkeypatch.setattr(
            VersionedParquetTable,
            "_sweep_version_dirs",
            lambda self, condemned, referenced, dry_run: [],
        )
        t.vacuum(keep_last=2)
        vdir = t._version_dir(victim)
        assert os.path.isdir(vdir), "deletion was suppressed"
        assert victim not in t.versions()
        with pytest.raises(Exception) as e1:
            t.read_version(spark, victim).collect()
        assert "available" in str(e1.value) or "version" in str(e1.value)
        with pytest.raises(Exception):
            t.restore(spark, victim)

    def test_orphan_above_head_reclaimed_under_lock(
        self, spark, tmp_path, monkeypatch
    ):
        # a crash orphan ABOVE the head reuses the next commit's
        # version number — it must be swept inside the lock hold, not
        # in the lock-free bulk phase
        t = _mk_history(spark, str(tmp_path / "t"), versions=3)
        head = t.current_version()
        orphan = t._version_dir(head + 1)
        os.makedirs(orphan)
        with open(os.path.join(orphan, "part-junk.parquet"), "w") as f:
            f.write("crash debris")

        lock_state = {"held": False}
        real_acquire = VersionedParquetTable._acquire_lock
        real_release = VersionedParquetTable._release_lock
        real_sweep = VersionedParquetTable._sweep_version_dirs
        orphan_sweeps = []

        def acq(self, *a, **kw):
            r = real_acquire(self, *a, **kw)
            lock_state["held"] = True
            return r

        def rel(self, *a, **kw):
            lock_state["held"] = False
            return real_release(self, *a, **kw)

        def sweep(self, condemned, referenced, *, dry_run):
            if head + 1 in condemned:
                orphan_sweeps.append(lock_state["held"])
            return real_sweep(
                self, condemned, referenced, dry_run=dry_run
            )

        monkeypatch.setattr(VersionedParquetTable, "_acquire_lock", acq)
        monkeypatch.setattr(VersionedParquetTable, "_release_lock", rel)
        monkeypatch.setattr(
            VersionedParquetTable, "_sweep_version_dirs", sweep
        )
        t.vacuum(keep_last=2)
        assert not os.path.exists(orphan), "orphan debris must go"
        assert orphan_sweeps == [True], (
            "the above-head orphan must be swept while the lock is "
            f"held (sweep lock states: {orphan_sweeps})"
        )

    def test_dry_run_unchanged_and_lock_free(
        self, spark, tmp_path, monkeypatch
    ):
        t = _mk_history(spark, str(tmp_path / "t"))
        before = _walk_files(str(tmp_path / "t"))
        monkeypatch.setattr(
            VersionedParquetTable,
            "_acquire_lock",
            lambda self, *a, **kw: pytest.fail(
                "dry_run must not take the commit lock"
            ),
        )
        would_drop = t.vacuum(keep_last=2, dry_run=True)
        assert would_drop
        assert _walk_files(str(tmp_path / "t")) == before


class TestPublishedStagedMarker:
    def test_publish_marks_staging_and_sweep_skips_it(
        self, spark, tmp_path
    ):
        from airflow_embeddings_pipeline_spark.sources.versioned import (
            _STAGED_PUBLISHED,
        )

        root = str(tmp_path / "t")
        t = _mk_history(spark, root, versions=3)
        v = t.current_version()
        prepared = t.prepare_commit(
            spark.createDataFrame([(900, "new")], "k long, v string"),
            "k",
            base_version=v,
        )
        sdir = os.path.join(root, prepared["staging_rel"])
        assert not os.path.exists(os.path.join(sdir, _STAGED_PUBLISHED))
        t.commit_with_manifest(
            None,
            "k",
            carried=t.manifest(v)["files"],
            prepared=prepared,
            expected_base_version=v,
        )
        marker = os.path.join(sdir, _STAGED_PUBLISHED)
        assert os.path.exists(marker), (
            "publish must mark its staging so vacuum's under-lock "
            "pass skips it with one stat"
        )
        # the under-lock pass returns it as published and leaves it
        published = t._sweep_staged(set())
        assert os.path.basename(sdir) in published
        assert os.path.exists(sdir)

    def test_self_heal_marks_referenced_unmarked_dir_past_grace(
        self, spark, tmp_path
    ):
        import time

        from airflow_embeddings_pipeline_spark.sources.versioned import (
            _STAGED_PUBLISHED,
        )

        root = str(tmp_path / "t")
        t = _mk_history(spark, root, versions=3)
        v = t.current_version()
        prepared = t.prepare_commit(
            spark.createDataFrame([(901, "new")], "k long, v string"),
            "k",
            base_version=v,
        )
        sdir = os.path.join(root, prepared["staging_rel"])
        t.commit_with_manifest(
            None,
            "k",
            carried=t.manifest(v)["files"],
            prepared=prepared,
            expected_base_version=v,
        )
        # simulate a pre-marker table / marker-write crash
        os.remove(os.path.join(sdir, _STAGED_PUBLISHED))
        old = time.time() - t.staged_gc_grace_seconds - 10
        os.utime(sdir, (old, old))
        t.vacuum(keep_last=2)
        assert os.path.exists(os.path.join(sdir, _STAGED_PUBLISHED)), (
            "vacuum must self-heal a referenced-but-unmarked staging"
        )
        assert t.read(spark).filter("k = 901").count() == 1

    def test_young_unmarked_dir_untouched_even_if_membership_hits(
        self, spark, tmp_path
    ):
        # the Bloom-fp hazard the grace gate closes: an IN-FLIGHT
        # prepare's staging must be neither marked published nor
        # GC'd inside, even when the membership container (falsely)
        # claims one of its files is referenced
        from airflow_embeddings_pipeline_spark.sources.versioned import (
            _STAGED,
            _STAGED_PUBLISHED,
        )

        root = str(tmp_path / "t")
        t = _mk_history(spark, root, versions=2)
        v = t.current_version()
        prepared = t.prepare_commit(
            spark.createDataFrame([(902, "inflight")], "k long, v string"),
            "k",
            base_version=v,
        )
        sdir = os.path.join(root, prepared["staging_rel"])
        name = os.path.basename(sdir)
        files_before = set(os.listdir(sdir))
        a_file = next(f for f in files_before if not f.startswith("_"))
        fp_refs = {os.path.join(_STAGED, name, a_file)}  # simulated fp
        published = t._sweep_staged(fp_refs)
        assert name not in published
        assert not os.path.exists(os.path.join(sdir, _STAGED_PUBLISHED))
        assert set(os.listdir(sdir)) == files_before
        # the prepare still publishes fine afterwards
        nv = t.commit_with_manifest(
            None,
            "k",
            carried=t.manifest(v)["files"],
            prepared=prepared,
            expected_base_version=v,
        )
        assert nv == v + 1

    def test_published_staging_gc_runs_lock_free_and_drops_dead_dirs(
        self, spark, tmp_path, monkeypatch
    ):
        # compaction rewrites all data -> old published stagings fall
        # fully dead once their versions leave retention, and the
        # file-level GC inside them must run OUTSIDE the lock
        root = str(tmp_path / "t")
        t = _mk_history(spark, root, versions=4)
        t.compact(spark, min_file_bytes=1 << 40)

        lock_state = {"held": False}
        real_acquire = VersionedParquetTable._acquire_lock
        real_release = VersionedParquetTable._release_lock
        real_gc = VersionedParquetTable._gc_published_staged
        gc_calls = []

        def acq(self, *a, **kw):
            r = real_acquire(self, *a, **kw)
            lock_state["held"] = True
            return r

        def rel(self, *a, **kw):
            lock_state["held"] = False
            return real_release(self, *a, **kw)

        def gc(self, published, referenced):
            gc_calls.append(lock_state["held"])
            return real_gc(self, published, referenced)

        monkeypatch.setattr(VersionedParquetTable, "_acquire_lock", acq)
        monkeypatch.setattr(VersionedParquetTable, "_release_lock", rel)
        monkeypatch.setattr(
            VersionedParquetTable, "_gc_published_staged", gc
        )
        t.vacuum(keep_last=1)
        assert gc_calls == [False], (
            "published-staging GC must run after the lock releases; "
            f"lock states: {gc_calls}"
        )
        rows = {x["k"]: x["v"] for x in t.read(spark).collect()}
        assert len(rows) == 200  # merges upsert existing keys only
        assert rows[30] == "u3"  # last merge's update survived the GC
