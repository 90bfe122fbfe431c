"""Predicate → manifest-stats file pruning (read_where + pruned DML).

``_compile_pruner`` walks the expression tree SPARK'S OWN PARSER
produces (never a hand-rolled tokenizer) and compiles the whitelisted
atoms — AND/OR, ``col {<,<=,>,>=,=} literal`` either side,
``col IN (...)``, ``col BETWEEN lo AND hi`` — into a conservative
per-file might-match test over the manifest [min, max] stats.  Every
unrecognized node compiles to "might match", so pruning only ever
narrows the scan; the exact filter still decides.  ``read_where``
generalizes read_range/read_eq to arbitrary predicates, and
``delete_where``/``update_where`` open only candidate files — a
retention delete stops being a table scan.

The property test is the safety net for the whitelist: a generated
predicate grammar (comparisons over three typed columns, AND/OR
combinations, IN lists, BETWEEN, plus deliberately-unprunable
modulo/function atoms) must make read_where row-identical to the
unpruned read().filter on every example.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
)

N = 40_000
PARTS = 8
T0 = datetime.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("predprune") / "t")
    t = VersionedParquetTable(root)
    df = spark.range(N).select(
        F.col("id").alias("k"),
        ((F.col("id") * 2654435761) % 10_000).alias("b"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("ts"),
        F.concat(F.lit("s"), (F.col("id") % 7)).alias("s"),
    )
    t.commit_with_manifest(
        df, "k", cluster_partitions=PARTS, stats_columns=["k", "ts"]
    )
    return t


def _n_files(t, spark, cond):
    man = t.manifest(t.current_version())
    return len(t._prune_where(spark, man, cond)), len(man["files"])


class TestPruneShapes:
    def test_simple_atoms_prune(self, spark, table):
        for cond, max_frac in [
            ("k < 2000", 0.3),
            ("k >= 38000", 0.3),
            ("3000 > k", 0.3),  # literal on the left mirrors
            ("k = 12345", 0.2),
            ("k IN (5, 39999)", 0.4),
            ("k BETWEEN 10000 AND 12000", 0.3),
            ("ts < TIMESTAMP '2024-01-01 08:00:00'", 0.3),
            (
                "ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' "
                "AND TIMESTAMP '2024-01-06 00:00:00'",
                0.4,
            ),
        ]:
            kept, total = _n_files(table, spark, cond)
            assert kept <= max_frac * total, (cond, kept, total)

    def test_and_intersects_or_unions(self, spark, table):
        k_and, total = _n_files(table, spark, "k >= 5000 AND k < 7000")
        assert k_and <= 2
        k_or, _ = _n_files(table, spark, "k < 2000 OR k >= 38000")
        assert 2 <= k_or <= 4
        # OR with an unprunable side keeps everything (sound)
        k_mixed, _ = _n_files(table, spark, "k < 2000 OR b = 3")
        assert k_mixed == total

    def test_unprunable_shapes_keep_all(self, spark, table):
        man = table.manifest(table.current_version())
        total = len(man["files"])
        for cond in [
            "b = 17",  # no stats recorded for b
            "k % 2 = 0",  # arithmetic
            "NOT (k < 100)",  # negation bails
            "k IS NULL",
            "substr(s, 1, 1) = 's'",
            "ts < '2024-01-01'",  # string-vs-timestamp needs analysis
            "k < b",  # column-vs-column
        ]:
            kept = len(table._prune_where(spark, man, cond))
            assert kept == total, cond
        # shapeless predicate: compiler returns None (no atom usable)
        assert table._compile_pruner(spark, man, "b = 17") is None

    def test_null_rows_never_lost(self, spark, tmp_path):
        # files holding NULLs in the predicate column keep non-null
        # footer ranges; supported atoms are NULL-rejecting so pruning
        # by those ranges must not drop any MATCHING row
        t = VersionedParquetTable(str(tmp_path / "t"))
        df = spark.range(1000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 3 == 0, None)
            .otherwise(F.col("id"))
            .alias("v"),
        )
        t.commit_with_manifest(
            df, "k", cluster_partitions=4, stats_columns=["k", "v"]
        )
        got = t.read_where(spark, "v >= 900").orderBy("k").collect()
        exp = (
            t.read(spark).filter("v >= 900").orderBy("k").collect()
        )
        assert got == exp


class TestReadWhere:
    def test_exactness_on_pruned_and_unpruned(self, spark, table):
        for cond in [
            "k < 1000",
            "k >= 10000 AND ts < TIMESTAMP '2024-01-08 00:00:00'",
            "k IN (1, 2, 3, 39999)",
            "b = 17",
            "k < 500 OR k >= 39500",
        ]:
            got = table.read_where(spark, cond).orderBy("k").collect()
            exp = (
                table.read(spark).filter(F.expr(cond)).orderBy("k").collect()
            )
            assert got == exp, cond

    def test_plain_version_degrades(self, spark, tmp_path):
        t = VersionedParquetTable(str(tmp_path / "plain"))
        t.commit(spark.range(100).selectExpr("id as k"))
        assert t.read_where(spark, "k < 10").count() == 10


# predicate grammar: prunable and unprunable atoms, combined with
# AND/OR — every generated expression must read identically pruned
# and unpruned
_K = st.integers(min_value=-100, max_value=N + 100)
_OPS = st.sampled_from(["<", "<=", ">", ">=", "="])


def _atoms():
    k_cmp = st.tuples(_OPS, _K).map(lambda t: f"k {t[0]} {t[1]}")
    k_rev = st.tuples(_OPS, _K).map(lambda t: f"{t[1]} {t[0]} k")
    k_in = st.lists(_K, min_size=1, max_size=4).map(
        lambda vs: f"k IN ({', '.join(map(str, vs))})"
    )
    k_between = st.tuples(_K, _K).map(
        lambda t: f"k BETWEEN {min(t)} AND {max(t)}"
    )
    ts_cmp = st.tuples(
        _OPS, st.integers(min_value=0, max_value=N)
    ).map(
        lambda t: (
            f"ts {t[0]} TIMESTAMP "
            f"'{(T0 + datetime.timedelta(minutes=t[1])).strftime('%Y-%m-%d %H:%M:%S')}'"
        )
    )
    b_cmp = st.integers(min_value=0, max_value=10_000).map(
        lambda v: f"b = {v}"
    )  # unprunable: no stats
    mod = st.integers(min_value=2, max_value=7).map(
        lambda m: f"k % {m} = 0"
    )  # unprunable: arithmetic
    return st.one_of(k_cmp, k_rev, k_in, k_between, ts_cmp, b_cmp, mod)


def _exprs(depth=2):
    if depth == 0:
        return _atoms()
    sub = _exprs(depth - 1)
    return st.one_of(
        _atoms(),
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]}) {t[1]} ({t[2]})"
        ),
    )


@settings(max_examples=30, deadline=None)
@given(_exprs())
def test_property_pruned_read_identical(spark, table, cond):
    got = table.read_where(spark, cond).count()
    exp = table.read(spark).filter(F.expr(cond)).count()
    assert got == exp, cond


class TestPrunedDML:
    def test_retention_delete_opens_one_file(self, spark, tmp_path):
        t = VersionedParquetTable(str(tmp_path / "t"))
        df = spark.range(20_000).select(
            F.col("id").alias("k"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(mins=F.col("id").cast("int"))
            ).alias("ts"),
        )
        t.commit_with_manifest(
            df, "ts", cluster_partitions=8, stats_columns=["ts", "k"]
        )
        man = t.manifest(t.current_version())
        cutoff = "TIMESTAMP '2024-01-02 00:00:00'"
        assert len(t._prune_where(spark, man, f"ts < {cutoff}")) == 1
        r = t.delete_where(spark, f"ts < {cutoff}")
        assert r["rows_deleted"] == 1440 and r["files_affected"] == 1
        assert t.read(spark).count() == 20_000 - 1440
        # deleted rows stay gone; nothing outside the band was touched
        assert t.read(spark).filter(f"ts < {cutoff}").count() == 0

    def test_pruned_update_where(self, spark, tmp_path):
        t = VersionedParquetTable(str(tmp_path / "t"))
        t.commit_with_manifest(
            spark.range(10_000).selectExpr("id as k", "id * 2 as v"),
            "k",
            cluster_partitions=8,
        )
        man = t.manifest(t.current_version())
        assert len(t._prune_where(spark, man, "k >= 9000")) == 1
        r = t.update_where(spark, "k >= 9000", {"v": F.lit(-1)})
        assert r["rows_updated"] == 1000
        assert t.read(spark).filter("v = -1").count() == 1000
        assert t.read(spark).count() == 10_000

    def test_delete_nothing_matches_prunes_to_zero(self, spark, tmp_path):
        t = VersionedParquetTable(str(tmp_path / "t"))
        t.commit_with_manifest(
            spark.range(1000).selectExpr("id as k"),
            "k",
            cluster_partitions=2,
        )
        v0 = t.current_version()
        man = t.manifest(v0)
        assert t._prune_where(spark, man, "k < -5") == []
        r = t.delete_where(spark, "k < -5")
        assert r == {"version": v0, "rows_deleted": 0, "files_affected": 0}

    def test_pruned_delete_matches_unpruned_semantics(self, spark, tmp_path):
        # same DML on a table whose predicate is unprunable (modulo)
        # and a pruned one must land the same surviving rows
        a = VersionedParquetTable(str(tmp_path / "a"))
        b = VersionedParquetTable(str(tmp_path / "b"))
        df = spark.range(5000).selectExpr("id as k", "id % 10 as m")
        for t in (a, b):
            t.commit_with_manifest(df, "k", cluster_partitions=4)
        a.delete_where(spark, "k >= 1000 AND k < 2000")  # pruned
        b.delete_where(spark, "k - 1000 >= 0 AND k - 2000 < 0")  # unprunable
        assert (
            a.read(spark).orderBy("k").collect()
            == b.read(spark).orderBy("k").collect()
        )

    def test_rename_interplay(self, spark, tmp_path):
        # condition speaks LOGICAL names; stats are physical
        t = VersionedParquetTable(str(tmp_path / "t"))
        t.commit_with_manifest(
            spark.range(4000).selectExpr("id as k", "id * 3 as v"),
            "k",
            cluster_partitions=4,
        )
        t.rename_column("v", "val")
        man = t.manifest(t.current_version())
        kept = t._prune_where(spark, man, "k < 500")
        assert len(kept) == 1
        got = t.read_where(spark, "k < 500 AND val >= 0").count()
        assert got == 500
