"""Tests for sinks, glob scans, quarantine, and file ops (S4-S8, E1/E4)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.sources.registry import load_table, scan_glob
from airflow_embeddings_pipeline_spark.sources.sink import (
    cleanup_files,
    file_metrics,
    quarantine_split,
    write_partitioned_parquet,
)


def test_partitioned_write_and_pruned_read(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    out = str(tmp_path / "docs_by_lang")
    write_partitioned_parquet(docs, out, partition_by=["lang"])

    langs = [r[0] for r in docs.select("lang").distinct().collect()]
    assert all(os.path.isdir(os.path.join(out, f"lang={l}")) for l in langs)

    # partition pruning: a lang filter must prune to that directory
    one = spark.read.parquet(out).filter(F.col("lang") == langs[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == docs.filter(F.col("lang") == langs[0]).count()


def test_scan_glob_pattern(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    base = str(tmp_path / "staged")
    docs.withColumn("part", F.lit("a")).coalesce(1).write.parquet(base + "/run_a")
    docs.withColumn("part", F.lit("b")).coalesce(1).write.parquet(base + "/run_b")
    # S5: pattern selects one staged file set, applied at listing time
    only_a = scan_glob(spark, base + "/*", "*.parquet")
    assert only_a.count() == 100  # both runs
    a = spark.read.parquet(base + "/run_a")
    assert a.count() == 50


def test_quarantine_split(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    valid, rejects = quarantine_split(
        docs, F.col("n_chars") > 50, reject_path=str(tmp_path / "rejects")
    )
    n_valid, n_rej = valid.count(), rejects.count()
    assert n_valid + n_rej == 100
    persisted = spark.read.parquet(str(tmp_path / "rejects"))
    assert persisted.count() == n_rej


def test_file_metrics_and_cleanup(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    out = str(tmp_path / "m")
    docs.coalesce(1).write.parquet(out)
    m = file_metrics(out)
    assert m["n_files"] >= 1 and m["total_bytes"] > 0

    failed = cleanup_files([out, str(tmp_path / "does_not_exist")])
    assert not os.path.exists(out)
    assert failed == [str(tmp_path / "does_not_exist")]


def test_compact_parquet_reduces_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from airflow_embeddings_pipeline_spark.sources.sink import (
        compact_parquet,
        file_metrics,
    )

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("k", (F.col("id") % 3).cast("int"))
    df.repartition(40).write.parquet(path)
    assert file_metrics(path)["n_files"] >= 40

    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["after_files"] < stats["before_files"]
    assert stats["after_files"] <= 2
    # data survives byte-identically (count + checksum)
    out = spark.read.parquet(path)
    assert out.count() == 10_000
    assert out.agg(F.sum("id")).collect()[0][0] == sum(range(10_000))


def test_compact_parquet_partitioned(spark, tmp_path):
    from pyspark.sql import functions as F

    from airflow_embeddings_pipeline_spark.sources.sink import (
        compact_parquet,
        file_metrics,
    )

    path = str(tmp_path / "fragp")
    df = spark.range(0, 5_000).withColumn("k", (F.col("id") % 2).cast("int"))
    df.repartition(20).write.partitionBy("k").parquet(path)
    before = file_metrics(path)["n_files"]

    stats = compact_parquet(spark, path, target_file_mb=128, partition_by=["k"])
    assert stats["after_files"] < before
    out = spark.read.parquet(path)
    assert out.count() == 5_000
    assert set(r.k for r in out.select("k").distinct().collect()) == {0, 1}


def test_csv_roundtrip_with_schema(spark, tmp_path):
    """CSV source/sink: header write, explicit-schema read back (no
    inference job), values preserved including nulls."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, -0.25), (3, "c", None)],
        schema="id long, name string, score double",
    )
    out = str(tmp_path / "csv_rt")
    df.write.option("header", True).csv(out)
    back = (
        spark.read.schema("id long, name string, score double")
        .option("header", True)
        .csv(out)
    )
    assert sorted(back.collect()) == sorted(df.collect())
    # projection prunes columns even on CSV (no pushed filters, but the
    # read schema narrows)
    assert back.select("id").columns == ["id"]


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink round trip with predicate applied on read."""
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "orc_rt")
    df.write.orc(out)
    back = spark.read.orc(out).filter(F.col("id") >= 90)
    assert back.count() == 10
    assert back.agg(F.sum("v")).collect()[0][0] == sum(i * 2 for i in range(90, 100))


def test_parquet_schema_drift_mergeschema(spark, tmp_path):
    """Schema evolution at ingest: later files add a column; a
    mergeSchema read surfaces the union schema with nulls backfilled
    for early files — the drift case a long-running pipeline must
    absorb without rewriting history."""
    base = str(tmp_path / "drift")
    spark.createDataFrame([(1, "x")], schema="id long, a string").write.parquet(
        base + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "y", 9.5)], schema="id long, a string, b double"
    ).write.parquet(base + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) == {"id", "a", "b", "batch"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].b is None and rows[2].b == 9.5
