"""Watermark state + incremental runtime (SURVEY §2.8 T1-T8, E2)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.streaming.incremental import (
    IncrementalPipeline,
    WatermarkStore,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, schema="source string, ts timestamp, value int"
    )


T0 = datetime(2024, 1, 1, 0, 0, 0)
T1 = datetime(2024, 1, 1, 1, 0, 0)
T2 = datetime(2024, 1, 1, 2, 0, 0)
T3 = datetime(2024, 1, 1, 3, 0, 0)


def test_watermark_store_roundtrip(tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    assert store.load() == {}  # absent ⇒ full-history mode (T1)
    store.save({"a": T1, "b": T2})
    assert store.load() == {"a": T1, "b": T2}


def test_watermark_store_corrupt_degrades(tmp_path):
    p = tmp_path / "wm.json"
    p.write_text("{not json")
    assert WatermarkStore(str(p)).load() == {}  # E2


def test_watermark_store_z_suffix(tmp_path):
    p = tmp_path / "wm.json"
    p.write_text('{"a": "2024-01-01T01:00:00Z"}')
    assert WatermarkStore(str(p)).load() == {"a": T1}


def _pipeline(store, sink_rows):
    return IncrementalPipeline(
        store,
        key_col="source",
        ts_col="ts",
        sink=lambda df: sink_rows.extend(df.collect()),
    )


def test_first_run_processes_all_and_advances(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    sink: list = []
    pipe = _pipeline(store, sink)
    metrics = pipe.run(_events(spark, [("a", T0, 1), ("a", T1, 2), ("b", T2, 3)]))
    assert metrics == {"records_processed": 3, "keys_advanced": 2}
    assert store.load() == {"a": T1, "b": T2}
    assert len(sink) == 3


def test_second_run_incremental_only(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    pipe = _pipeline(store, [])
    pipe.run(_events(spark, [("a", T0, 1), ("a", T1, 2), ("b", T2, 3)]))

    sink2: list = []
    pipe2 = _pipeline(store, sink2)
    # a@T1 is a duplicate (not > watermark), a@T2 is new, c is unseen key
    m = pipe2.run(
        _events(spark, [("a", T1, 9), ("a", T2, 4), ("b", T2, 9), ("c", T0, 5)])
    )
    assert m["records_processed"] == 2
    got = {(r["source"], r["ts"]) for r in sink2}
    assert got == {("a", T2), ("c", T0)}
    assert store.load() == {"a": T2, "b": T2, "c": T0}


def test_fallback_date_first_run(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    sink: list = []
    pipe = IncrementalPipeline(
        store,
        key_col="source",
        ts_col="ts",
        sink=lambda df: sink.extend(df.collect()),
        fallback=T1,
    )
    pipe.run(_events(spark, [("a", T0, 1), ("a", T1, 2), ("b", T2, 3)]))
    # fallback is inclusive >= (embeddings-pipeline.py:157-158)
    assert {(r["source"], r["ts"]) for r in sink} == {("a", T1), ("b", T2)}


def test_sink_failure_leaves_state_untouched(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    store.save({"a": T0})

    def boom(df):
        raise RuntimeError("sink down")

    pipe = IncrementalPipeline(store, key_col="source", ts_col="ts", sink=boom)
    with pytest.raises(RuntimeError):
        pipe.run(_events(spark, [("a", T1, 1)]))
    # T4 ordering: no state advance on failure ⇒ replay next run
    assert store.load() == {"a": T0}

    sink: list = []
    pipe2 = _pipeline(store, sink)
    m = pipe2.run(_events(spark, [("a", T1, 1)]))
    assert m["records_processed"] == 1 and store.load() == {"a": T1}


def test_join_scan_matches_or_chain(spark, tmp_path, monkeypatch):
    """Above JOIN_PATH_MIN_KEYS the broadcast-join scan must return the
    exact rows the OR-chain predicate would (including unseen-key and
    fallback semantics)."""
    n_keys = 200
    wms = {f"k{i:04d}": T1 for i in range(n_keys)}
    store = WatermarkStore(str(tmp_path / "wm.json"))
    store.save(wms)

    rows = []
    for i in range(0, n_keys, 7):  # a sample of known keys
        rows.append((f"k{i:04d}", T0, 1))  # below watermark ⇒ excluded
        rows.append((f"k{i:04d}", T1, 2))  # at watermark (not strict >) ⇒ excluded
        rows.append((f"k{i:04d}", T2, 3))  # above ⇒ included
    rows += [("unseen_a", T0, 4), ("unseen_b", T2, 5)]
    src = _events(spark, rows)

    def scan(fallback, min_keys):
        pipe = IncrementalPipeline(
            store, key_col="source", ts_col="ts", sink=lambda df: None,
            fallback=fallback,
        )
        monkeypatch.setattr(IncrementalPipeline, "JOIN_PATH_MIN_KEYS", min_keys)
        return {
            (r["source"], r["ts"], r["value"])
            for r in pipe.plan_incremental_scan(src).collect()
        }

    for fb in (None, T1):
        or_chain = scan(fb, 10**9)  # force literal-predicate path
        join_path = scan(fb, 1)  # force broadcast-join path
        assert join_path == or_chain, f"fallback={fb}"
        # sanity: known keys advance strictly, unseen keys per fallback
        assert ("k0000", T2, 3) in join_path and ("k0000", T1, 2) not in join_path
        if fb is None:
            assert ("unseen_a", T0, 4) in join_path
        else:
            assert ("unseen_a", T0, 4) not in join_path
            assert ("unseen_b", T2, 5) in join_path


def test_join_scan_plan_bounded_at_1e4_keys(spark, tmp_path):
    """10⁴ watermark keys: the join path must plan in bounded time with
    a plan whose size does not grow per-key (the OR-chain grows one
    branch per key and blows up Catalyst planning)."""
    wms = {f"key{i:05d}": T1 for i in range(10_000)}
    store = WatermarkStore(str(tmp_path / "wm.json"))
    store.save(wms)
    pipe = IncrementalPipeline(
        store, key_col="source", ts_col="ts", sink=lambda df: None
    )
    src = _events(spark, [("key00000", T2, 1), ("key00000", T0, 2), ("nope", T0, 3)])
    df = pipe.plan_incremental_scan(src)
    # filter/join condition is fixed-size — not one branch per key
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 20_000
    got = {(r["source"], r["ts"]) for r in df.collect()}
    assert got == {("key00000", T2), ("nope", T0)}


def test_empty_increment_no_sink_call(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    store.save({"a": T3})
    calls: list = []
    pipe = IncrementalPipeline(
        store, key_col="source", ts_col="ts", sink=lambda df: calls.append(1)
    )
    m = pipe.run(_events(spark, [("a", T1, 1)]))
    # P8 guard: nothing newer ⇒ sink not invoked, watermark unchanged
    assert m["records_processed"] == 0 and calls == [] and store.load() == {"a": T3}


def test_partition_col_prunes_day_directories(spark, tmp_path):
    """With partition_col set, the incremental plan carries a partition
    predicate: PartitionFilters appear in the physical plan and the
    scan reads only the in-range day directories; results equal the
    unpruned formulation."""
    import io
    from contextlib import redirect_stdout
    from datetime import datetime

    from pyspark.sql import functions as F

    from airflow_embeddings_pipeline_spark.streaming.incremental import (
        IncrementalPipeline,
        WatermarkStore,
    )

    rows = [
        ("a", datetime(2024, 1, d, 12, 0), float(d)) for d in range(1, 11)
    ]
    df = spark.createDataFrame(rows, schema="source string, ts timestamp, v double")
    path = str(tmp_path / "partitioned")
    df.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(path)

    store = WatermarkStore(str(tmp_path / "wm.json"))
    store.save({"a": datetime(2024, 1, 7, 12, 0)})
    pipe = IncrementalPipeline(
        store,
        key_col="source",
        ts_col="ts",
        sink=lambda d: None,
        fallback=datetime(2024, 1, 6),
        partition_col="day",
    )
    src = spark.read.parquet(path)
    planned = pipe.plan_incremental_scan(src)

    buf = io.StringIO()
    with redirect_stdout(buf):
        planned.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "day" in plan
    # 2024-01-06 bound (min of fallback & watermark) must appear as a
    # pushed partition filter, not a post-scan filter only
    assert "19728" in plan or "2024-01-06" in plan  # date literal encoding

    got = {(r.source, r.ts) for r in planned.collect()}
    # rows strictly after the watermark for 'a' (days 8, 9, 10)
    assert got == {("a", datetime(2024, 1, d, 12, 0)) for d in (8, 9, 10)}

    # no partition col → same rows, no partition bound
    pipe2 = IncrementalPipeline(
        store, key_col="source", ts_col="ts", sink=lambda d: None,
        fallback=datetime(2024, 1, 6),
    )
    got2 = {(r.source, r.ts) for r in pipe2.plan_incremental_scan(src).collect()}
    assert got2 == got
