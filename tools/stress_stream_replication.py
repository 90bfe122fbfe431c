"""Streaming CDC replication stress: a primary versioned table takes a
daily-shaped pruned MERGE per cycle while a STREAMING consumer
(`sync_replica_stream`: CDF source → foreachBatch → apply_changes)
periodically catches up a replica — with an injected checkpoint LOSS
mid-run (the fault the sink-watermark design exists for).

Per drain we record: commits caught up, the replica/primary content
signature match, and walls.  The drain cadence (every `drain_every`
cycles) makes every micro-batch a MULTI-COMMIT catch-up, exercising
the per-key netting path; the checkpoint loss forces a re-seed from
the replica's durable app-metadata watermark and an at-least-once
replay that must converge (apply_changes idempotency).

Usage: python tools/stress_stream_replication.py [rows] [cycles] [drain_every]
       [--maintain N]   # run primary.maintain() every N cycles: the
                        # consumer must stay convergent across
                        # compaction/recluster commits (they rewrite
                        # bytes but net zero row changes — the classic
                        # CDC-across-OPTIMIZE breakage point)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = list(sys.argv[1:])
    maintain_every = None
    if "--maintain" in argv:
        i = argv.index("--maintain")
        maintain_every = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    rows = int(argv[0]) if len(argv) > 0 else 2_000_000
    cycles = int(argv[1]) if len(argv) > 1 else 24
    drain_every = int(argv[2]) if len(argv) > 2 else 3

    from pyspark.sql import SparkSession, functions as F

    from airflow_embeddings_pipeline_spark.operators.merge import (
        merge_upsert_write_pruned,
        sync_replica_stream,
    )
    from airflow_embeddings_pipeline_spark.sources.versioned import (
        VersionedParquetTable,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("stress-stream-replication")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_repl_")
    p_path, r_path = os.path.join(work, "primary"), os.path.join(work, "replica")
    base = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 1_000).cast("double").alias("price"),
        F.lit("base").alias("status"),
    )
    primary = VersionedParquetTable(p_path)
    primary.commit_with_manifest(base, "k", cluster_partitions=32)
    replica = VersionedParquetTable(r_path)
    replica.commit_with_manifest(
        base, "k", cluster_partitions=32,
        app_metadata={"cdc_last_applied_version": 1},
    )

    def signature(t):
        # decimal accumulator: a long sum of 2M 64-bit hashes overflows
        # under ANSI mode (same convention as stress_cdc_replication)
        r = t.read(spark).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("k", "price", "status").cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    ckpt = os.path.join(work, "ckpt")
    drains: list[dict] = []
    ckpt_losses = 0
    t_all = time.time()
    for c in range(1, cycles + 1):
        # daily-shaped batch: narrow updates, fresh inserts, deletes of
        # some keys inserted two cycles ago
        upd = spark.range(rows).filter(
            (F.col("id") % cycles == c - 1) & (F.col("id") % 211 == 0)
        ).select(
            F.col("id").alias("k"),
            F.lit(float(c)).alias("price"),
            F.lit(f"upd{c}").alias("status"),
        )
        ins_lo = rows + c * 10_000
        ins = spark.range(ins_lo, ins_lo + 2_000).select(
            F.col("id").alias("k"),
            F.lit(0.5).alias("price"),
            F.lit(f"ins{c}").alias("status"),
        )
        batch = upd.unionAll(ins)
        if c > 2:
            del_lo = rows + (c - 2) * 10_000
            dels = spark.range(del_lo, del_lo + 500).select(
                F.col("id").alias("k"),
                F.lit(0.0).alias("price"),
                F.lit("DEL").alias("status"),
            )
            batch = batch.unionAll(dels)
        merge_upsert_write_pruned(
            p_path, batch, "k",
            delete_when=F.col("s.status") == "DEL",
            vacuum_keep_last=None,
        )
        if maintain_every and c % maintain_every == 0:
            # maintenance commit(s) on the primary: rewrites bytes, nets
            # zero row changes — the consumer's diff must emit nothing
            primary.maintain(spark)
        if c % drain_every == 0 or c == cycles:
            if len(drains) == 3:  # inject: lose the checkpoint once
                shutil.rmtree(ckpt, ignore_errors=True)
                ckpt_losses += 1
            w_before = replica.app_metadata_of()["cdc_last_applied_version"]
            t0 = time.time()
            q = sync_replica_stream(
                spark, p_path, r_path, "k",
                checkpoint_dir=ckpt, vacuum_keep_last=None,
            )
            q.awaitTermination()
            wall = time.time() - t0
            w_after = replica.app_metadata_of()["cdc_last_applied_version"]
            sp, sr = signature(primary), signature(replica)
            drains.append(
                {
                    "cycle": c,
                    "commits_caught_up": w_after - w_before,
                    "replayed_from_watermark": len(drains) == 3,
                    "match": sp == sr,
                    "wall_s": round(wall, 1),
                }
            )
            print(json.dumps(drains[-1]), file=sys.stderr)

    final = spark.createDataFrame([], "k long")  # placeholder
    pr, rr = primary.read(spark), replica.read(spark)
    diff = pr.exceptAll(rr).count() + rr.exceptAll(pr).count()
    out = {
        "metric": "stream_replication_convergence",
        "rows": rows,
        "cycles": cycles,
        "drain_every": drain_every,
        "drains": len(drains),
        "checkpoint_losses_injected": ckpt_losses,
        "all_drains_matched": all(d["match"] for d in drains),
        "final_diff_rows": diff,
        "primary_version": primary.current_version(),
        "replica_watermark": replica.app_metadata_of()[
            "cdc_last_applied_version"
        ],
        "wall_s": round(time.time() - t_all, 1),
        "per_drain": drains,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0 if out["all_drains_matched"] and diff == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
