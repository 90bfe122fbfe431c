"""CDC replication stress: changes_since + apply_changes as a daily
consumer loop, with crash/replay delivery faults injected.

The reference's downstream consumers read Snowflake table streams off
the MERGE target and advance the stream offset transactionally with
the consumption (embeddings-pipeline.py:294-352, 480).  The engine's
loop is:

    producer (per cycle): daily-shaped file-pruned MERGE on the PRIMARY
        (1k updates alternating narrow/moderate spread, 2k inserts, and
        every 7th cycle a 300-key delete tombstone batch)
    consumer (per cycle): sync_replica(primary, replica) — watermark
        read from the REPLICA's app_metadata (recorded atomically with
        each apply), feed exported with changes_since, applied as ONE
        file-pruned merge.

Fault injection (default, sink-watermark mode): every ``crash_every``-th
cycle the consumer's feed is DELIVERED TWICE (a consumer that computed
and applied a feed, died before acking its trigger, and re-ran) — the
duplicate apply must be a content no-op and must not advance or regress
the stored watermark.

``--naive`` runs the historically-broken design for the record: the
watermark in a SIDE FILE advanced after the apply, with the crash
injected between them.  This mode is EXPECTED TO DIVERGE: when a crash
leaves the side watermark behind and a later producer cycle deletes
rows a crashed-but-applied feed inserted, the replayed NET feed nets
insert+delete to NOTHING, stranding the deleted rows on the replica
forever (first observed live at cycle 21 of this tool's original run).
The tool reports the divergence cycle instead of asserting.

Asserted EVERY cycle (sink mode): replica content signature == primary
content signature (sum of xxhash64 over all columns — order-free).

Also probed at the end: the vacuum fence — when the producer's vacuum
reclaims the consumer's watermark version, changes_since must fail
LOUDLY (FileNotFoundError), never silently emit a partial feed; the
recovery is a replica re-seed, same as a stale streaming checkpoint.

Usage:
    python tools/stress_cdc_replication.py [n_rows] [cycles] [out_json] [--naive]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.operators.merge import (
    apply_changes,
    merge_upsert_write_pruned,
    sync_replica,
)
from airflow_embeddings_pipeline_spark.sources.versioned import (
    VersionedParquetTable,
)


def read_wm(path: str) -> int:
    with open(path) as fh:
        return json.load(fh)["version"]


def write_wm(path: str, version: int) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, path)


def signature(df) -> int:
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    return (
        df.select(F.xxhash64(*cols).cast("decimal(38,0)").alias("h"))
        .agg(F.sum("h").alias("s"))
        .collect()[0]["s"]
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--naive"]
    naive = "--naive" in sys.argv[1:]
    n_rows = int(args[0]) if len(args) > 0 else 2_000_000
    cycles = int(args[1]) if len(args) > 1 else 30
    out_json = args[2] if len(args) > 2 else None
    crash_every = 5
    upd_keys, ins_keys, del_keys = 1_000, 2_000, 300

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="cdc_repl_")
    p_path, r_path = os.path.join(base, "primary"), os.path.join(base, "replica")
    wm_path = os.path.join(base, "watermark.json")

    snap = spark.range(n_rows).select(
        F.col("id").alias("k"),
        F.concat(F.lit("ref-"), F.col("id")).alias("ref"),
        (F.col("id") % 100).cast("int").alias("cat"),
    )
    primary = VersionedParquetTable(p_path)
    v0 = primary.commit_with_manifest(snap, "k", cluster_partitions=32)
    # zero-copy seed: hardlink CLONE with the CDC watermark recorded in
    # the clone commit itself — no second snapshot write
    replica = VersionedParquetTable(r_path)
    primary.clone_to(r_path)
    write_wm(wm_path, v0)

    max_k = n_rows  # next insert key; advances each cycle
    records: list[dict] = []
    diverged_at = None
    for c in range(1, cycles + 1):
        # ---- producer: daily-shaped merge on the primary
        if c % 2 == 1:
            lo = (c * 37) % (n_rows - upd_keys)
            upd = spark.range(lo, lo + upd_keys)
            shape = "narrow"
        else:
            stride = max(1, n_rows // 10 // upd_keys)
            lo = (c * 91) % (n_rows // 2)
            upd = spark.range(upd_keys).select(
                (F.lit(lo) + F.col("id") * stride).alias("id")
            )
            shape = "moderate"
        src = upd.select(
            F.col("id").alias("k"),
            F.concat(F.lit(f"upd-{c}-"), F.col("id")).alias("ref"),
            F.lit(-c).cast("int").alias("cat"),
        ).unionAll(
            spark.range(max_k, max_k + ins_keys).select(
                F.col("id").alias("k"),
                F.concat(F.lit(f"ins-{c}-"), F.col("id")).alias("ref"),
                F.lit(c).cast("int").alias("cat"),
            )
        )
        delete_when = None
        if c % 7 == 0:
            # tombstone a slice of the PREVIOUS cycle's inserts
            dlo = max_k - ins_keys
            src = src.unionAll(
                spark.range(dlo, dlo + del_keys).select(
                    F.col("id").alias("k"),
                    F.lit("tombstone").alias("ref"),
                    F.lit(-999).cast("int").alias("cat"),
                )
            )
            delete_when = F.col("s.cat") == -999
            shape += "+delete"
        max_k += ins_keys
        merge_upsert_write_pruned(
            p_path, src, "k", delete_when=delete_when, vacuum_keep_last=None
        )

        # ---- consumer
        t0 = time.time()
        fault = c % crash_every == 0 and c != cycles
        if naive:
            # side-file watermark, advance AFTER apply; crash = die in
            # the applied-but-not-advanced window
            w = read_wm(wm_path)
            feed = primary.changes_since(spark, w)
            stats = apply_changes(r_path, feed, "k", vacuum_keep_last=None)
            if not fault:
                write_wm(wm_path, primary.current_version())
        else:
            stats = sync_replica(spark, p_path, r_path, "k",
                                 vacuum_keep_last=None)
            wm_before = replica.app_metadata_of()["cdc_last_applied_version"]
            if fault:
                # duplicate delivery: the same round re-runs in full
                dup = sync_replica(spark, p_path, r_path, "k",
                                   vacuum_keep_last=None)
                assert dup["rows_upserted"] == 0 and dup["rows_deleted"] == 0, (
                    f"cycle {c}: duplicate delivery re-applied rows: {dup}"
                )
                wm_after = replica.app_metadata_of()["cdc_last_applied_version"]
                assert wm_after == wm_before, (
                    f"cycle {c}: duplicate delivery moved watermark "
                    f"{wm_before} -> {wm_after}"
                )
        wall = round(time.time() - t0, 2)

        sig_p = signature(primary.read(spark))
        sig_r = signature(replica.read(spark))
        rec = {
            "cycle": c,
            "shape": shape,
            "consumer_wall_s": wall,
            "feed_upserted": stats["rows_upserted"],
            "feed_deleted": stats["rows_deleted"],
            "replica_files_touched": stats.get("files_touched"),
            "replica_bytes_rewritten": stats.get("bytes_rewritten"),
            "fault_injected": fault,
            "sig_match": sig_p == sig_r,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if not rec["sig_match"]:
            diverged_at = c
            if naive:
                print(json.dumps({
                    "naive_divergence": {
                        "cycle": c,
                        "explanation": (
                            "side-file watermark crash window: a replayed "
                            "net feed netted an already-applied insert "
                            "against a later delete into nothing — the "
                            "deleted rows are stranded on the replica"
                        ),
                    }
                }), flush=True)
                break
            raise AssertionError(f"cycle {c}: replica diverged from primary")

    # ---- vacuum fence: advance the primary 3 commits past the
    # consumer's watermark, vacuum them away, expect a LOUD failure
    fence = None
    if not naive:
        for i in range(3):
            merge_upsert_write_pruned(
                p_path,
                spark.range(max_k + i, max_k + i + 1).select(
                    F.col("id").alias("k"),
                    F.lit("post").alias("ref"),
                    F.lit(0).cast("int").alias("cat"),
                ),
                "k",
                vacuum_keep_last=None,
            )
        primary.vacuum(keep_last=2)
        try:
            sync_replica(spark, p_path, r_path, "k")
            fence = "MISSED (silent sync off a vacuumed watermark)"
        except FileNotFoundError as e:
            fence = f"fenced: {e}"
        print(json.dumps({"vacuum_fence": fence}), flush=True)

    tail5 = records[-5:]
    summary = {
        "mode": "naive-side-file" if naive else "sink-watermark",
        "n_rows": n_rows,
        "cycles_run": len(records),
        "faults_injected": sum(r["fault_injected"] for r in records),
        "sig_matches": sum(r["sig_match"] for r in records),
        "diverged_at": diverged_at,
        "consumer_wall_first5": round(
            sum(r["consumer_wall_s"] for r in records[:5]) / 5, 2
        ),
        "consumer_wall_last5": round(
            sum(r["consumer_wall_s"] for r in tail5) / len(tail5), 2
        ),
        "replica_bytes_rewritten_mean": round(
            sum(r["replica_bytes_rewritten"] for r in records) / len(records)
        ),
        "vacuum_fence": fence,
    }
    print(json.dumps({"summary": summary}), flush=True)
    if out_json:
        with open(out_json, "w") as fh:
            json.dump({"records": records, "summary": summary}, fh, indent=1)
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
