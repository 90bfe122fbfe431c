"""Benchmark harness — runs the headline query set and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Scale dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
cores from $SPARK_GRAFT_CPUS (default 32).  Each query is timed to
full materialization (count of the action's result set) after a
warm-up of the session JVM.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from airflow_embeddings_pipeline_spark.plans import get_catalog
    from airflow_embeddings_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    catalog = get_catalog()
    bench_queries = {n: q for n, q in catalog.items() if q.bench}

    # The headline metric sums the SAME 13 queries recorded in
    # BENCH_r01 so round-over-round values stay comparable; the
    # per-query map below covers the full (growing) bench set.
    headline = [
        "j_asof_attribution", "q1_pricing_summary", "q3_top_orders",
        "q5_nation_revenue", "q6_forecast_revenue", "q10_returned_customers",
        "j_salted_skew_join", "flagship_merge_pipeline", "pipeline_e2e_merge",
        "j_broadcast_dim", "x_cosine_topk", "x_cosine_topk_blocked",
        "x_ann_ivf",
    ]

    # Warm up: JVM + codegen via a trivial action, and the physical
    # layout cache (one-time re-chunk of single-row-group fixture files
    # — the engine's ingest step) so per-query numbers measure the
    # plan, not session start or first-touch ingest.
    from airflow_embeddings_pipeline_spark.schemas import FIXTURE_TABLES
    from airflow_embeddings_pipeline_spark.sources.registry import load_table

    for t in FIXTURE_TABLES:
        load_table(spark, sf_dir, t)
    # Warm the noop committer + a first whole-stage-codegen compile so
    # the first timed query doesn't absorb one-time session cost.
    warm_df = next(iter(bench_queries.values())).build(spark, sf_dir).limit(1)
    warm_df.write.format("noop").mode("overwrite").save()

    # I/O-dimension host probe (r7 lesson: the CPU probes below agreed
    # across three runs while scan-bound headline walls doubled — the
    # host drift lives in the I/O/page-cache dimension they don't
    # touch).  Full materialization of the staged lineitem through the
    # parquet reader (noop sink reads EVERY column — a count() would
    # prune the scan to metadata): first run recorded as "cold"
    # (first-touch in this process), median-of-3 after as "warm".  The
    # headline is also emitted normalized by the warm probe so
    # round-over-round comparisons cancel host scan speed.
    li = load_table(spark, sf_dir, "lineitem")
    scan_runs = []
    for _ in range(4):
        t0 = time.perf_counter()
        li.write.format("noop").mode("overwrite").save()
        scan_runs.append(round(time.perf_counter() - t0, 3))
    scan_cold = scan_runs[0]
    scan_warm = round(sorted(scan_runs[1:])[1], 3)

    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        # median-of-3: single-tenant wall clock on a shared host is noisy
        # (observed ±40% machine-level variance); the median absorbs both
        # a first-touch outlier (codegen compile, page-cache miss) and a
        # one-off noise spike without min-of-N's optimistic bias.
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = q.build(spark, sf_dir)
            # noop sink: forces every column of every row to materialize
            # (count() would let Catalyst prune the expensive expressions).
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    # Host-speed probe: rounds run on different VMs and the observed
    # machine-level variance is large (r7 measured a uniform 1.4-1.8x
    # slowdown vs r6 on queries untouched for rounds, idle host both
    # times).  Two single-core probes — a pure-Python loop (driver-side
    # speed) and a numpy matmul (BLAS/SIMD speed) — let round-over-round
    # comparisons separate host drift from plan regressions: if the
    # headline moved but headline/host_probe did not, the host moved.
    import numpy as _np

    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc += i
    py_probe = round(time.perf_counter() - t0, 3)
    a = _np.random.default_rng(0).standard_normal((1200, 1200))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a * 1e-3
    np_probe = round(time.perf_counter() - t0, 3)

    headline_wall = round(sum(timings[n] for n in headline), 3)

    # Per-query regression tripwire (r8 lesson: the driver host ran
    # 2.5x slower I/O than the builder's and three CPU-bound queries
    # looked regressed until a by-hand git-diff + probe reading
    # cleared them).  A single normalization is NOT host-proof — the
    # warm scan probe itself varies ~2.5x across hosts while CPU-bound
    # walls barely move, so either axis alone false-positives on a
    # host change.  A query is flagged only when BOTH exceed 1.5x
    # their best prior recorded round: the RAW wall (best across all
    # rounds) AND the probe-normalized wall (best across probe-
    # carrying rounds).  A true plan regression raises both; a host
    # change raises at most one.
    here = os.path.dirname(os.path.abspath(__file__))
    best_raw: dict[str, float] = {}
    best_norm: dict[str, float] = {}
    import glob as _glob

    for p in sorted(_glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                rec = json.load(f).get("parsed") or {}
            probe = rec.get("host_probe_scan_warm_sec")
            for n, w in (rec.get("queries") or {}).items():
                if n not in best_raw or w < best_raw[n]:
                    best_raw[n] = w
                if probe:
                    norm = w / probe
                    if n not in best_norm or norm < best_norm[n]:
                        best_norm[n] = norm
        except (OSError, ValueError):
            continue
    queries_norm = (
        {n: round(w / scan_warm, 2) for n, w in timings.items()}
        if scan_warm
        else {}
    )
    # the final host-proofing step: hosts drift UNIFORMLY (r7 measured
    # 1.4-1.8x across every untouched query; this round's probe moved
    # 2.6x while CPU walls held) — so the signal is a query whose
    # drift is an OUTLIER against the same run's fleet.  drift =
    # median per-query ratio vs best prior; flag only queries > 1.5x
    # the median drift on BOTH axes.
    import statistics as _stats

    ratios_raw = {
        n: timings[n] / best_raw[n]
        for n in timings
        if best_raw.get(n)
    }
    ratios_norm = {
        n: queries_norm[n] / best_norm[n]
        for n in queries_norm
        if best_norm.get(n)
    }
    drift_raw = _stats.median(ratios_raw.values()) if ratios_raw else 1.0
    drift_norm = (
        _stats.median(ratios_norm.values()) if ratios_norm else 1.0
    )
    regressions = [
        {
            "query": n,
            "wall": timings[n],
            "best_prior_wall": round(best_raw[n], 3),
            "ratio_raw": round(ratios_raw[n], 2),
            "ratio_norm": round(ratios_norm[n], 2),
            "vs_fleet_raw": round(ratios_raw[n] / drift_raw, 2),
            "vs_fleet_norm": round(ratios_norm[n] / drift_norm, 2),
        }
        for n in timings
        if n in ratios_raw
        and n in ratios_norm
        and ratios_raw[n] > 1.5 * drift_raw
        and ratios_norm[n] > 1.5 * drift_norm
    ]

    # r12 measurement-harness fix (VERDICT r11 "What's wrong" #5): the
    # round-over-round PERF comparison died in r10 because the one-line
    # stdout JSON outgrew the driver's tail capture and `parsed` came
    # back empty.  stdout now carries ONE COMPACT line — the contract
    # fields (metric/value/unit/queries/sf) plus the scalar probes and
    # the tripwire verdicts — while the bulky derived maps
    # (queries_per_scan_probe, headline_queries) move to a stderr
    # diagnostics line.  No number changed; only where it is printed.
    payload = {
        "metric": "headline_suite_wall_sec",
        "value": headline_wall,
        "unit": "sec",
        "queries": timings,
        "full_suite_wall_sec": round(sum(timings.values()), 3),
        "host_probe_py_sec": py_probe,
        "host_probe_np_sec": np_probe,
        "host_probe_scan_cold_sec": scan_cold,
        "host_probe_scan_warm_sec": scan_warm,
        # host-drift-proof comparison metric: headline divided
        # by the warm staged-lineitem full-scan wall on the
        # SAME host/run (dimensionless; see BASELINE.md
        # "Host-normalized headline")
        "headline_per_scan_probe": round(
            headline_wall / scan_warm, 2
        ) if scan_warm else None,
        "host_drift_raw": round(drift_raw, 2),
        "host_drift_norm": round(drift_norm, 2),
        # tripwire verdicts: queries whose wall exceeds 1.5x the best
        # prior round's on BOTH the raw and the probe-normalized axis
        "regressions": regressions,
        "sf": sf,
    }
    print(
        "# diagnostics: "
        + json.dumps(
            {
                "headline_queries": headline,
                # per-query probe-normalized walls (recomputable as
                # queries[n] / host_probe_scan_warm_sec)
                "queries_per_scan_probe": queries_norm,
            }
        ),
        file=sys.stderr,
    )
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
