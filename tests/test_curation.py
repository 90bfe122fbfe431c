"""Curation operator semantics: decontamination flags exact benchmark
copies, stratified sampling respects per-stratum hash rates, and int8
quantization error stays within the half-step bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.sources.registry import load_table


def test_decontaminate_flags_benchmark_copy(spark, tmp_path):
    """A doc that is an exact copy of a benchmark doc must come out
    contaminated; unrelated docs must not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = {
        "doc_id": [97, 1, 2],  # 97 % 97 == 0 → benchmark member
        "text": [
            bench_text,
            bench_text,  # exact copy → 100% 3-gram overlap
            "one two three four five six seven eight nine ten",
        ],
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
        "n_chars": [len(bench_text), len(bench_text), 47],
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    from airflow_embeddings_pipeline_spark.extensions.curation_queries import (
        x_decontaminate,
    )

    out = {r["doc_id"]: r.asDict() for r in x_decontaminate(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}  # benchmark doc itself excluded
    assert out[1]["contaminated"] == 1 and out[1]["n_matched"] == out[1]["n_grams"]
    assert out[2]["contaminated"] == 0 and out[2]["n_matched"] == 0


def test_stratified_sample_rates(spark, sf_dir):
    """Per-language sample fractions must track the configured per-mille
    rates (hash buckets are uniform; fr keeps everything, zh ~10%)."""
    from airflow_embeddings_pipeline_spark.extensions.curation_queries import (
        _STRATA,
        x_stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r["lang"]: r["n"]
        for r in x_stratified_sample(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert kept.get("fr") == totals["fr"]  # rate 1000/1000 keeps all
    for lang, rate in _STRATA.items():
        frac = kept.get(lang, 0) / totals[lang]
        # ±4σ binomial tolerance at these counts
        import math

        p = rate / 1000
        tol = 4 * math.sqrt(p * (1 - p) / totals[lang]) if 0 < p < 1 else 0
        assert abs(frac - p) <= tol, (lang, frac, p)
    # determinism: second run identical
    a = sorted(r["doc_id"] for r in x_stratified_sample(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in x_stratified_sample(spark, sf_dir).collect())
    assert a == b


def test_quantize_error_bound(spark, sf_dir):
    """Symmetric int8 quantization: every reconstruction error must be
    ≤ scale/2 (+ float slack) — the defining property of round-to-
    nearest quantization."""
    from airflow_embeddings_pipeline_spark.extensions.curation_queries import (
        x_embedding_quantize,
    )

    rows = x_embedding_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["max_err"] <= r["qscale"] / 2 + 1e-6, r
        assert 0 <= r["mean_err"] <= r["max_err"] + 1e-9
