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


def test_sequence_pack_invariants(spark, sf_dir):
    """Contiguous-fill packing: offsets stay under the budget, spans are
    consistent with (offset, n_tokens), and each source's final cut
    covers exactly its total token count."""
    from airflow_embeddings_pipeline_spark.extensions.curation_queries import (
        _PACK_B,
        x_sequence_pack,
    )

    rows = x_sequence_pack(spark, sf_dir).collect()
    assert rows
    per_source_tokens: dict[str, int] = {}
    per_source_last: dict[str, int] = {}
    for r in rows:
        assert 0 <= r.seq_offset < _PACK_B
        expect_last = r.first_seq + (r.seq_offset + r.n_tokens - 1) // _PACK_B - (
            r.seq_offset // _PACK_B
        )
        assert r.last_seq == expect_last, r
        per_source_tokens[r.source] = per_source_tokens.get(r.source, 0) + r.n_tokens
        per_source_last[r.source] = max(per_source_last.get(r.source, -1), r.last_seq)
    for src, total in per_source_tokens.items():
        assert per_source_last[src] == (total - 1) // _PACK_B, src


def test_matryoshka_retention(spark, sf_dir):
    from airflow_embeddings_pipeline_spark.extensions.similarity_queries import (
        x_matryoshka_truncate,
    )

    rows = x_matryoshka_truncate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.retained_frac <= 1 + 1e-9
        assert r.u1 ** 2 + r.u2 ** 2 + r.u3 ** 2 <= 1 + 1e-6


def test_filtered_topk_respects_predicate(spark, sf_dir):
    from airflow_embeddings_pipeline_spark.extensions.similarity_queries import (
        _FILTER_LABELS,
        x_filtered_topk,
    )

    out = x_filtered_topk(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), "label"
    )
    labels = {r.label for r in out.join(emb, "neighbor_id").select("label").collect()}
    assert labels <= set(_FILTER_LABELS)


def test_unigram_logprob_bounds(spark, sf_dir):
    """Log-probs are negative; a doc of pure in-vocab tokens has
    mean_logprob ≥ the OOV floor; oov_frac ∈ [0, 1]."""
    from airflow_embeddings_pipeline_spark.extensions.text_queries import (
        x_unigram_logprob,
    )

    rows = x_unigram_logprob(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mean_logprob < 0
        assert 0.0 <= r.oov_frac <= 1.0


def test_semantic_join_row_count(spark, sf_dir):
    from airflow_embeddings_pipeline_spark.extensions.similarity_queries import (
        _SJ_K,
        _SJ_QUERIES,
        x_semantic_join,
    )

    rows = x_semantic_join(spark, sf_dir).collect()
    assert len(rows) == _SJ_QUERIES * _SJ_K
    assert all(r.snippet for r in rows)


def test_pii_scan_planted_patterns(spark, sf_dir):
    """Augmentation plants email/phone/IP deterministically by doc_id
    modulus; the scan must find exactly the planted counts and the
    scrub must shorten (or preserve) the text, never grow it."""
    from airflow_embeddings_pipeline_spark.extensions.curation_queries import (
        x_pii_scan,
    )

    rows = {r.doc_id: r for r in x_pii_scan(spark, sf_dir).collect()}
    assert rows
    for did, r in rows.items():
        assert r.n_emails == (1 if did % 3 == 0 else 0)
        assert r.n_phones == (1 if did % 5 == 0 else 0)
        assert r.n_ips == (1 if did % 7 == 0 else 0)
        assert r.has_pii == (1 if (r.n_emails + r.n_phones + r.n_ips) > 0 else 0)
    # doc 105 = 3·5·7 carries all three pattern classes
    if 105 in rows:
        r = rows[105]
        assert (r.n_emails, r.n_phones, r.n_ips) == (1, 1, 1)


def test_mixture_plan_budget_invariants(spark, sf_dir):
    """Rates are in (0, 1]; expected tokens never exceed the available
    inventory; the realized total never exceeds the budget except via
    sources capped at rate 1.0 (they contribute less than target)."""
    from airflow_embeddings_pipeline_spark.extensions.curation_queries import (
        _MIX_BUDGET_FRAC,
        x_mixture_plan,
    )

    rows = x_mixture_plan(spark, sf_dir).collect()
    assert rows
    total = sum(r.available_tokens for r in rows)
    budget = total * _MIX_BUDGET_FRAC
    for r in rows:
        assert 0.0 < r.sampling_rate <= 1.0
        assert r.expected_tokens <= r.available_tokens
        # per-source expectation never exceeds its uniform target unless
        # the source is abundant enough to hit it exactly
        assert r.expected_tokens <= r.target_tokens + 1
    assert sum(r.expected_tokens for r in rows) <= budget + len(rows)


def test_length_buckets_conservation(spark, sf_dir):
    """Bucket inventories conserve the corpus: doc and token totals
    match ungrouped counts; waste fraction stays in [0, 1); every doc's
    bucket bounds its token count."""
    from airflow_embeddings_pipeline_spark.extensions.curation_queries import (
        x_length_buckets,
    )
    from airflow_embeddings_pipeline_spark.sources.registry import load_table

    rows = x_length_buckets(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_tokens = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.real_tokens for r in rows) == n_tokens
    for r in rows:
        assert 0.0 <= r.padding_waste < 1.0
        assert r.real_tokens <= r.padded_tokens
