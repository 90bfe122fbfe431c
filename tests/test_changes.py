"""Unit coverage for the round-3 operator surface (plans/changes.py,
plans/timeseries.py, extensions/retrieval_queries.py,
extensions/corpus_stats_queries.py, and the round-3 additions to
dedup_queries/text_queries/multimodal_queries/streaming) beyond the
DuckDB oracle: semantic invariants the hash comparison can't express —
incremental-path == full-recompute equivalences, PQ/PPJoin recall and
losslessness, CDC delete semantics, leakage and interpolation bounds,
stream-stream == batch join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F


def _q(name):
    from airflow_embeddings_pipeline_spark.plans import get_catalog

    return get_catalog()[name]


def test_cdc_apply_drops_trailing_deletes(spark, sf_dir):
    out = _q("o_cdc_apply").build(spark, sf_dir).collect()
    assert out, "CDC apply produced no final state"
    assert all(r["op"] != "D" for r in out)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    # every surviving key is a real user; deleted keys are the gap
    assert 0 < len(out) <= n_users
    assert len({r["user_id"] for r in out}) == len(out), "duplicate keys in state"


def test_scd2_intervals_are_contiguous_per_user(spark, sf_dir):
    hist = _q("o_scd2_history").build(spark, sf_dir)
    # valid_to of version v == valid_from of version v+1; exactly one
    # open (current) interval per user
    w_bad = hist.alias("a").join(
        hist.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.version") + 1 == F.col("b.version"))
        & (F.col("a.valid_to") != F.col("b.valid_from")),
    )
    assert w_bad.count() == 0
    per_user = (
        hist.groupBy("user_id")
        .agg(F.sum("is_current").alias("open_intervals"))
        .filter(F.col("open_intervals") != 1)
    )
    assert per_user.count() == 0


def test_mv_refresh_equals_full_recompute(spark, sf_dir):
    from airflow_embeddings_pipeline_spark.plans.changes import (
        t_mv_incremental_refresh,
    )

    merged = t_mv_incremental_refresh(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = (
        ev.groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        )
        .withColumn("avg_value", F.round(F.col("sv").cast("double") / F.col("n_events"), 6))
        .withColumn("sum_value", F.round(F.col("sv").cast("double"), 6))
        .select("event_type", "day", "n_events", "sum_value", "avg_value")
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_runtime_range_prune_matches_unpruned_join(spark, sf_dir):
    pruned = _q("j_runtime_range_prune").build(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") < 5)
    )
    plain = (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("revenue"),
        )
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, plain.collect()))


def test_approx_percentile_rank_error_bound(spark, sf_dir):
    """Strict sketch contract: approx_percentile(accuracy=100) has rank
    error <= 1/100; check the returned value's true rank per group."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, 0.9, 100)").alias("ap"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    for r in rows:
        rank = li.filter(
            (F.col("l_returnflag") == r["l_returnflag"])
            & (F.col("l_extendedprice") <= r["ap"])
        ).count()
        assert abs(rank / r["n"] - 0.9) <= 0.011, (r["l_returnflag"], rank, r["n"])


def test_key_skew_stats_shares_and_ranks(spark, sf_dir):
    rows = _q("a_key_skew_stats").build(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert sum(r["share"] for r in rows) <= 1.0
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_bm25_rank_ordering_and_positivity(spark, sf_dir):
    rows = _q("x_bm25_retrieval").build(spark, sf_dir).collect()
    assert rows and all(r["bm25"] > 0 for r in rows)
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_fusion_bounds(spark, sf_dir):
    rows = _q("x_rrf_fusion").build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # each leg contributes at most 1/(60+1)
        assert 0 < r["rrf"] <= 2 / 61 + 1e-9
        assert r["lex_rank"] > 0 or r["sem_rank"] > 0


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    """PQ+ADC with an exact re-rank over k*10 candidates should keep
    recall@5 well above chance; assert >= 0.5 on the fixture corpus
    (deterministic codebooks, so this is a stable bound, not a flake)."""
    from airflow_embeddings_pipeline_spark.extensions.similarity_queries import (
        x_cosine_topk,
    )

    pq = _q("x_ann_pq").build(spark, sf_dir).select("query_id", "neighbor_id")
    exact = x_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hit = pq.join(exact, ["query_id", "neighbor_id"]).count()
    total = exact.count()
    assert total > 0
    assert hit / total >= 0.5, f"PQ recall@5 {hit}/{total}"


def test_pq_trained_recall_at_least_untrained(spark, sf_dir):
    """One deterministic Lloyd refinement of the codebooks must not
    lose recall@5 vs the seed codebooks (measured 0.725 → 0.825 at
    sf0.01; deterministic training makes this a stable bound)."""
    exact = _q("x_cosine_topk").build(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    total = exact.count()
    assert total > 0

    def recall(name: str) -> float:
        approx = _q(name).build(spark, sf_dir).select("query_id", "neighbor_id")
        return approx.join(exact, ["query_id", "neighbor_id"]).count() / total

    assert recall("x_ann_pq_trained") >= recall("x_ann_pq")


def test_pq_codes_are_compact(spark, sf_dir):
    """Every vector must encode to m codes in [0, ncents) — the 32x
    compression invariant (64 floats -> 8 byte-codes)."""
    from airflow_embeddings_pipeline_spark.extensions import retrieval_queries as rq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = _q("x_ann_pq").build(spark, sf_dir)
    assert out.count() > 0  # plan executes end-to-end
    assert rq._PQ_M * rq._PQ_SUBDIM == 64
    assert 0 <= rq._PQ_NCENTS <= 256  # one byte per code
    assert emb.select(F.min(F.size("embedding"))).first()[0] == 64


# ---------------------- corpus_stats_queries (budget/mixture/outliers/drift)


def test_token_budget_cut_matches_naive_global_window(spark, sf_dir):
    """The two-phase bucketed running total must equal the naive
    single-partition global-window plan exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from airflow_embeddings_pipeline_spark.extensions.corpus_stats_queries import (
        _BUDGET,
        x_token_budget_cut,
    )

    out = x_token_budget_cut(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split("text", " ")
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("quality"),
    )
    w = Window.orderBy(F.col("quality").desc(), "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    naive = (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _BUDGET)
        .select("doc_id", "quality", "n_tokens", "cum_tokens")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, naive.collect()))
    assert out.agg({"cum_tokens": "max"}).first()[0] <= _BUDGET


def test_temperature_mixture_flattens(spark, sf_dir):
    rows = _q("x_temperature_mixture").build(spark, sf_dir).collect()
    assert abs(sum(r["temp_weight"] for r in rows) - 1.0) < 1e-3
    by_share = sorted(rows, key=lambda r: r["share"])
    ups = [r["upsample_factor"] for r in by_share]
    # smaller share => larger (or equal) upsampling under temperature < 1
    assert all(a >= b - 1e-9 for a, b in zip(ups, ups[1:]))


def test_outlier_filter_bounds_sane(spark, sf_dir):
    rows = _q("x_outlier_filter").build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["lo"] <= r["hi"]
        assert 0 <= r["n_outliers"] <= r["n_docs"]


def test_embedding_drift_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    row = _q("x_embedding_drift").build(spark, sf_dir).first()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert row["n_a"] + row["n_b"] == emb.count()
    assert row["l2_mean_shift"] >= 0
    assert -1.0 <= row["mean_cosine"] <= 1.0
    assert row["mean_norm_a"] > 0 and row["mean_norm_b"] > 0


# ------------------- batch 3: z-order / histogram / checksum / setsim


def test_zorder_prefix_confines_both_dims(spark, sf_dir):
    """The data-skipping guarantee: one 6-bit z-prefix pins the top 3
    bits of BOTH interleaved keys, so every group spans <=32 values per
    dimension."""
    rows = _q("o_zorder_layout").build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["max_cb"] >> 5 == r["min_cb"] >> 5 == r["cb_hi"]
        assert r["max_db"] >> 5 == r["min_db"] >> 5 == r["db_hi"]
        assert r["max_cb"] - r["min_cb"] <= 31
        assert r["max_db"] - r["min_db"] <= 31


def test_histogram_conservation(spark, sf_dir):
    rows = _q("a_histogram").build(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert sum(r["n_rows"] for r in rows) == orders.count()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    los = [r["bin_lo"] for r in rows]
    assert los == sorted(los)


def test_checksum_reconcile_finds_exactly_corrupted_buckets(spark, sf_dir):
    from airflow_embeddings_pipeline_spark.plans.changes import (
        _CK_BUCKETS,
        _CK_CORRUPT_EVERY,
    )

    out = _q("j_checksum_reconcile").build(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = {
        r[0]
        for r in orders.filter(F.col("o_orderkey") % _CK_CORRUPT_EVERY == 0)
        .select((F.col("o_orderkey") % _CK_BUCKETS).cast("int"))
        .distinct()
        .collect()
    }
    assert {r["bucket"] for r in out} == expected
    # row counts agree everywhere — corruption is value-level, not row-level
    assert all(r["src_checksum"] != r["dst_checksum"] for r in out)


def test_setsim_prefix_filter_is_lossless(spark, sf_dir):
    """PPJoin completeness: the prefix-filtered join must return exactly
    the brute-force all-pairs Jaccard >= t result."""
    from airflow_embeddings_pipeline_spark.extensions.dedup import shingles
    from airflow_embeddings_pipeline_spark.extensions.dedup_queries import (
        _SSJ_T,
        _ssj_corpus,
    )

    corpus = _ssj_corpus(spark, sf_dir)
    fast = (
        _q("x_setsim_prefix_join")
        .build(spark, sf_dir)
        .select("id_a", "id_b", "jaccard")
    )
    sh = corpus.select("doc_id", shingles("text").alias("sh")).filter(
        F.size("sh") > 0
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _SSJ_T)
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, brute.collect()))


# ------------------- batch 4: time series / symspell / weighted sample


def test_interpolation_fills_between_anchors(spark, sf_dir):
    rows = _q("t_interpolate_linear").build(spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    some_interp = 0
    for series in by_user.values():
        series.sort(key=lambda r: r["d"])
        # contiguous day spine
        assert [r["d"] for r in series] == list(
            range(series[0]["d"], series[-1]["d"] + 1)
        )
        for i, r in enumerate(series):
            if r["src"] == "interp":
                some_interp += 1
                # interpolated value must lie between its anchors
                prev = next(
                    s for s in reversed(series[:i]) if s["src"] == "actual"
                )
                nxt = next(s for s in series[i + 1 :] if s["src"] == "actual")
                lo, hi = sorted((prev["value_filled"], nxt["value_filled"]))
                assert lo - 1e-6 <= r["value_filled"] <= hi + 1e-6
    assert some_interp > 0, "fixture has no gaps — test is vacuous"


def test_ohlc_bars_bounds(spark, sf_dir):
    rows = _q("t_ohlc_bars").build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]


def test_anomaly_zscore_warmup_and_flags(spark, sf_dir):
    rows = _q("t_anomaly_zscore").build(spark, sf_dir).collect()
    assert rows
    first_days = [r for r in rows if r["d"] == min(x["d"] for x in rows)]
    assert all(r["z"] is None and r["is_anomaly"] == 0 for r in first_days)
    flagged = [r for r in rows if r["is_anomaly"] == 1]
    for r in flagged:
        assert r["z"] is not None and abs(r["z"]) > 2.0


def test_symspell_finds_every_planted_corruption(spark, sf_dir):
    from airflow_embeddings_pipeline_spark.extensions.dedup_queries import (
        _SYM_ID_OFFSET,
    )

    rows = _q("x_symspell_fuzzy_join").build(spark, sf_dir).collect()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n_cust = cust.count()
    # completeness: each planted corruption (id+offset) is recovered by
    # its own original (distance <= 1 by construction)
    self_pairs = {
        (r["orig_id"], r["corrupt_id"])
        for r in rows
        if r["corrupt_id"] == r["orig_id"] + _SYM_ID_OFFSET
    }
    assert len(self_pairs) == n_cust
    assert all(r["distance"] <= 1 for r in rows)


def test_symspell_fast_tier_matches_string_tier(spark, sf_dir):
    """The hashed-candidate-key scale tier must return the string
    tier's exact rows — the lossless-by-exact-verify claim behind the
    shared oracle."""
    from pyspark.sql import functions as F

    from airflow_embeddings_pipeline_spark.extensions.dedup_queries import (
        symspell_fuzzy_join,
    )
    from airflow_embeddings_pipeline_spark.sources.registry import load_table

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = sorted(map(tuple, symspell_fuzzy_join(cust).collect()))
    b = sorted(map(tuple, symspell_fuzzy_join(cust, encode_ids=True).collect()))
    assert a == b and len(a) > 0


def test_setsim_persist_sets_parity(spark, sf_dir):
    """persist_sets caches the ordered-set representation (recompute
    bound fix) without changing a single output row."""
    from airflow_embeddings_pipeline_spark.extensions.dedup_queries import (
        _ssj_corpus,
        setsim_prefix_join,
    )

    corpus = _ssj_corpus(spark, sf_dir)
    a = sorted(map(tuple, setsim_prefix_join(corpus).collect()))
    b = sorted(
        map(tuple, setsim_prefix_join(corpus, persist_sets=True).collect())
    )
    assert a == b and len(a) > 0


def test_setsim_persist_auto_rule_and_release(spark, sf_dir):
    """persist_sets=None auto-decides by plan shape (persist iff the
    corpus subtree is recomputation-heavy), and the module-owned cache
    registry is bounded + releasable — no unbounded executor-storage
    accumulation across repeated calls in one session."""
    from airflow_embeddings_pipeline_spark.extensions.dedup_queries import (
        _SETSIM_CACHE,
        _plan_is_trivial,
        _ssj_corpus,
        release_setsim_cache,
        setsim_prefix_join,
    )
    from airflow_embeddings_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    # bare scan + filter + project: recomputes for free → no persist
    assert _plan_is_trivial(docs.select("doc_id", "text").filter("doc_id > 0"))
    # scan + orderBy: a Sort is recompute-cheap (and the operator
    # re-shuffles anyway) → still trivial, no persist (r7 verdict #7)
    assert _plan_is_trivial(
        docs.select("doc_id", "text").orderBy("doc_id")
    )
    # UNION ALL corpus: non-trivial → auto-persist
    assert not _plan_is_trivial(_ssj_corpus(spark, sf_dir))

    release_setsim_cache()
    out = setsim_prefix_join(_ssj_corpus(spark, sf_dir))  # auto mode
    assert len(_SETSIM_CACHE) == 1  # persist is eager: handle registered
    handle = _SETSIM_CACHE[0]
    assert handle.is_cached
    assert out.count() > 0
    assert release_setsim_cache() == 1
    assert not handle.is_cached and not _SETSIM_CACHE


def test_weighted_sample_is_deterministic_topk(spark, sf_dir):
    a = _q("x_weighted_sample").build(spark, sf_dir).collect()
    b = _q("x_weighted_sample").build(spark, sf_dir).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    keys = [r["es_key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    assert all(k < 0 for k in keys)  # ln(u)/w is negative


# ------------------- batch 5: PMI / entropy / BPE pairs / leakage split


def test_word_pmi_shape(spark, sf_dir):
    import math

    rows = _q("x_word_pmi").build(spark, sf_dir).collect()
    assert rows
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["ta"] < r["tb"]
        assert math.isfinite(r["pmi"])


def test_char_entropy_bounds(spark, sf_dir):
    import math

    rows = _q("x_char_entropy").build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 <= H <= ln(k) for k distinct symbols
        assert -1e-9 <= r["entropy"] <= math.log(r["distinct_chars"]) + 1e-9
        assert r["distinct_chars"] <= r["n_chars"]


def test_bpe_pairs_are_bigrams(spark, sf_dir):
    rows = _q("x_bpe_pair_stats").build(spark, sf_dir).collect()
    assert rows
    assert all(len(r["pair"]) == 2 for r in rows)
    assert 0 < sum(r["share"] for r in rows) <= 1.0


def test_leakage_safe_split_has_zero_leaks(spark, sf_dir):
    rows = _q("x_leakage_safe_split").build(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert all(r["leaked_groups"] == 0 for r in rows)
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(r["n_dup_docs"] >= 0 for r in rows)


# ------- batch 6: regression / rolling distinct / containment join


def test_grouped_regression_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = _q("a_grouped_regression").build(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pdf = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("x"),
        "value",
    ).toPandas()
    for r in rows:
        g = pdf[pdf.event_type == r["event_type"]]
        slope, intercept = np.polyfit(g.x, g.value, 1)
        assert abs(r["slope"] - slope) < 1e-4
        assert abs(r["intercept"] - intercept) < 1e-4
        assert 0 <= r["r2"] <= 1


def test_rolling_distinct_matches_direct(spark, sf_dir):
    rows = _q("t_rolling_distinct_users").build(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = ev.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    )
    for r in rows[:5] + rows[-3:]:
        direct = (
            days.filter(
                (F.col("d") >= r["d"] - 6) & (F.col("d") <= r["d"])
            )
            .select("user_id")
            .distinct()
            .count()
        )
        assert r["users_7d"] == direct, r
        assert r["users_1d"] <= r["users_7d"]


def test_containment_finds_every_planted_quote(spark, sf_dir):
    from airflow_embeddings_pipeline_spark.extensions.dedup_queries import (
        _CONT_ID_OFFSET,
        _CONT_STRIDE,
    )

    rows = _q("x_quote_containment_join").build(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_quotes = docs.filter(F.col("doc_id") % _CONT_STRIDE == 0).count()
    self_hits = {
        r["quote_id"]
        for r in rows
        if r["doc_id"] == r["quote_id"] - _CONT_ID_OFFSET
    }
    # each planted quote's shingles are a subset of its source doc's:
    # containment must be exactly 1.0 there
    assert len(self_hits) == n_quotes
    for r in rows:
        if r["doc_id"] == r["quote_id"] - _CONT_ID_OFFSET:
            assert r["containment"] == 1.0
        assert r["containment"] >= 0.8


def test_stream_stream_join_matches_batch(spark, sf_dir):
    from airflow_embeddings_pipeline_spark.streaming.queries import (
        t_stream_stream_join,
    )

    out = t_stream_stream_join(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("bu"), F.col("event_id").alias("buy_id"),
        F.col("ts").alias("bts"), F.col("value").alias("amount"),
    )
    batch = (
        v.join(
            b,
            (F.col("u") == F.col("bu"))
            & (F.col("bts") >= F.col("vts"))
            & (F.col("bts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            F.col("u").alias("user_id"), "view_id", "buy_id",
            (
                F.unix_micros(F.col("bts").cast("timestamp"))
                - F.unix_micros(F.col("vts").cast("timestamp"))
            ).alias("gap_us"),
            F.round("amount", 6).alias("amount"),
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_crossmodal_match_covers_every_media_row(spark, sf_dir):
    rows = _q("x_crossmodal_match").build(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r[0] for r in emb.select("label").distinct().collect()}
    assert sum(r["n"] for r in rows) == docs.count()
    assert {r["media_type"] for r in rows} <= {"image", "audio", "video"}
    assert all(r["label"] in labels for r in rows)


def test_minhash_estimator_statistics(spark, sf_dir):
    """Aggregate statistical contract for the k=32 estimator.  The
    affine permutation family is only approximately min-wise
    independent (see the catalog docstring), so individual pairs can
    exceed the iid 5-sigma envelope — the contract is aggregate: mean
    absolute error <= 0.1 and >= 90% of pairs within 0.25."""
    rows = _q("x_minhash_jaccard_estimate").build(spark, sf_dir).collect()
    assert rows
    errs = [abs(r["minhash_estimate"] - r["exact_jaccard"]) for r in rows]
    assert sum(errs) / len(errs) <= 0.1
    within = sum(r["within_gate"] for r in rows)
    assert within / len(rows) >= 0.9
    assert all(0.0 <= r["minhash_estimate"] <= 1.0 for r in rows)
