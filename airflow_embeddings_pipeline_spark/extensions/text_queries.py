"""Oracle-checked catalog entries for the text-analysis operators (X4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query, register
from ..sources.registry import load_table
from ..functions.ranking import single_group
from .text import (
    EN_STOPWORDS,
    bpe_ish_tokens,
    fingerprint,
    lang_id,
    quality_features,
    token_count,
    tokens,
)

_SW = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


# ------------------------------------------------------------ token stats
def x_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        token_count("text").alias("n_tokens"),
        F.size(F.array_distinct(tokens("text"))).alias("n_distinct_tokens"),
        F.size(bpe_ish_tokens("text")).alias("n_bpe_tokens"),
    ).orderBy("doc_id")


# same GPT-2-style pre-tokenizer regex; DuckDB's RE2 and Spark's Java
# regex agree on this subset (non-capturing group, classes, runs)
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"

register(
    Query(
        name="x_token_stats",
        build=x_token_stats,
        oracle=f"""
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
               len(regexp_extract_all(text, '{_BPE_RE.replace(chr(39), chr(39) * 2)}')) AS n_bpe_tokens
        FROM documents ORDER BY doc_id
        """,
        doc="token counting over documents: whitespace + BPE-ish regex pre-tokenizer (X4)",
        bench=True,
        tags=("X4",),
    )
)


# ---------------------------------------------------------------- lang id
def x_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", lang_id("text").alias("predicted_lang")
    )
    return (
        scored.groupBy("source", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "predicted_lang")
    )


register(
    Query(
        name="x_lang_id",
        build=x_lang_id,
        oracle=f"""
        WITH scored AS (
            SELECT doc_id, source,
                   CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN ({_SW})))
                             / (CASE WHEN len(string_split(text, ' ')) > 0
                                     THEN len(string_split(text, ' ')) ELSE 1 END)
                             >= 0.04
                        THEN 'en' ELSE 'unk' END AS predicted_lang
            FROM documents
        )
        SELECT source, predicted_lang, count(*) AS n_docs
        FROM scored GROUP BY source, predicted_lang
        ORDER BY source, predicted_lang
        """,
        doc="stopword-density language-ID heuristic (X4)",
        bench=True,
        tags=("X4",),
    )
)


# ---------------------------------------------------------- quality score
def x_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features("text")
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["distinct_ratio"].alias("distinct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["mean_token_len"].alias("mean_token_len"),
    ).orderBy("doc_id")


register(
    Query(
        name="x_quality_score",
        build=x_quality_score,
        oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks,
                   length(text) AS n_chars
            FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               round(len(list_distinct(toks))
                     / (CASE WHEN len(toks) > 0 THEN len(toks) ELSE 1 END), 6) AS distinct_ratio,
               round(len(list_filter(toks, x -> x IN ({_SW})))
                     / (CASE WHEN len(toks) > 0 THEN len(toks) ELSE 1 END), 6) AS stopword_ratio,
               round((n_chars - (len(toks) - 1))
                     / (CASE WHEN len(toks) > 0 THEN len(toks) ELSE 1 END), 6) AS mean_token_len
        FROM t ORDER BY doc_id
        """,
        doc="quality-scoring features: token/distinct/stopword ratios (X4)",
        tags=("X4",),
    )
)


# ------------------------------------------------------------- fingerprint
def x_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint("text").alias("fingerprint"))
        .orderBy("doc_id")
    )


register(
    Query(
        name="x_fingerprint",
        build=x_fingerprint,
        oracle=r"""
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
        FROM documents ORDER BY doc_id
        """,
        doc="content-hash document fingerprint (X4/X1 key)",
        tags=("X4", "X1"),
    )
)


# ---------------------------------------------------------- word frequency
def x_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


register(
    Query(
        name="x_word_frequency",
        build=x_word_frequency,
        oracle="""
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 20
        """,
        doc="explode + global word frequency top-k (X4)",
        tags=("X4",),
    )
)


# ------------------------------------------------------ winnowing sketch
def x_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import rolling_kgram_hashes, winnow_from_hashes

    docs = load_table(spark, sf_dir, "documents")
    # two projections: materialize the rolling-hash array, THEN winnow
    # — inlining would re-hash the document once per window (O(n²)).
    hashed = docs.select(
        "doc_id", rolling_kgram_hashes("text").alias("__h")
    )
    return (
        hashed.select(
            "doc_id", winnow_from_hashes(F.col("__h")).alias("__fp")
        )
        .select(
            "doc_id",
            # serialized for the driver comparator (it cannot hash
            # list-valued cells — the round-1 harness failure mode)
            F.concat_ws(",", F.transform("__fp", lambda x: x.cast("string"))).alias(
                "fingerprints"
            ),
            F.size("__fp").alias("n_fingerprints"),
        )
        .orderBy("doc_id")
    )


from .text import (  # noqa: E402
    rolling_kgram_hashes_sql as _rh_sql,
    winnow_from_hashes_sql as _wf_sql,
)

register(
    Query(
        name="x_winnow_fingerprint",
        build=x_winnow_fingerprint,
        oracle=f"""
        WITH hashed AS MATERIALIZED (
            SELECT doc_id, {_rh_sql('text')} AS h FROM documents
        ), fp AS MATERIALIZED (
            SELECT doc_id, {_wf_sql('h')} AS fps FROM hashed
        )
        SELECT doc_id,
               array_to_string(fps, ',') AS fingerprints,
               len(fps) AS n_fingerprints
        FROM fp ORDER BY doc_id
        """,
        doc="rolling-hash winnowing sketch (k-gram rolling hashes, per-window min; Schleimer 2003)",
        bench=True,
        tags=("X4", "X2", "rolling-hash"),
    )
)


# ------------------------------------------------- repetition stats
# Gopher/C4-style repetition quality signals: duplicate word-bigram
# fraction (HOF arithmetic, map-only) and most-frequent-token mass
# (explode + two codegen'd aggregations — the distributed form of a
# per-doc mode; scales as one shuffle on (doc, token)).
def x_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    n_tok = token_count("text")
    base = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.when(
            n_tok > 1,
            F.round(
                1 - F.size(shingles("text", 2)) / (n_tok - 1).cast("double"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )
    tok_counts = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.round(F.max("count") / F.sum("count").cast("double"), 6).alias(
                "top_token_frac"
            )
        )
    )
    return (
        base.join(tok_counts, "doc_id")
        .select("doc_id", "n_tokens", "dup_bigram_frac", "top_token_frac")
        .orderBy("doc_id")
    )


from ..extensions.dedup import shingles_sql as _sh2  # noqa: E402

register(
    Query(
        name="x_repetition_stats",
        build=x_repetition_stats,
        oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   CASE WHEN len(string_split(text, ' ')) > 1
                        THEN round(1 - len({_sh2('text', 2)}) /
                             CAST(len(string_split(text, ' ')) - 1 AS DOUBLE), 6)
                        ELSE 0.0 END AS dup_bigram_frac
            FROM documents
        ), tok AS (
            SELECT doc_id, t AS tok, count(*) AS n
            FROM documents, unnest(string_split(text, ' ')) AS u(t)
            GROUP BY doc_id, t
        ), top AS (
            SELECT doc_id, round(max(n) / CAST(sum(n) AS DOUBLE), 6) AS top_token_frac
            FROM tok GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tokens, b.dup_bigram_frac, t.top_token_frac
        FROM base b JOIN top t USING (doc_id)
        ORDER BY doc_id
        """,
        doc="repetition quality signals: duplicate-bigram fraction + top-token mass (X4; Gopher-style filters)",
        tags=("X4",),
    )
)


# ------------------------------------------------- hash-based splits
# Deterministic train/valid/test assignment: bucket = md5(doc_id) mod
# 100 → 80/10/10.  Hash-keyed splits are THE training-data split
# mechanism at scale — stable under reprocessing and shard order,
# no RNG state, no shuffle beyond the final counts, and any engine
# (here: the DuckDB oracle) reproduces the exact same membership.
def x_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), token_count("text").alias("n_tok"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .orderBy("split")
    )


register(
    Query(
        name="x_hash_split",
        build=x_hash_split,
        oracle="""
        WITH assigned AS (
            SELECT CASE
                     WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                     WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                     ELSE 'test'
                   END AS split,
                   len(string_split(text, ' ')) AS n_tok
            FROM documents
        )
        SELECT split, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM assigned GROUP BY split ORDER BY split
        """,
        doc="deterministic hash-keyed train/valid/test split (80/10/10) with per-split token mass (X4; training-data op)",
        tags=("X4", "sampling"),
    )
)


# ---------------------------------------------------- tf-idf top terms
# Corpus-weighted term importance: tf (per-doc token counts) × idf
# (ln(N/df) over per-term document frequency), top-3 terms per doc.
# Three codegen'd aggregations + one window — tf and df are both
# map-side-combinable, the df table is small (vocabulary) and
# broadcast back onto the tf table.  Weights rounded before ranking
# with term tiebreaks so ordering is engine-independent.
def x_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # N as a 1-row broadcast (the engine's scalar-statistic pattern)
    # instead of a driver count() action: one scan of documents, one
    # plan — no second pass over the input for the IDF numerator.
    nd = docs.agg(F.count("*").alias("n_docs"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), "term")
    return (
        # df_tbl spans the VOCABULARY -- corpus-entropy-scaling, so no
        # forced broadcast (billions of distinct tokens on a web corpus
        # would blow the 8 GB limit); AQE broadcasts at fixture scale
        tf.join(df_tbl, "term")
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("weight"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "weight", "rank")
        .orderBy("doc_id", "rank")
    )


register(
    Query(
        name="x_tfidf_top_terms",
        build=x_tfidf_top_terms,
        oracle="""
        WITH tf AS (
            SELECT doc_id, t AS term, count(*) AS tf
            FROM documents, unnest(string_split(text, ' ')) AS u(t)
            GROUP BY doc_id, t
        ), df AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), n AS (
            SELECT count(*) AS n_docs FROM documents
        ), weighted AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS weight
            FROM tf JOIN df USING (term) CROSS JOIN n
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY weight DESC, term) AS rank
            FROM weighted
        )
        SELECT doc_id, term, weight, rank
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
        """,
        doc="TF-IDF top-3 terms per document: tf x ln(N/df), broadcast vocabulary join (X4)",
        tags=("X4",),
    )
)


# ------------------------------------------------- document chunking
# Split-before-embed: overlapping token windows (32 tokens, stride 24)
# per document, exploded to one row per chunk.  Map-only (the chunk
# array is a codegen'd expression; explode adds no shuffle) — at
# corpus scale chunking is embarrassingly parallel and this plan keeps
# it that way.  Chunk text hashed rather than emitted raw to keep the
# driver-comparator payload small.
def x_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import chunk_tokens

    docs = load_table(spark, sf_dir, "documents")
    chunked = docs.select(
        "doc_id",
        F.explode(chunk_tokens("text", window=32, stride=24)).alias("c"),
    )
    return chunked.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.md5(F.col("c.chunk_text")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_id")


register(
    Query(
        name="x_chunk_documents",
        build=x_chunk_documents,
        oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), chunks AS (
            SELECT doc_id,
                   CAST(i AS INTEGER) AS chunk_id,
                   array_to_string(t[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text,
                   CAST(least(len(t) - i * 24, 32) AS INTEGER) AS n_tokens
            FROM toks,
                 unnest(range(CASE WHEN len(t) <= 32 THEN 1
                              ELSE CAST(ceil((len(t) - 32) / 24.0) AS BIGINT) + 1
                              END)) AS u(i)
        )
        SELECT doc_id, chunk_id, n_tokens, md5(chunk_text) AS chunk_hash
        FROM chunks ORDER BY doc_id, chunk_id
        """,
        doc="overlapping token-window chunking (32/stride 24), one row per chunk, map-only (X4; split-before-embed)",
        tags=("X4", "chunking"),
    )
)


# ------------------------------------------------- unigram LM scoring
# CCNet-style language-model quality score, with the LM trained on the
# corpus itself: top-V unigram log-probabilities, out-of-vocabulary
# floored at ln(1/total).  Two classic shuffles — the wordcount and the
# per-doc mean — both map-side combined; the vocabulary is capped at V
# rows (TakeOrdered, no full sort) and broadcast into the scoring join.
# Log-probs are rounded to 9dp and summed as DECIMAL so the per-doc
# mean is order-independent and bit-identical across engines (float
# sums over shuffled rows are not).
_LM_V = 500  # vocabulary cap


def x_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    # r11: one word-count pass feeds BOTH the vocabulary and the total
    # (total token count == exact integer sum of all per-word counts),
    # instead of exploding the corpus separately for each.  The
    # materialized intermediate is the vocabulary-sized count table —
    # the thing an LM-scoring pipeline persists at 100 TB — not the
    # exploded corpus.
    wc = (
        toks.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = wc.agg(F.sum("cnt").alias("tot"))
    vocab = wc.orderBy(F.desc("cnt"), "w").limit(_LM_V)
    lp = F.round(F.log(F.col("cnt") / F.col("tot")), 9).cast("decimal(18,9)")
    lp_oov = F.round(F.log(F.lit(1.0) / F.col("tot")), 9).cast("decimal(18,9)")
    scored = (
        toks.join(F.broadcast(total))
        .join(F.broadcast(vocab), "w", "left")
        .select(
            "doc_id",
            F.coalesce(lp, lp_oov).alias("lp"),
            F.col("cnt").isNull().cast("long").alias("oov"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("lp").cast("double") / F.count("*"), 6).alias("mean_logprob"),
            F.round(F.sum("oov") / F.count("*"), 6).alias("oov_frac"),
        )
        .orderBy("doc_id")
    )


register(
    Query(
        name="x_unigram_logprob",
        build=x_unigram_logprob,
        oracle=f"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ), total AS (
            SELECT count(*) AS tot FROM toks
        ), vocab AS MATERIALIZED (
            SELECT w, count(*) AS cnt FROM toks GROUP BY w
            ORDER BY cnt DESC, w LIMIT {_LM_V}
        ), scored AS (
            SELECT t.doc_id,
                   COALESCE(
                       CAST(round(ln(v.cnt / total.tot), 9) AS DECIMAL(18,9)),
                       CAST(round(ln(1.0 / total.tot), 9) AS DECIMAL(18,9))
                   ) AS lp,
                   CASE WHEN v.cnt IS NULL THEN 1 ELSE 0 END AS oov
            FROM toks t CROSS JOIN total LEFT JOIN vocab v ON t.w = v.w
        )
        SELECT doc_id, count(*) AS n_tokens,
               round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS mean_logprob,
               round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_frac
        FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        doc=(
            "unigram-LM quality score (CCNet-style): capped-vocab "
            "log-probs, OOV floor, decimal-exact per-doc mean"
        ),
        tags=("X4", "curation"),
        bench=True,
    )
)


# ----------------------------------------------- bigram LM perplexity
# The KenLM-shaped quality filter one tier above the unigram score:
# add-one-smoothed conditional bigram log-probs with capped count
# tables.  Scale shape: the bigram/history tables are top-K capped
# (rare bigrams fall through to the smoothing floor, exactly what a
# pruned LM does), so both joins stay broadcasts no matter the corpus
# size; the only corpus-wide work is the pair explode + two hash aggs.
# Exact-integer counts + one rounded ln per row keep both engines
# bit-identical; the `size >= 2` guard matters because Spark's
# sequence(1, 0) counts DOWN while DuckDB's range(1, 1) is empty.
_LM2_TOP = 4000  # bigram-table cap
_LM2_HIST = 1000  # history-table cap


def x_bigram_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # tokenize ONCE behind a generator barrier — CollapseProject would
    # otherwise re-inline the split into each of its 4 uses below (the
    # explode(array(...)) trick used by the winnowing/LSH stages)
    toks = docs.select(
        "doc_id", F.explode(F.array(F.split("text", " "))).alias("t")
    )
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(1, size(t) - 1), "
                "i -> named_struct('a', t[i - 1], 'b', t[i])) "
                "ELSE array() END"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    # r11: one bigram-count pass feeds the pair counts, the first-token
    # histogram (c_a = Σ_b c_ab, exact integers) and the continuation
    # vocabulary (distinct b over the count table = distinct b over the
    # corpus) — the corpus was previously re-exploded for each.  The
    # materialized intermediate is the bigram count table itself, the
    # artifact an n-gram LM pipeline persists; localCheckpoint spills
    # to disk when it outgrows memory.
    wc = (
        bi.groupBy("a", "b")
        .agg(F.count("*").alias("c_ab"))
        .localCheckpoint(eager=True)
    )
    hist = (
        wc.groupBy("a")
        .agg(F.sum("c_ab").alias("c_a"))
        .orderBy(F.desc("c_a"), "a")
        .limit(_LM2_HIST)
    )
    pairs = wc.orderBy(F.desc("c_ab"), "a", "b").limit(_LM2_TOP)
    vsize = wc.agg(F.countDistinct("b").alias("v"))
    lp = F.round(
        F.log(
            (F.coalesce(F.col("c_ab"), F.lit(0)) + 1)
            / (F.coalesce(F.col("c_a"), F.lit(0)) + F.col("v"))
        ),
        9,
    ).cast("decimal(18,9)")
    scored = (
        bi.join(F.broadcast(vsize))
        .join(F.broadcast(hist), "a", "left")
        .join(F.broadcast(pairs), ["a", "b"], "left")
        .select("doc_id", lp.alias("lp"))
    )
    mean_lp = F.sum("lp").cast("double") / F.count("*")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(mean_lp, 6).alias("mean_logprob"),
            F.round(F.exp(-mean_lp), 4).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


register(
    Query(
        name="x_bigram_lm_logprob",
        build=x_bigram_lm_logprob,
        oracle=f"""
        WITH bi AS MATERIALIZED (
            SELECT doc_id, t[i] AS a, t[i + 1] AS b
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 unnest(range(1, len(t))) AS u(i)
            WHERE len(t) >= 2
        ), hist AS MATERIALIZED (
            SELECT a, count(*) AS c_a FROM bi GROUP BY a
            ORDER BY c_a DESC, a LIMIT {_LM2_HIST}
        ), pairs AS MATERIALIZED (
            SELECT a, b, count(*) AS c_ab FROM bi GROUP BY a, b
            ORDER BY c_ab DESC, a, b LIMIT {_LM2_TOP}
        ), vsize AS (
            SELECT count(DISTINCT b) AS v FROM bi
        ), scored AS (
            SELECT bi.doc_id,
                   CAST(round(ln((COALESCE(p.c_ab, 0) + 1)
                                 / CAST(COALESCE(h.c_a, 0) + vsize.v AS DOUBLE)),
                              9) AS DECIMAL(18,9)) AS lp
            FROM bi CROSS JOIN vsize
            LEFT JOIN hist h ON bi.a = h.a
            LEFT JOIN pairs p ON bi.a = p.a AND bi.b = p.b
        )
        SELECT doc_id, count(*) AS n_bigrams,
               round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS mean_logprob,
               round(exp(-(CAST(sum(lp) AS DOUBLE) / count(*))), 4) AS perplexity
        FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        doc=(
            "bigram-LM perplexity filter (KenLM-shaped): add-one-smoothed "
            "conditional log-probs over top-K-capped count tables, "
            "decimal-exact per-doc mean"
        ),
        tags=("X4", "curation"),
    )
)


# --------------------------------------------------- word PMI pairs
# Doc-level co-occurrence statistics → pointwise mutual information
# (the embedding-training prep signal): pairs of DISTINCT tokens per
# document, counts reduced globally, PMI = ln(c_ab·N / (c_a·c_b)) from
# exact integer counts (deterministic doubles).  The per-doc pair
# expansion is O(distinct_tokens²) — bounded by document length, the
# standard trade; posting-list co-occurrence (explode + self-join per
# doc_id) keeps it one shuffle.
_PMI_MIN_PAIRS = 25
_PMI_TOPK = 30


def x_word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("t")
    )
    # N as a 1-row broadcast, not a driver count() action (single plan)
    nd = docs.agg(F.count("*").alias("n_docs"))
    uni = toks.groupBy("t").agg(F.count("*").alias("c"))
    pairs = (
        toks.alias("a")
        .join(toks.alias("b"), "doc_id")
        .filter(F.col("a.t") < F.col("b.t"))
        .groupBy(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_PAIRS)
    )
    scored = (
        # uni spans the vocabulary (entropy-scaling) -- unhinted, AQE
        pairs.join(uni.select(F.col("t").alias("ta"), F.col("c").alias("c_a")), "ta")
        .join(uni.select(F.col("t").alias("tb"), F.col("c").alias("c_b")), "tb")
        .join(F.broadcast(nd))
        .select(
            "ta",
            "tb",
            "c_ab",
            F.round(
                F.log(
                    F.col("c_ab").cast("double")
                    * F.col("n_docs").cast("double")
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    # Global top-k as TakeOrderedAndProject, then rank the ≤k survivors
    # (lit(0) partition = one tiny explicit group, no WindowExec
    # single-partition warning).
    top = scored.orderBy(F.col("pmi").desc(), "ta", "tb").limit(_PMI_TOPK)
    w = Window.partitionBy(single_group("pmi")).orderBy(
        F.col("pmi").desc(), "ta", "tb"
    )
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")


register(
    Query(
        name="x_word_pmi",
        build=x_word_pmi,
        oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
            FROM documents
        ), uni AS (
            SELECT t, count(*) AS c FROM toks GROUP BY t
        ), pairs AS (
            SELECT a.t AS ta, b.t AS tb, count(*) AS c_ab
            FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.t < b.t
            GROUP BY a.t, b.t
            HAVING count(*) >= {_PMI_MIN_PAIRS}
        ), scored AS (
            SELECT p.ta, p.tb, p.c_ab,
                   round(ln(CAST(p.c_ab AS DOUBLE)
                            * (SELECT count(*) FROM documents)
                            / (CAST(ua.c AS DOUBLE) * ub.c)), 6) AS pmi
            FROM pairs p
            JOIN uni ua ON ua.t = p.ta
            JOIN uni ub ON ub.t = p.tb
        )
        SELECT ta, tb, c_ab, pmi,
               row_number() OVER (ORDER BY pmi DESC, ta, tb) AS rank
        FROM scored QUALIFY rank <= {_PMI_TOPK} ORDER BY rank
        """,
        doc="doc-level word co-occurrence PMI from exact integer counts (embedding-training prep; X4)",
        tags=("X4", "statistics"),
    )
)


# ----------------------------------------------- character entropy
# Shannon entropy of each document's character distribution — the
# classic gibberish/encoding-artifact quality signal (random noise
# scores high, repeated filler scores low).  One explode + two hash
# aggs; per-character terms are identical doubles in both engines, and
# the cross-engine sum-order difference is absorbed by rounding.
def x_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
        ).alias("ch"),
    )
    per_char = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    with_n = per_char.withColumn(
        "n", F.sum("c").over(Window.partitionBy("doc_id"))
    )
    per_doc = with_n.groupBy("doc_id").agg(
        F.first("n").alias("n_chars"),
        F.count("*").alias("distinct_chars"),
        F.sum(
            F.round(
                -(F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n")), 12
            )
        ).alias("h_raw"),
    )
    return per_doc.select(
        "doc_id",
        "n_chars",
        "distinct_chars",
        F.round("h_raw", 6).alias("entropy"),
    ).orderBy("doc_id")


register(
    Query(
        name="x_char_entropy",
        build=x_char_entropy,
        oracle="""
        WITH chars AS (
            SELECT doc_id, unnest(list_transform(range(1, len(text) + 1),
                                  i -> text[i])) AS ch
            FROM documents
        ), per_char AS (
            SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
        ), with_n AS (
            SELECT *, sum(c) OVER (PARTITION BY doc_id) AS n FROM per_char
        )
        SELECT doc_id, CAST(any_value(n) AS BIGINT) AS n_chars,
               count(*) AS distinct_chars,
               round(sum(round(-(CAST(c AS DOUBLE) / n)
                               * ln(CAST(c AS DOUBLE) / n), 12)), 6) AS entropy
        FROM with_n GROUP BY doc_id ORDER BY doc_id
        """,
        doc="per-document character-distribution Shannon entropy (gibberish/encoding quality signal; X4)",
        tags=("X4", "quality"),
    )
)


# ------------------------------------------------- BPE merge statistics
# The first step of byte-pair-encoding vocabulary induction: count
# adjacent character pairs inside words across the corpus and rank the
# merge candidates.  Pure HOF expansion (no per-word Python), ONE scan:
# the corpus-wide occurrence total comes from summing the aggregated
# pair table (1-row broadcast), not a second count() pass over the
# explode; at 100 TB the pair alphabet stays tiny so everything after
# the first agg is bounded.
_BPE_TOPK = 30


def x_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(
            # filter len<2 words FIRST: Spark's sequence(1, 0) counts
            # DOWN ([1, 0]), it is not empty like DuckDB's range(1, 1)
            F.expr(
                "flatten(transform(filter(split(text, ' '), w -> length(w) >= 2), "
                "w -> transform(sequence(1, length(w) - 1), "
                "i -> substring(w, i, 2))))"
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").alias("c"))
    # The aggregated pair alphabet is bounded (order hundreds of rows),
    # so total + rank both come from one explicit single-group window
    # over it — the explode scan runs exactly once, no separate count()
    # action and no second traversal for the 1-row total.
    w0 = Window.partitionBy(single_group("c"))
    w = w0.orderBy(F.col("c").desc(), "pair")
    return (
        counted.select(
            F.row_number().over(w).alias("rank"),
            "pair",
            "c",
            F.round(F.col("c") / F.sum("c").over(w0), 6).alias("share"),
        )
        .filter(F.col("rank") <= _BPE_TOPK)
        .orderBy("rank")
    )


register(
    Query(
        name="x_bpe_pair_stats",
        build=x_bpe_pair_stats,
        oracle=f"""
        WITH pairs AS (
            SELECT unnest(flatten(list_transform(
                       list_filter(string_split(text, ' '), w -> len(w) >= 2),
                       w -> list_transform(range(1, len(w)),
                                           i -> w[i:i+1])))) AS pair
            FROM documents
        ), counted AS (
            SELECT pair, count(*) AS c,
                   round(CAST(count(*) AS DOUBLE)
                         / (SELECT count(*) FROM pairs), 6) AS share
            FROM pairs GROUP BY pair
        )
        SELECT row_number() OVER (ORDER BY c DESC, pair) AS rank, pair, c, share
        FROM counted QUALIFY rank <= {_BPE_TOPK} ORDER BY rank
        """,
        doc="BPE vocabulary-induction step: adjacent in-word character-pair merge statistics (X4)",
        tags=("X4", "tokenizer"),
    )
)


# ------------------------------------------- leakage-safe train split
# Train/valid/test assignment keyed by CONTENT fingerprint, not doc id:
# exact duplicates land in the same split by construction, so no
# training document leaks into evaluation as a verbatim copy.  The
# query also PROVES the property — leaked_groups counts fingerprint
# groups spanning >1 split (0 by construction).  Near-dup-safe splits
# compose the same way with the simhash cluster id in place of the
# fingerprint (x_dedup_clusters).
def x_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    bucket = (
        F.conv(F.substring(F.md5(fp), 1, 8), 16, 10).cast("long") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    assigned = docs.select(fp.alias("fp"), split.alias("split"))
    # leaked-group count as a 1-row broadcast, not a driver count()
    # action — one plan, no second scan of documents
    leaked = (
        assigned.groupBy("fp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .agg(F.count("*").alias("leaked_groups"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_groups"),
            (F.count("*") - F.countDistinct("fp")).alias("n_dup_docs"),
        )
        .join(F.broadcast(leaked))
        .orderBy("split")
    )


register(
    Query(
        name="x_leakage_safe_split",
        build=x_leakage_safe_split,
        oracle="""
        WITH assigned AS (
            SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
                   CASE WHEN CAST(concat('0x', substring(md5(md5(lower(
                             regexp_replace(trim(text), '\\s+', ' ', 'g')))), 1, 8))
                             AS BIGINT) % 100 < 80 THEN 'train'
                        WHEN CAST(concat('0x', substring(md5(md5(lower(
                             regexp_replace(trim(text), '\\s+', ' ', 'g')))), 1, 8))
                             AS BIGINT) % 100 < 90 THEN 'valid'
                        ELSE 'test' END AS split
            FROM documents
        ), leaked AS (
            SELECT count(*) AS leaked_groups FROM (
                SELECT fp FROM assigned GROUP BY fp
                HAVING count(DISTINCT split) > 1
            )
        )
        SELECT split, count(*) AS n_docs,
               count(DISTINCT fp) AS n_groups,
               count(*) - count(DISTINCT fp) AS n_dup_docs,
               (SELECT leaked_groups FROM leaked) AS leaked_groups
        FROM assigned GROUP BY split ORDER BY split
        """,
        doc="content-fingerprint-keyed train/valid/test split: duplicates cannot span splits (leakage check emitted; X4)",
        tags=("X4", "sampling"),
    )
)


# ------------------------------------------------- feature hashing
# The hashing-trick vectorizer (Weinberger 2009): tokens hash straight
# into a fixed-dim count vector — no vocabulary build, no fit step, no
# driver state, which is why it's THE featurizer that survives 100 TB
# (vocab-based vectorizers need a broadcast dictionary; this needs a
# hash call).  One explode + one shuffle; the 64 bucket counts are
# conditional sums in a single aggregation pass.  md5-derived bucket
# ids are engine-portable, so the whole vector is oracle-exact.
_FH_DIM = 64


def x_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    bucket = F.expr(f"CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % {_FH_DIM}")
    counted = toks.select("doc_id", bucket.alias("b"))
    return (
        counted.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.array(
                *[
                    F.sum((F.col("b") == i).cast("long")).alias(f"f{i}")
                    for i in range(_FH_DIM)
                ]
            ).alias("fvec"),
        )
        .orderBy("doc_id")
    )


register(
    Query(
        name="x_feature_hashing",
        build=x_feature_hashing,
        oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), b AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {_FH_DIM} AS b
            FROM toks
        )
        SELECT doc_id, count(*) AS n_tokens,
               list_transform(range(0, {_FH_DIM}),
                   i -> CAST(coalesce(map_extract(histogram(b), i)[1], 0)
                             AS BIGINT)) AS fvec
        FROM b GROUP BY doc_id ORDER BY doc_id
        """,
        doc=(
            "hashing-trick featurizer: tokens → fixed-64-dim count vector, "
            "no vocabulary state, single aggregation pass"
        ),
        tags=("X4", "featurization"),
    )
)
