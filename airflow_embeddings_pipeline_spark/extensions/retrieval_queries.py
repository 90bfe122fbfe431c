"""Retrieval operators: BM25 lexical scoring, hybrid rank fusion, and
product-quantization ANN.

The reference stores embeddings for downstream retrieval
(embeddings-pipeline.py:248-255, CONFIGURATION.md:100-112); this module
supplies the retrieval stack a training-data platform runs on top of
that table: sparse lexical ranking (BM25), sparse+dense reciprocal-rank
fusion, and the memory-compressed ANN tier (PQ/ADC) that complements
the IVF family in similarity_queries.py.

Determinism for the DuckDB oracles: every floating intermediate is
rounded before ranking, all folds are left-to-right over double-cast
floats, and every ORDER BY carries an id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query, register
from ..sources.registry import load_table
from ..functions.ranking import single_group
from .similarity import _as_double, corpus_rowcount, cosine

_BM25_TERMS = ("vector", "join", "stream", "hash")
_K1 = 1.2
_B = 0.75
_TOPN = 20

# PQ layout: 64-d fixture vectors → 8 subspaces × 8 dims, 16 centroids
# per subspace (4-bit codes, one byte holds two) taken from the lowest
# vec_ids (deterministic, like the IVF tiers — which makes the
# approximation itself oracle-checkable).  The fixture vectors are
# near-isotropic (PQ's worst case — real embedding corpora cluster), so
# the ADC stage keeps k×10 candidates for the exact re-rank; recall@5
# at these settings is asserted in tests/test_changes.py.
_PQ_M = 8
_PQ_SUBDIM = 8
_PQ_NCENTS = 16
_PQ_NQUERIES = 8
_PQ_K = 5
# ADC candidate pool for the exact re-rank: max(floor, n_corpus/400).
# A FIXED 50 (k*10) pool is fixture-tuned and silently loses recall as
# the corpus grows — measured at ×100 stress (200k vectors, perturbed
# replicas): recall@5 0.475 with cand=50, 1.0 with cand=500 at the
# SAME wall time, because quantization cannot separate distances below
# its resolution and ties flood a fixed-size cut.  n/400 keeps the
# exact re-rank a constant ~0.25% of brute-force cost per query while
# recall improves monotonically with pool size; at fixture scale
# (n ≤ 20k) the floor keeps the original k*10 behavior, which is what
# the DuckDB oracle mirrors with the same GREATEST expression.
_PQ_CAND = 50
_PQ_CAND_DIV = 400

_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_NORM = (
    "sqrt(list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"round({_DOT.format(a=a, b=b)} / "
        f"({_NORM.format(a=a)} * {_NORM.format(a=b)}), 6)"
    )


def _tf(term: str):
    """Per-document term frequency without an explode: filter the token
    array in place (codegen'd higher-order function, map-only)."""
    return F.size(F.filter(F.split("text", " "), lambda x: x == F.lit(term)))


def _tf_sql(term: str) -> str:
    return f"len(list_filter(string_split(text, ' '), x -> x = '{term}'))"


# ------------------------------------------------------------------ BM25
# Okapi BM25 over the documents table.  Scale shape: tf is computed
# per-document with a higher-order array filter (no corpus explode —
# the posting-list shuffle only materializes per query term when you
# build an inverted index); df/N/avgdl are a single tiny aggregate
# broadcast below the scoring map.  One global top-k via sort+limit
# (TakeOrdered — no single-partition window at corpus scale).
def x_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("double").alias("dl"),
        *[_tf(t).cast("double").alias(f"tf_{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    contrib = []
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}")
        denom = tf + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
        contrib.append(idf * tf * (_K1 + 1.0) / denom)
    score = F.round(sum(contrib[1:], contrib[0]), 6)
    top = (
        scored.select("doc_id", F.col("dl").cast("long").alias("dl"), score.alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_TOPN)
    )
    # rank the ≤_TOPN survivors; lit(0) partition = one tiny explicit
    # group (no WindowExec single-partition warning path).
    w = Window.partitionBy(single_group("bm25")).orderBy(
        F.col("bm25").desc(), "doc_id"
    )
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")


def _bm25_oracle() -> str:
    tf_cols = ",\n                   ".join(
        f"CAST({_tf_sql(t)} AS DOUBLE) AS tf_{i}" for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n                   ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1.0 ELSE 0.0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    contribs = " + ".join(
        f"(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * ({_K1} + 1.0)"
        f" / (tf_{i} + {_K1} * (1.0 - {_B} + {_B} * dl / avgdl)))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
                   {tf_cols}
            FROM documents
        ), stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
                   {df_cols}
            FROM base
        ), scored AS (
            SELECT doc_id, CAST(dl AS BIGINT) AS dl,
                   round({contribs}, 6) AS bm25
            FROM base CROSS JOIN stats
        ), top AS (
            SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
            FROM scored WHERE bm25 > 0
        )
        SELECT doc_id, dl, bm25, rank FROM top
        WHERE rank <= {_TOPN} ORDER BY rank
        """


register(
    Query(
        name="x_bm25_retrieval",
        build=x_bm25_retrieval,
        oracle=_bm25_oracle(),
        doc="Okapi BM25 lexical top-k: HOF term frequencies (no explode), broadcast corpus stats",
        tags=("X4", "retrieval"),
        bench=True,
    )
)


# --------------------------------------------- reciprocal rank fusion
# Hybrid retrieval: fuse a sparse (term-count) ranking and a dense
# (cosine vs a query embedding) ranking with RRF
# (score = Σ 1/(60 + rank)).  Each leg produces a bounded top-50 list;
# the fuse is a full outer join of two tiny lists — at 100 TB only the
# two leg scans touch the corpus.  Integer ranks make fusion exactly
# reproducible: FP only enters through 1/(60+r) sums of two terms.
_RRF_C = 60
_RRF_LEG = 50


def x_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex_score = F.round(
        sum(
            (_tf(t).cast("double") for t in _BM25_TERMS[1:]),
            _tf(_BM25_TERMS[0]).cast("double"),
        ),
        6,
    )
    lex = (
        docs.select("doc_id", lex_score.alias("lex"))
        .filter(F.col("lex") > 0)
        .orderBy(F.col("lex").desc(), "doc_id")
        .limit(_RRF_LEG)
    )
    lex = lex.withColumn(
        "lex_rank",
        F.row_number().over(
            Window.partitionBy(single_group("lex")).orderBy(
                F.col("lex").desc(), "doc_id"
            )
        ),
    )

    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine(_as_double(F.col("embedding")), _as_double(F.col("qv"))), 6
            ).alias("sem"),
        )
        .orderBy(F.col("sem").desc(), "doc_id")
        .limit(_RRF_LEG)
    )
    sem = sem.withColumn(
        "sem_rank",
        F.row_number().over(
            Window.partitionBy(single_group("sem")).orderBy(
                F.col("sem").desc(), "doc_id"
            )
        ),
    )

    fused = (
        lex.select("doc_id", "lex_rank")
        .join(sem.select("doc_id", "sem_rank"), "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).alias("sem_rank"),
            F.round(
                F.when(
                    F.col("lex_rank").isNotNull(),
                    F.lit(1.0) / (F.lit(float(_RRF_C)) + F.col("lex_rank")),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("sem_rank").isNotNull(),
                    F.lit(1.0) / (F.lit(float(_RRF_C)) + F.col("sem_rank")),
                ).otherwise(F.lit(0.0)),
                9,
            ).alias("rrf"),
        )
    )
    # fused is the union of two ≤_RRF_LEG legs — bounded by
    # construction, so the single-group rank window never sees more than
    # 2×_RRF_LEG rows.
    w = Window.partitionBy(single_group("rrf")).orderBy(
        F.col("rrf").desc(), "doc_id"
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPN)
        .orderBy("rank")
    )


def _rrf_oracle() -> str:
    lex_terms = " + ".join(f"CAST({_tf_sql(t)} AS DOUBLE)" for t in _BM25_TERMS)
    return f"""
        WITH lex_scored AS (
            SELECT doc_id, round({lex_terms}, 6) AS lex FROM documents
        ), lex_top AS (
            SELECT doc_id, row_number() OVER (ORDER BY lex DESC, doc_id) AS lex_rank
            FROM lex_scored WHERE lex > 0
            ORDER BY lex DESC, doc_id LIMIT {_RRF_LEG}
        ), q AS (
            SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
        ), sem_scored AS (
            SELECT e.vec_id AS doc_id, {_cos_sql('e.embedding', 'q.qv')} AS sem
            FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
        ), sem_top AS (
            SELECT doc_id, row_number() OVER (ORDER BY sem DESC, doc_id) AS sem_rank
            FROM sem_scored ORDER BY sem DESC, doc_id LIMIT {_RRF_LEG}
        ), fused AS (
            SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
                   coalesce(l.lex_rank, 0) AS lex_rank,
                   coalesce(s.sem_rank, 0) AS sem_rank,
                   round(
                     (CASE WHEN l.lex_rank IS NOT NULL
                           THEN 1.0 / ({_RRF_C} + l.lex_rank) ELSE 0.0 END)
                     + (CASE WHEN s.sem_rank IS NOT NULL
                             THEN 1.0 / ({_RRF_C} + s.sem_rank) ELSE 0.0 END),
                   9) AS rrf
            FROM lex_top l FULL OUTER JOIN sem_top s ON l.doc_id = s.doc_id
        )
        SELECT doc_id, lex_rank, sem_rank, rrf,
               row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
        FROM fused QUALIFY rank <= {_TOPN} ORDER BY rank
        """


register(
    Query(
        name="x_rrf_fusion",
        build=x_rrf_fusion,
        oracle=_rrf_oracle(),
        doc="hybrid sparse+dense retrieval via reciprocal rank fusion of two bounded top-N legs",
        tags=("X3", "X4", "retrieval"),
    )
)


# -------------------------------------------------- product quantization
# The memory-compression ANN tier: each vector is coded as m=8 one-byte
# centroid ids (64 floats -> 8 bytes, 32x), and query scoring is
# asymmetric-distance computation -- a broadcast lookup table of
# (query x subspace x centroid) partial dots, summed per candidate via
# an equi-join on the tiny (subspace, code) key.  No full-width vector
# math touches the corpus at query time; the exact re-rank reads only
# k x 10 candidates per query.  Deterministic codebooks (subvectors of
# the lowest vec_ids, optionally refined by one exact-integer Lloyd
# step) make codes, ADC scores, and ranks bit-reproducible in the
# DuckDB oracle.  Codebooks are ``books[s][c]`` = the c-th codeword of
# subspace s (subdim floats).


def _pq_seed_books(cents: list[list[float]]) -> list[list[list[float]]]:
    """Subspace slices of the seed vectors: books[s][c]."""
    return [
        [
            cents[c][s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]
            for c in range(_PQ_NCENTS)
        ]
        for s in range(_PQ_M)
    ]


def _pq_encode(emb: DataFrame, books: list[list[list[float]]]) -> DataFrame:
    """vec_id + per-subspace double subvectors (sub{s}) + nearest-codeword
    ids (c{s}) -- codegen'd folds, map-only.

    The expressions are generated as SQL text -- one F.expr per subspace
    instead of ~1000 py4j column-builder round trips, which dominated
    plan-construction time in the column-API version.  Each subvector
    slice is computed once per subspace and shared by all 16 distances.

    Round-5 compile-time fix: the 16 codeword distances per subspace
    are a single ``transform`` over the subspace's codebook as ONE
    nested array LITERAL, not 16 unrolled aggregate subtrees -- the
    unrolled form (8 subspaces x 16 codewords x 8 literal components)
    cost ~1.8 s of Catalyst compile per plan while re-execution of the
    compiled plan was ~0.12 s (BASELINE.md build/exec split).
    Value-identical: same zip_with squared-distance left-fold per
    codeword, codewords visited in index order, same round(.., 6)."""

    sub_cols = [
        F.expr(
            f"transform(slice(embedding, {s * _PQ_SUBDIM + 1}, {_PQ_SUBDIM}), "
            "x -> CAST(x AS DOUBLE))"
        ).alias(f"sub{s}")
        for s in range(_PQ_M)
    ]
    sliced = emb.select("vec_id", *sub_cols)
    code_cols = []
    for s in range(_PQ_M):
        # single-pass argmin fold over (dist, idx) structs: each of the
        # 16 distances is evaluated ONCE (the array_position(array(d...),
        # array_min(array(d...))) form builds the distance array twice —
        # measured 7.3 s vs 6.2 s per 200k vectors).  First-min tie
        # break (strict <) matches array_position's first-match and the
        # oracle's ORDER BY dist, code.
        book_sql = ", ".join(
            "array(" + ", ".join(repr(float(v)) + "D" for v in books[s][c]) + ")"
            for c in range(_PQ_NCENTS)
        )
        code_cols.append(
            F.expr(
                f"CAST(aggregate(transform(array({book_sql}), (cw, ci) -> "
                f"named_struct('d', round(aggregate(zip_with(sub{s}, cw, "
                "(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x), 6), "
                "'i', ci)), "
                "named_struct('d', CAST('Infinity' AS DOUBLE), 'i', -1), "
                "(acc, x) -> IF(x.d < acc.d, x, acc)).i AS INT)"
            ).alias(f"c{s}")
        )
    return sliced.select(
        "vec_id", *[F.col(f"sub{s}") for s in range(_PQ_M)], *code_cols
    )


def _pq_encode_codes_numpy(
    emb: DataFrame, books: list[list[list[float]]], *, with_subs: bool = False
) -> DataFrame:
    """Scale-tier encode: vec_id + nearest-codeword ids via one
    Arrow-batched ``mapInPandas`` pass of numpy broadcasting — the same
    oracle-exact HOF-tier arithmetic ((a-b)^2 summed per codeword,
    round 6, first-min argmin), vectorized.  The engine's standing
    HOF-as-oracle-tier / numpy-as-scale-tier split (see
    ``cosine_topk_blocked``): at 2M vectors the interpreted HOF encode
    dominates the PQ probe (~70 s); this tier does the identical
    distance computation at BLAS-batch throughput.  Output codes are
    unit-asserted equal to the HOF tier's on the fixtures, and the
    catalog entry shares x_ann_pq's DuckDB oracle verbatim — same
    rounding, same tie rule (np.argmin takes the first minimum, the
    HOF fold's strict <)."""
    import numpy as np

    books_arr = np.asarray(books, dtype=np.float64)  # (M, NCENTS, SUBDIM)
    m, subdim = _PQ_M, _PQ_SUBDIM
    schema = "vec_id long, " + ", ".join(f"c{s} int" for s in range(m))
    if with_subs:
        # training-assignment shape: also emit the double-cast
        # subvectors so train_pq_books can explode them for the
        # exact-integer means without a vec_id re-join (the cast to
        # float64 here is the same value as the HOF tier's CAST(x AS
        # DOUBLE) slice — IEEE widening is exact)
        schema += ", " + ", ".join(f"sub{s} array<double>" for s in range(m))

    def op(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = _np.array(
                [list(v) for v in pdf["embedding"]], dtype=_np.float64
            )
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            if with_subs:
                for s in range(m):
                    out[f"sub{s}"] = list(
                        x[:, s * subdim : (s + 1) * subdim]
                    )
            for s in range(m):
                xs = x[:, s * subdim : (s + 1) * subdim]  # (n, subdim)
                diff = xs[:, None, :] - books_arr[s][None, :, :]
                sq = (diff * diff).sum(axis=2)  # (n, ncents), >= 0
                # HALF_UP like Spark/DuckDB round (np.round is
                # HALF_EVEN): floor(x*1e6 + 0.5) is half-up for the
                # non-negative squared distances, so a distance landing
                # exactly on a representable 6 dp midpoint (dyadic
                # values like 2^-7 = 0.0078125 do) breaks ties the same
                # way as the HOF tier and the shared oracle.
                d = _np.floor(sq * 1e6 + 0.5) / 1e6
                out[f"c{s}"] = _np.argmin(d, axis=1).astype("int32")
            yield _pd.DataFrame(out)

    return emb.select("vec_id", "embedding").mapInPandas(op, schema)


def train_pq_books(
    emb: DataFrame,
    seed_books: list[list[list[float]]],
    *,
    scale: int = 1_000_000,
    round_to: int = 6,
    assign: str = "hof",
) -> list[list[list[float]]]:
    """One deterministic Lloyd refinement per subspace: assign every
    subvector to its nearest seed codeword, then recompute codewords as
    exact-integer component means (the ``recompute_centroids`` scaling
    trick -- sums of ``round(x * scale)`` longs are order-independent,
    so the refined books are bit-reproducible by the SQL oracle).  One
    distributed pass; only m x ncents x subdim means reach the driver.
    Codewords whose cell is empty (possible when two seed slices
    coincide) keep their seed values.

    ``assign="numpy"`` swaps only the ASSIGNMENT (nearest-codeword
    search, the expensive interpreted part) for the Arrow-batched
    numpy tier — codes are identical by the encode parity units, and
    the means stay in the SAME Spark SQL aggregation over the same
    double-cast subvectors, so the refined books are bit-identical to
    the HOF path (books parity unit) and the SQL oracle still
    replicates training exactly.  The HALF_UP hazard lives in the
    MEANS' round(), which this option does not touch."""
    enc = (
        _pq_encode_codes_numpy(emb, seed_books, with_subs=True)
        if assign == "numpy"
        else _pq_encode(emb, seed_books)
    )
    sc = enc.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.col(f"c{s}").alias("code"),
                        F.col(f"sub{s}").alias("sub"),
                    )
                    for s in range(_PQ_M)
                ]
            )
        ).alias("x")
    )
    comp = sc.select(
        F.col("x.s").alias("s"),
        F.col("x.code").alias("code"),
        F.posexplode("x.sub").alias("pos", "val"),
    )
    rows = (
        comp.groupBy("s", "code", "pos")
        .agg(
            F.sum(F.round(F.col("val") * scale).cast("long")).alias("v"),
            F.count("*").alias("n"),
        )
        .select(
            "s",
            "code",
            "pos",
            F.round(
                F.col("v").cast("double") / (F.col("n") * float(scale)), round_to
            ).alias("m"),
        )
        .collect()
    )
    out = [[list(cw) for cw in sb] for sb in seed_books]
    got: dict[tuple[int, int], dict[int, float]] = {}
    for r in rows:
        got.setdefault((int(r["s"]), int(r["code"])), {})[int(r["pos"])] = float(
            r["m"]
        )
    for (s, c), comps in got.items():
        out[s][c] = [comps[i] for i in range(len(comps))]
    return out


def _pq_run(
    spark: SparkSession,
    emb: DataFrame,
    books,
    queries_head,
    *,
    encode: str = "hof",
    corpus_count: int | None = None,
) -> DataFrame:
    """Encode -> broadcast-ADC score -> exact re-rank, shared by the
    seed-codebook and trained-codebook entries.  ``encode="numpy"``
    swaps the interpreted HOF encode for the Arrow-batched numpy tier
    (identical codes, unit-asserted).  ``corpus_count`` (r11): the
    exact unfiltered row count when the caller has it from parquet
    footer metadata — the adaptive candidate pool becomes a literal,
    removing the 1-row-broadcast cross join stage; None keeps that
    path."""
    enc = (
        _pq_encode_codes_numpy(emb, books)
        if encode == "numpy"
        else _pq_encode(emb, books)
    )
    codes_long = enc.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("s"), F.col(f"c{s}").alias("code"))
                    for s in range(_PQ_M)
                ]
            )
        ).alias("sc"),
    ).select("vec_id", F.col("sc.s").alias("s"), F.col("sc.code").alias("code"))

    # --- ADC lookup table: left-fold partial dots, rounded like the oracle
    lut_rows = []
    for qid, qv in ((int(r[0]), [float(x) for x in r[1]]) for r in queries_head):
        for s in range(_PQ_M):
            for c in range(_PQ_NCENTS):
                acc = 0.0
                for i in range(_PQ_SUBDIM):
                    acc += qv[s * _PQ_SUBDIM + i] * books[s][c][i]
                lut_rows.append((qid, s, c, round(acc, 6)))
    lut = spark.createDataFrame(
        lut_rows, "query_id int, s int, code int, partial double"
    )

    adc = (
        codes_long.join(F.broadcast(lut), ["s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("partial"), 6).alias("adc"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), "vec_id")
    if corpus_count is not None:
        # exact count from footer metadata → literal pool (same value
        # as GREATEST(floor, count(*)//div): footer counts are exact)
        cands = (
            adc.withColumn("crank", F.row_number().over(wq))
            .filter(
                F.col("crank")
                <= max(_PQ_CAND, corpus_count // _PQ_CAND_DIV)
            )
        )
    else:
        # corpus-adaptive pool via the 1-row-broadcast scalar pattern
        # (no driver count() action; see _PQ_CAND rationale above)
        pool = emb.agg(
            F.greatest(
                F.lit(_PQ_CAND).cast("long"),
                (F.count("*") / _PQ_CAND_DIV).cast("long"),
            ).alias("cand_pool")
        )
        cands = (
            adc.withColumn("crank", F.row_number().over(wq))
            .join(F.broadcast(pool))
            .filter(F.col("crank") <= F.col("cand_pool"))
            .drop("cand_pool")
        )

    # --- exact re-rank on the surviving candidates only
    nb = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"))
    qe = emb.filter(F.col("vec_id") < _PQ_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    rer = (
        cands.join(nb, cands.vec_id == nb.nid)
        .join(F.broadcast(qe), cands.query_id == qe.qid)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc",
            F.round(
                cosine(_as_double(F.col("qv")), _as_double(F.col("nv"))), 6
            ).alias("cosine"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        rer.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= _PQ_K)
        .orderBy("query_id", "rank")
    )


def _pq_head(emb: DataFrame, sf_dir: str | None = None):
    """One bounded head read feeds codebook seeds and the ADC LUT —
    driver-side pyarrow when possible (r11: no Spark job per build),
    Spark collect fallback; identical values either way."""
    if sf_dir is not None:
        from .similarity import head_embeddings

        rows = head_embeddings(sf_dir, max(_PQ_NCENTS, _PQ_NQUERIES))
        if rows is not None:
            cents = [list(v) for _, v in rows[:_PQ_NCENTS]]
            return cents, rows[:_PQ_NQUERIES]
    head = (
        emb.filter(F.col("vec_id") < max(_PQ_NCENTS, _PQ_NQUERIES))
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    cents = [[float(x) for x in r[1]] for r in head[:_PQ_NCENTS]]
    return cents, head[:_PQ_NQUERIES]


def x_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 optimization: the benched entry now runs the Arrow-batched
    # numpy encode (the 100 TB production tier — at 2M vectors the
    # interpreted HOF encode alone cost ~70 s).  Codes are identical by
    # construction (same distances, same HALF_UP rounding, same
    # first-min tie rule — unit-asserted in
    # test_pq_encode_codes_match_python_argmin and the numpy/HOF parity
    # units) and the DuckDB oracle is shared verbatim, so the declared
    # results are bit-identical to the former HOF-tier build.  The HOF
    # expression tier remains available as ``_pq_encode`` (covered by
    # the parity units).
    emb = load_table(spark, sf_dir, "embeddings")
    cents, qhead = _pq_head(emb, sf_dir)
    return _pq_run(spark, emb, _pq_seed_books(cents), qhead, encode="numpy",
                   corpus_count=corpus_rowcount(sf_dir))


def x_ann_pq_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x_ann_pq with the numpy encode tier — same codes, same oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents, qhead = _pq_head(emb, sf_dir)
    return _pq_run(spark, emb, _pq_seed_books(cents), qhead, encode="numpy",
                   corpus_count=corpus_rowcount(sf_dir))


def x_ann_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents, qhead = _pq_head(emb, sf_dir)
    books = train_pq_books(emb, _pq_seed_books(cents))
    return _pq_run(spark, emb, books, qhead,
                   corpus_count=corpus_rowcount(sf_dir))


def x_ann_pq_trained_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x_ann_pq_trained with the numpy tier on BOTH interpreted hot
    paths: the training ASSIGNMENT (``train_pq_books(assign="numpy")``
    — codes identical by the encode parity units; the exact-integer
    MEANS and their HALF_UP round stay in Spark SQL, so the refined
    books are bit-identical, books parity unit) and the probe encode
    against the trained books.  Shares the trained oracle verbatim.
    At 2M vectors the interpreted HOF encodes dominated the trained
    probe (~100 s); this tier closes that to the numpy-fast
    envelope."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents, qhead = _pq_head(emb, sf_dir)
    books = train_pq_books(emb, _pq_seed_books(cents), assign="numpy")
    return _pq_run(spark, emb, books, qhead, encode="numpy",
                   corpus_count=corpus_rowcount(sf_dir))


def _pq_oracle() -> str:
    sq = (
        "(CAST(e.embedding[sp.s * {sd} + i] AS DOUBLE)"
        " - CAST(c.cv[sp.s * {sd} + i] AS DOUBLE))"
    ).format(sd=_PQ_SUBDIM)
    qdot = (
        "CAST(q.embedding[sp.s * {sd} + i] AS DOUBLE)"
        " * CAST(c.cv[sp.s * {sd} + i] AS DOUBLE)"
    ).format(sd=_PQ_SUBDIM)
    return f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cv FROM embeddings
            WHERE vec_id < {_PQ_NCENTS}
        ), subs AS (
            SELECT unnest(range(0, {_PQ_M})) AS s
        ), dists AS (
            SELECT e.vec_id, sp.s, c.cid,
                   round(list_sum(list_transform(range(1, {_PQ_SUBDIM} + 1),
                         i -> {sq} * {sq})), 6) AS dist
            FROM embeddings e CROSS JOIN subs sp CROSS JOIN cents c
        ), codes AS (
            SELECT vec_id, s, cid AS code,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, cid) AS rn
            FROM dists
        ), lut AS (
            SELECT q.vec_id AS query_id, sp.s, c.cid AS code,
                   round(list_sum(list_transform(range(1, {_PQ_SUBDIM} + 1),
                         i -> {qdot})), 6) AS partial
            FROM embeddings q CROSS JOIN subs sp CROSS JOIN cents c
            WHERE q.vec_id < {_PQ_NQUERIES}
        ), adc AS (
            SELECT l.query_id, k.vec_id, round(sum(l.partial), 6) AS adc
            FROM codes k JOIN lut l ON l.s = k.s AND l.code = k.code
            WHERE k.rn = 1 AND k.vec_id <> l.query_id
            GROUP BY l.query_id, k.vec_id
        ), cands AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY adc DESC, vec_id) AS crank
            FROM adc
        ), rer AS (
            SELECT ca.query_id, ca.vec_id AS neighbor_id, ca.adc,
                   {_cos_sql('qe.embedding', 'ne.embedding')} AS cosine
            FROM cands ca
            JOIN embeddings ne ON ne.vec_id = ca.vec_id
            JOIN embeddings qe ON qe.vec_id = ca.query_id
            WHERE ca.crank <= (SELECT GREATEST({_PQ_CAND}, count(*) // {_PQ_CAND_DIV}) FROM embeddings)
        )
        SELECT query_id, neighbor_id, adc, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM rer QUALIFY rank <= {_PQ_K} ORDER BY query_id, rank
        """


register(
    Query(
        name="x_ann_pq",
        build=x_ann_pq,
        oracle=_pq_oracle(),
        doc="product-quantization ANN: 8×8-dim codebooks, broadcast ADC lookup table, exact re-rank on k×10 candidates",
        tags=("X3", "ann"),
        bench=True,
    )
)

register(
    Query(
        name="x_ann_pq_fast",
        build=x_ann_pq_fast,
        oracle=_pq_oracle(),  # verbatim the HOF tier's oracle: same codes
        doc="x_ann_pq with the Arrow-batched numpy encode tier (scale path; identical distances/rounding/tie rule)",
        tags=("X3", "ann"),
    )
)


def _pq_trained_oracle() -> str:
    """Replicates train_pq_books + _pq_run bit-for-bit: seed books from
    the head vectors, ordered-fold subspace distances (list_sum of
    list_transform == Spark's left-fold aggregate), exact-integer
    component means for the one Lloyd step, then the same ADC + exact
    re-rank tail as the seed-codebook oracle."""
    sd, m, nc, nq = _PQ_SUBDIM, _PQ_M, _PQ_NCENTS, _PQ_NQUERIES
    dist0 = (
        f"round(list_sum(list_transform(range(1, {sd} + 1), "
        f"i -> (CAST(e.embedding[b.s * {sd} + i] AS DOUBLE) - b.bv[i]) "
        f"* (CAST(e.embedding[b.s * {sd} + i] AS DOUBLE) - b.bv[i]))), 6)"
    )
    qdot = (
        f"round(list_sum(list_transform(range(1, {sd} + 1), "
        f"i -> CAST(q.embedding[b.s * {sd} + i] AS DOUBLE) * b.bv[i])), 6)"
    )
    return f"""
        WITH subs AS (
            SELECT unnest(range(0, {m})) AS s
        ), book0 AS MATERIALIZED (
            SELECT sp.s, c.vec_id AS code,
                   list_transform(range(1, {sd} + 1),
                       i -> CAST(c.embedding[sp.s * {sd} + i] AS DOUBLE)) AS bv
            FROM embeddings c CROSS JOIN subs sp
            WHERE c.vec_id < {nc}
        ), d0 AS (
            SELECT e.vec_id, b.s, b.code, {dist0} AS dist
            FROM embeddings e CROSS JOIN book0 b
        ), codes0 AS (
            SELECT vec_id, s, code,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, code) AS rn
            FROM d0
        ), comp AS (
            -- exact integer component sums: same scaling the Spark
            -- trainer uses, so means are order-independent
            SELECT k.s, k.code, i AS pos,
                   CAST(round(CAST(e.embedding[k.s * {sd} + i + 1] AS DOUBLE)
                              * 1000000) AS BIGINT) AS v
            FROM codes0 k
            JOIN embeddings e ON e.vec_id = k.vec_id,
                 unnest(range(0, {sd})) AS t(i)
            WHERE k.rn = 1
        ), means AS (
            SELECT s, code, pos,
                   round(CAST(sum(v) AS DOUBLE) / (count(*) * 1000000.0), 6) AS mval
            FROM comp GROUP BY s, code, pos
        ), book1 AS MATERIALIZED (
            -- empty cells (coinciding seed slices) keep their seed codeword
            SELECT b0.s, b0.code, coalesce(mm.mv, b0.bv) AS bv
            FROM book0 b0
            LEFT JOIN (SELECT s, code, list(mval ORDER BY pos) AS mv
                       FROM means GROUP BY s, code) mm
              ON mm.s = b0.s AND mm.code = b0.code
        ), d1 AS (
            SELECT e.vec_id, b.s, b.code, {dist0.replace("book0", "book1")} AS dist
            FROM embeddings e CROSS JOIN book1 b
        ), codes1 AS (
            SELECT vec_id, s, code,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, code) AS rn
            FROM d1
        ), lut AS (
            SELECT q.vec_id AS query_id, b.s, b.code, {qdot} AS partial
            FROM embeddings q CROSS JOIN book1 b
            WHERE q.vec_id < {nq}
        ), adc AS (
            SELECT l.query_id, k.vec_id, round(sum(l.partial), 6) AS adc
            FROM codes1 k JOIN lut l ON l.s = k.s AND l.code = k.code
            WHERE k.rn = 1 AND k.vec_id <> l.query_id
            GROUP BY l.query_id, k.vec_id
        ), cands AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY adc DESC, vec_id) AS crank
            FROM adc
        ), rer AS (
            SELECT ca.query_id, ca.vec_id AS neighbor_id, ca.adc,
                   {_cos_sql('qe.embedding', 'ne.embedding')} AS cosine
            FROM cands ca
            JOIN embeddings ne ON ne.vec_id = ca.vec_id
            JOIN embeddings qe ON qe.vec_id = ca.query_id
            WHERE ca.crank <= (SELECT GREATEST({_PQ_CAND}, count(*) // {_PQ_CAND_DIV}) FROM embeddings)
        )
        SELECT query_id, neighbor_id, adc, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM rer QUALIFY rank <= {_PQ_K} ORDER BY query_id, rank
        """


register(
    Query(
        name="x_ann_pq_trained",
        build=x_ann_pq_trained,
        oracle=_pq_trained_oracle(),
        doc=(
            "product-quantization ANN with codebooks refined by one "
            "exact-integer Lloyd step per subspace; oracle replicates the "
            "training bit-for-bit"
        ),
        tags=("X3", "ann"),
    )
)

register(
    Query(
        name="x_ann_pq_trained_fast",
        build=x_ann_pq_trained_fast,
        oracle=_pq_trained_oracle(),  # shared verbatim: identical codes
        doc=(
            "x_ann_pq_trained with the Arrow-batched numpy encode against "
            "the SQL-trained books (scale path; identical codes/rounding/"
            "tie rule, unit-asserted)"
        ),
        tags=("X3", "ann"),
    )
)


# ---------------------------------------- persisted trained-PQ probe
# Train-once / probe-many for the PQ tier (mirror of
# x_ann_ivf_persisted): codebooks are saved through the atomic index
# store and the encode+ADC+re-rank plan is built from the LOADED
# artifact.  Shares x_ann_pq_trained's oracle — lossless persistence
# proven by value-hash equality.  The production shape at 100 TB: the
# full-corpus Lloyd pass runs once; each query after reads
# m×ncents×subdim floats (8 KB).
def x_ann_pq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from .index_store import corpus_fingerprint, load_index_if_valid, save_index

    emb = load_table(spark, sf_dir, "embeddings")
    cents, qhead = _pq_head(emb, sf_dir)
    src = os.path.join(sf_dir, "embeddings.parquet")
    # mtime-keyed filename is only the cache lookup; the loaded meta is
    # validated (source, params, footer-only corpus fingerprint) and a
    # mismatch retrains — see x_ann_ivf_persisted for the rationale.
    path = os.path.join(
        "/tmp/spark_graft_index",
        f"pq_{src.strip('/').replace('/', '_')}"
        f".m{int(os.path.getmtime(src) * 1000)}.json",
    )
    expect_meta = {
        "source": src,
        "m": _PQ_M,
        "ncents": _PQ_NCENTS,
        "corpus": corpus_fingerprint(src),
    }
    books = load_index_if_valid(path, "pq_codebooks", expect_meta)
    if books is None:
        trained = train_pq_books(emb, _pq_seed_books(cents))
        save_index(path, "pq_codebooks", trained, meta=expect_meta)
        books = load_index_if_valid(path, "pq_codebooks", expect_meta)
        assert books is not None, f"just-saved index failed validation: {path}"
    return _pq_run(spark, emb, books, qhead,
                   corpus_count=corpus_rowcount(sf_dir))


register(
    Query(
        name="x_ann_pq_persisted",
        build=x_ann_pq_persisted,
        oracle=_pq_trained_oracle(),
        doc=(
            "train-once/probe-many PQ: codebooks persisted via the atomic "
            "index store, probe built from the LOADED artifact — shares the "
            "trained tier's oracle, proving lossless round trip (X3)"
        ),
        tags=("X3", "ann"),
    )
)
