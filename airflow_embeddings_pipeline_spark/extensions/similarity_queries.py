"""Oracle-checked catalog entries for vector similarity (X3).

DuckDB oracles compute the dot product with the same left-to-right
fold (``list_transform(range(...))`` + ``list_sum``) over
double-cast floats; similarities are rounded before ranking and ranked
with id tiebreaks so top-k is deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import Query, register
from ..sources.registry import load_table
from ..functions.ranking import single_group
from .similarity import (
    _as_double,
    assign_ivf_cells,
    cosine,
    cosine_topk_blocked,
    cosine_topk_bruteforce,
    ivf_topk,
    l2_norm,
)

_N_QUERIES = 8  # vec_id < 8 are the probe vectors
_K = 5
_N_CENTS = 4  # IVF centroids = embeddings of vec_id < 4 (deterministic)
_NPROBE = 2

# DuckDB cosine between two float lists a/b, left-fold, double math.
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


# ------------------------------------------------------------ vector norms
def x_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(l2_norm(v), 6).alias("l2_norm"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size("embedding"), 6)
        .alias("mean_component"),
    ).orderBy("vec_id")


register(
    Query(
        name="x_vector_norms",
        build=x_vector_norms,
        oracle=f"""
        SELECT vec_id, label, len(embedding) AS dim,
               round({_NORM.format(a='embedding')}, 6) AS l2_norm,
               round(list_sum(list_transform(range(1, len(embedding) + 1),
                     i -> CAST(embedding[i] AS DOUBLE))) / len(embedding), 6) AS mean_component
        FROM embeddings ORDER BY vec_id
        """,
        doc="vector arithmetic: dim, L2 norm, mean component (X3 groundwork)",
        tags=("X3",),
    )
)


# ----------------------------------------------------------- cosine top-k
def x_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk_bruteforce(emb, queries, k=_K).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


register(
    Query(
        name="x_cosine_topk",
        build=x_cosine_topk,
        oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id < {_N_QUERIES}
        ), scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   {_cos_sql('q.qv', 'e.embedding')} AS cosine
            FROM embeddings e JOIN q ON q.query_id <> e.vec_id
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {_K} ORDER BY query_id, rank
        """,
        doc="brute-force exact cosine top-k neighbors (X3 baseline)",
        tags=("X3",),
        bench=True,
    )
)


# ------------------------------------------- cosine top-k, blocked tier
# Same answer as x_cosine_topk, computed via the single-node throughput
# path: numpy matmul per Arrow batch (mapInPandas) against the
# broadcast query matrix, partial top-k per batch, global window
# reduction.  Shares x_cosine_topk's oracle — the point IS that the
# scale path is exact.
def x_cosine_topk_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import head_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    # r11: the k probe vectors come from a driver-side footer-filtered
    # pyarrow read (O(1) row groups at any scale) instead of a Spark
    # job; identical values (IEEE float32→double widening), Spark-path
    # fallback kept.
    query_rows = head_embeddings(sf_dir, _N_QUERIES)
    if query_rows is None:
        qrows = (
            emb.filter(F.col("vec_id") < _N_QUERIES)
            .orderBy("vec_id")
            .select("vec_id", "embedding")
            .collect()
        )
        query_rows = [(int(r[0]), [float(x) for x in r[1]]) for r in qrows]
    return cosine_topk_blocked(emb, query_rows, k=_K).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


register(
    Query(
        name="x_cosine_topk_blocked",
        build=x_cosine_topk_blocked,
        oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id < {_N_QUERIES}
        ), scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   {_cos_sql('q.qv', 'e.embedding')} AS cosine
            FROM embeddings e JOIN q ON q.query_id <> e.vec_id
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {_K} ORDER BY query_id, rank
        """,
        doc="exact cosine top-k via Arrow-batched numpy matmul (X3 throughput tier)",
        tags=("X3", "pandas-udf"),
        bench=True,
    )
)


# ------------------------------------------------------------ IVF top-k
# The 100 TB path: one corpus pass assigns each vector to its nearest
# centroid cell (codegen'd expression, no UDF); queries probe only the
# nprobe nearest cells, turning the similarity join into an equi-join
# on a small int key.  Deterministic centroids (embeddings of the
# lowest vec_ids) make the approximation itself oracle-checkable: the
# DuckDB SQL replicates assignment, probing, and ranking exactly.
def _ivf_seed_centroids(emb: DataFrame, sf_dir: str) -> list[list[float]]:
    """The deterministic seed centroids (embeddings of vec_id <
    _N_CENTS) — driver-side pyarrow read when possible (no Spark job
    per build, ~0.2 s of each IVF query's wall), Spark collect
    fallback.  Values identical either way."""
    from .similarity import head_embeddings

    head = head_embeddings(sf_dir, _N_CENTS)
    if head is not None:
        return [v for _, v in head]
    cent_rows = (
        emb.filter(F.col("vec_id") < _N_CENTS)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r[0]] for r in cent_rows]


def x_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = _ivf_seed_centroids(emb, sf_dir)
    corpus = assign_ivf_cells(emb, centroids)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(corpus, queries, centroids, k=_K, nprobe=_NPROBE).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


_CDIST = (
    f"round({_DOT.format(a='c.cv', b='c.cv')}"
    f" - 2 * {_DOT.format(a='e.embedding', b='c.cv')}, 6)"
)

register(
    Query(
        name="x_ann_ivf",
        build=x_ann_ivf,
        oracle=f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cv FROM embeddings
            WHERE vec_id < {_N_CENTS}
        ), dists AS (
            SELECT e.vec_id, c.cid, {_CDIST} AS dist
            FROM embeddings e CROSS JOIN cents c
        ), assign AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM dists
        ), cells AS (
            SELECT vec_id, cid AS cell FROM assign WHERE rn = 1
        ), probes AS (
            SELECT vec_id AS query_id, cid AS probe_cell FROM assign
            WHERE vec_id < {_N_QUERIES} AND rn <= {_NPROBE}
        ), scored AS (
            SELECT p.query_id, e.vec_id AS neighbor_id,
                   {_cos_sql('qe.embedding', 'e.embedding')} AS cosine
            FROM probes p
            JOIN cells ce ON ce.cell = p.probe_cell
            JOIN embeddings e ON e.vec_id = ce.vec_id AND e.vec_id <> p.query_id
            JOIN embeddings qe ON qe.vec_id = p.query_id
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {_K} ORDER BY query_id, rank
        """,
        doc="IVF-pruned approximate top-k: nearest-centroid cells + nprobe equi-join (X3 scale tier)",
        tags=("X3", "ann"),
        bench=True,
    )
)


# ------------------------------------------------- IVF top-k, trained
# Same plan as x_ann_ivf but with centroids refined by one Lloyd's
# k-means step (assign to seed cells → exact-integer component means).
# The training is deterministic by construction — component sums are
# exact scaled integers, order-independent — so the oracle replicates
# seed assignment, mean recompute, reassignment, probing and ranking
# down to the bit.  Recall@5 vs the brute-force tier is asserted in
# tests/test_extensions.py at sf0.1.
def x_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = _ivf_seed_centroids(emb, sf_dir)
    trained = train_ivf_centroids(emb, seeds, iters=1)
    corpus = assign_ivf_cells(emb, trained)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(corpus, queries, trained, k=_K, nprobe=_NPROBE).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


_CDIST1 = (
    f"round({_DOT.format(a='c.cv', b='c.cv')}"
    f" - 2 * {_DOT.format(a='e.embedding', b='c.cv')}, 6)"
)

_IVF_TRAINED_ORACLE = f"""
        WITH cents0 AS (
            SELECT vec_id AS cid, embedding AS cv FROM embeddings
            WHERE vec_id < {_N_CENTS}
        ), d0 AS (
            SELECT e.vec_id, c.cid, {_CDIST1} AS dist
            FROM embeddings e CROSS JOIN cents0 c
        ), a0 AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d0
        ), cells0 AS (
            SELECT vec_id, cid AS cell FROM a0 WHERE rn = 1
        ), comp AS (
            -- exact integer component sums: same scaling the Spark
            -- trainer uses, so means are order-independent
            SELECT c0.cell, i AS pos,
                   CAST(round(CAST(e.embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v
            FROM cells0 c0
            JOIN embeddings e ON e.vec_id = c0.vec_id,
                 unnest(range(1, len(e.embedding) + 1)) AS t(i)
        ), means AS (
            SELECT cell, pos,
                   round(CAST(sum(v) AS DOUBLE) / (count(*) * 1000000.0), 6) AS m
            FROM comp GROUP BY cell, pos
        ), cents1 AS MATERIALIZED (
            SELECT cell AS cid, list(m ORDER BY pos) AS cv
            FROM means GROUP BY cell
        ), d1 AS (
            SELECT e.vec_id, c.cid, {_CDIST1} AS dist
            FROM embeddings e CROSS JOIN cents1 c
        ), a1 AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d1
        ), cells1 AS (
            SELECT vec_id, cid AS cell FROM a1 WHERE rn = 1
        ), probes AS (
            SELECT vec_id AS query_id, cid AS probe_cell FROM a1
            WHERE vec_id < {_N_QUERIES} AND rn <= {_NPROBE}
        ), scored AS (
            SELECT p.query_id, e.vec_id AS neighbor_id,
                   {_cos_sql('qe.embedding', 'e.embedding')} AS cosine
            FROM probes p
            JOIN cells1 ce ON ce.cell = p.probe_cell
            JOIN embeddings e ON e.vec_id = ce.vec_id AND e.vec_id <> p.query_id
            JOIN embeddings qe ON qe.vec_id = p.query_id
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {_K} ORDER BY query_id, rank
        """

register(
    Query(
        name="x_ann_ivf_trained",
        build=x_ann_ivf_trained,
        oracle=_IVF_TRAINED_ORACLE,
        doc="IVF top-k with k-means-trained centroids (1 deterministic Lloyd step), oracle replicates training (X3 scale tier)",
        tags=("X3", "ann"),
        bench=True,
    )
)


# --------------------------------------- persisted trained-IVF probe
# Train-once / probe-many: the trained centroids are saved through
# extensions/index_store.py (the engine's atomic state-file contract)
# and the probe plan is built from the LOADED artifact.  Sharing
# x_ann_ivf_trained's full oracle is the proof that persistence is
# lossless — a probe over the round-tripped index must be bit-identical
# to one over the freshly trained centroids.  At 100 TB this is the
# production shape: the full-corpus training pass runs once, every
# query after reads k×dim floats.
def x_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from .index_store import corpus_fingerprint, load_index_if_valid, save_index
    from .similarity import train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    src = os.path.join(sf_dir, "embeddings.parquet")
    # artifact cache keyed by source mtime (the layout-cache contract):
    # regenerated fixtures retrain, reruns reuse the persisted index.
    # The filename key is only the lookup; the LOADED meta is validated
    # against the current run (source path, params, and a footer-only
    # corpus fingerprint), so an mtime-preserving corpus replacement or
    # a shared-/tmp foreign artifact retrains instead of silently
    # serving a stale index.
    path = os.path.join(
        "/tmp/spark_graft_index",
        f"ivf_{src.strip('/').replace('/', '_')}"
        f".m{int(os.path.getmtime(src) * 1000)}.json",
    )
    expect_meta = {
        "source": src,
        "n_cents": _N_CENTS,
        "iters": 1,
        "corpus": corpus_fingerprint(src),
    }
    cents = load_index_if_valid(path, "ivf_centroids", expect_meta)
    if cents is None:
        cent_rows = (
            emb.filter(F.col("vec_id") < _N_CENTS)
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        )
        seeds = [[float(x) for x in r[0]] for r in cent_rows]
        trained = train_ivf_centroids(emb, seeds, iters=1)
        save_index(path, "ivf_centroids", trained, meta=expect_meta)
        # probe from the LOADED artifact — round-trip losslessness is
        # the property the shared oracle proves
        cents = load_index_if_valid(path, "ivf_centroids", expect_meta)
        assert cents is not None, f"just-saved index failed validation: {path}"
    corpus = assign_ivf_cells(emb, cents)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(corpus, queries, cents, k=_K, nprobe=_NPROBE).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


register(
    Query(
        name="x_ann_ivf_persisted",
        build=x_ann_ivf_persisted,
        oracle=_IVF_TRAINED_ORACLE,
        doc=(
            "train-once/probe-many IVF: centroids persisted via the atomic "
            "index store and probed from the LOADED artifact — shares the "
            "trained tier's oracle, proving lossless round trip (X3)"
        ),
        tags=("X3", "ann"),
    )
)


# ---------------------------------------- k-means convergence report
# The training-health signal next to the trained tiers: the centered
# k-means objective Σ(‖c‖² − 2 v·c) over nearest-centroid assignments
# (‖v‖² is a per-vector constant, so this surrogate has the same
# minimizer and the same monotone descent as the true inertia), before
# and after the one exact-integer Lloyd step.  Per-vector min distances
# are rounded then summed as DECIMAL(18,6) so both engines produce the
# identical total regardless of aggregation order.  A unit test asserts
# descent; the oracle replicates both iterations bit-for-bit.
def x_kmeans_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _as_double, dot, train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = _ivf_seed_centroids(emb, sf_dir)
    trained = train_ivf_centroids(emb, seeds, iters=1)

    def inertia(cents: list[list[float]], iteration: int) -> DataFrame:
        from .similarity import _cell_dists_sql

        # r11 SQL-text fast path (one py4j call; values identical —
        # same helper the assignment uses)
        dists = F.expr(f"array_min({_cell_dists_sql(cents, 'embedding')})")
        return emb.select(
            dists.cast("decimal(18,6)").alias("d")
        ).agg(
            F.lit(iteration).alias("iteration"),
            F.count("*").alias("n_vectors"),
            F.round(F.sum("d"), 4).cast("double").alias("inertia"),
        )

    return inertia(seeds, 0).unionByName(inertia(trained, 1)).orderBy("iteration")


register(
    Query(
        name="x_kmeans_convergence",
        build=x_kmeans_convergence,
        oracle=f"""
        WITH cents0 AS (
            SELECT vec_id AS cid, embedding AS cv FROM embeddings
            WHERE vec_id < {_N_CENTS}
        ), d0 AS (
            SELECT e.vec_id, c.cid, {_CDIST1} AS dist
            FROM embeddings e CROSS JOIN cents0 c
        ), a0 AS (
            SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d0
        ), cells0 AS (
            SELECT vec_id, cid AS cell FROM a0 WHERE rn = 1
        ), comp AS (
            SELECT c0.cell, i AS pos,
                   CAST(round(CAST(e.embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v
            FROM cells0 c0
            JOIN embeddings e ON e.vec_id = c0.vec_id,
                 unnest(range(1, len(e.embedding) + 1)) AS t(i)
        ), means AS (
            SELECT cell, pos,
                   round(CAST(sum(v) AS DOUBLE) / (count(*) * 1000000.0), 6) AS m
            FROM comp GROUP BY cell, pos
        ), cents1 AS MATERIALIZED (
            SELECT cell AS cid, list(m ORDER BY pos) AS cv
            FROM means GROUP BY cell
        ), d1 AS (
            SELECT e.vec_id, c.cid, {_CDIST1} AS dist
            FROM embeddings e CROSS JOIN cents1 c
        ), a1 AS (
            SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d1
        )
        SELECT 0 AS iteration, count(*) AS n_vectors,
               CAST(round(sum(CAST(dist AS DECIMAL(18,6))), 4) AS DOUBLE) AS inertia
        FROM a0 WHERE rn = 1
        UNION ALL
        SELECT 1, count(*),
               CAST(round(sum(CAST(dist AS DECIMAL(18,6))), 4) AS DOUBLE)
        FROM a1 WHERE rn = 1
        ORDER BY iteration
        """,
        doc=(
            "k-means training convergence: centered-objective inertia before/"
            "after the exact-integer Lloyd step, decimal-exact totals"
        ),
        tags=("X3", "ann", "training"),
    )
)


# ------------------------------------------- hyperplane-LSH near-dup
# The 100 TB similarity-join tier: sign-LSH signatures (16 random
# hyperplanes), banded 4×4-bit bucketing — candidates are pairs sharing
# at least one band, found by the same single-shuffle bucket-groupBy as
# the SimHash path (NO all-pairs join over the corpus) — then exact
# cosine verification on the candidates only.  Deterministic md5-seeded
# planes make the whole thing (signatures, buckets, candidates, scores)
# reproducible in SQL, so even the *approximate* step is oracle-checked.
_HP_PLANES = 16
_HP_DIM = 64  # fixture embedding dimensionality (all scale factors)
_HP_THRESHOLD = 0.3


def x_hyperplane_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import simhash_near_dup_pairs
    from .similarity import hyperplane_planes, hyperplane_signature

    from .similarity import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    planes = hyperplane_planes(_HP_PLANES, _HP_DIM)
    # r12 (mirrors the benched t08 entry): signature, norm and unit
    # vector computed in ONE corpus pass; the only materialized table
    # is (vec_id, sim, u) — one eager localCheckpoint instead of a sig
    # checkpoint PLUS two per-side normalization passes over the raw
    # embeddings.  The banded self-join touches the (id, sig)
    # projection; the verify joins read u.
    # (An Arrow-batched numpy scorer was tried here and reverted: the
    # pair join ships both 64-double vectors per candidate through
    # Arrow — ~0.5 GB at sf0.1 — which costs more than the interpreted
    # dot saves.  JVM-side HOF keeps the verify zero-copy.  A flat
    # unrolled 64-term codegen dot was also tried and is 2.2× SLOWER —
    # the generated method blows the JIT huge-method limit; see
    # similarity.py.)
    vecs = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    n1 = vecs.select(
        "vec_id",
        "v",
        hyperplane_signature("v", planes).alias("sim"),
        # generator barrier: __n must be a runtime attribute or the
        # unit-vector division below re-derives the norm per element
        F.explode(F.array(l2_norm(F.col("v")))).alias("__n"),
    )
    feats = n1.select(
        "vec_id",
        "sim",
        F.transform("v", lambda x: x / F.col("__n")).alias("u"),
    ).localCheckpoint(eager=True)
    cands = simhash_near_dup_pairs(
        feats.select("vec_id", "sim"), id_col="vec_id", simhash_col="sim",
        max_hamming=_HP_PLANES,  # no hamming prune: pure shared-band LSH
        num_bands=4, band_bits=4,
        # 4-bit bands → only 64 coarse buckets: stream the k² expansion
        # through a codegen'd self-join instead of materializing each
        # bucket as one array (the "arrays" tier suits many small
        # buckets; sign-LSH bands are few and large).
        pair_mode="join",
    )
    # At a low threshold sign-LSH admits ~20% of all pairs (cosine 0.3
    # ≈ 72°: near the no-signal regime for hyperplane rounding), so
    # per-pair verify cost dominates this query; at the high thresholds
    # real dedup uses, the candidate set — and this stage — collapses.
    a = feats.select(F.col("vec_id").alias("id_a"), F.col("u").alias("__na"))
    b = feats.select(F.col("vec_id").alias("id_b"), F.col("u").alias("__nb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        # generator barrier: without it the pushed threshold filter
        # re-inlines the dot fold into the join condition — every
        # candidate pays the score twice
        .select(
            "id_a",
            "id_b",
            "hamming",
            F.explode(
                F.array(F.round(dot(F.col("__na"), F.col("__nb")), 6))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= _HP_THRESHOLD)
        .orderBy("id_a", "id_b")
    )


def _hp_sig_sql() -> str:
    from .similarity import hyperplane_planes

    planes = hyperplane_planes(_HP_PLANES, _HP_DIM)
    terms = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        d = (
            f"list_sum(list_transform(range(1, len(embedding) + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]))"
        )
        terms.append(f"(CASE WHEN {d} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)")
    return " + ".join(terms)


register(
    Query(
        name="x_hyperplane_lsh_near_dup",
        build=x_hyperplane_lsh_near_dup,
        oracle=f"""
        WITH sig AS MATERIALIZED (
            SELECT vec_id, {_hp_sig_sql()} AS sim FROM embeddings
        ), banded AS (
            SELECT vec_id, sim, band, (sim >> (band * 4)) & 15 AS val
            FROM sig, unnest(range(4)) AS t(band)
        ), cand AS (
            SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b,
                   bit_count(xor(l.sim, r.sim)) AS hamming
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.val = r.val AND l.vec_id < r.vec_id
        ), nv AS MATERIALIZED (
            -- unit-normalize once per vector (the Spark side does the
            -- same below the join), so per-pair work is a single dot
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE) /
                       {_NORM.format(a='embedding')}) AS u
            FROM embeddings
        )
        SELECT c.id_a, c.id_b, c.hamming,
               round({_DOT.format(a='a.u', b='b.u')}, 6) AS cosine
        FROM cand c
        JOIN nv a ON a.vec_id = c.id_a
        JOIN nv b ON b.vec_id = c.id_b
        WHERE round({_DOT.format(a='a.u', b='b.u')}, 6) >= {_HP_THRESHOLD}
        ORDER BY id_a, id_b
        """,
        doc=(
            "cosine-LSH near-dup STRESS configuration: threshold 0.3 "
            "(~72deg, near-no-signal regime admitting ~20% of pairs) "
            "deliberately floods the verify stage; production parameters "
            "live in x_hyperplane_lsh_near_dup_t08 (the benched entry)"
        ),
        tags=("X2", "X3", "ann", "stress"),
    )
)


# ---------------------------------- hyperplane-LSH, production threshold
# The benched sign-LSH configuration: threshold 0.8 with matched
# selectivity (32 planes, 4 bands x 8 bits — a random pair matches a
# band with p=0.5^8, so ~1.6% of noise pairs become candidates, vs ~20%
# in the 4x4-bit stress entry above).  The raw fixtures are random
# unit vectors (max pairwise cosine ~0.51), so a 0.8-threshold query
# over them alone is vacuously empty; real dedup corpora contain real
# near-duplicates.  We PLANT them deterministically: every STRIDE-th
# vector gets a copy perturbed by an exact-integer-arithmetic epsilon
# (~cosine 0.95 to its original), reproducible bit-for-bit in the SQL
# oracle — so candidate generation, recall, and verify all run at
# production parameters against known ground truth.
_HP8_PLANES = 32
_HP8_BANDS = 4
_HP8_BAND_BITS = 8
_HP8_THRESHOLD = 0.8
_HP8_STRIDE = 5
_HP8_ID_OFFSET = 10_000_000
_HP8_AMP = 0.02


def _hp8_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture embeddings plus planted near-duplicates.

    Perturbation eps_i = AMP * (((vec_id*31 + i) % 7) - 3): pure
    integer arithmetic scaled by one double literal, so Spark and
    DuckDB compute identical IEEE values (no transcendentals)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    # The original id is renamed __orig BEFORE the offset alias exists:
    # Spark resolves a bare `vec_id` inside a HOF lambda to the LATERAL
    # alias from the same select list (the +offset output), not the
    # child column — verified behavior on 4.1 — which would silently
    # shift the epsilon pattern off the oracle's.
    planted = (
        emb.filter(F.col("vec_id") % _HP8_STRIDE == 0)
        .select(
            F.col("vec_id").alias("__orig"),
            _as_double(F.col("embedding")).alias("__vd"),
        )
        .select(
            (F.col("__orig") + _HP8_ID_OFFSET).alias("vec_id"),
            F.transform(
                "__vd",
                lambda x, i: x
                + F.lit(_HP8_AMP) * (((F.col("__orig") * 31 + i) % 7) - 3),
            ).alias("v"),
        )
    )
    # Generator barrier: v must be a runtime attribute, or the planted
    # transform inlines through PushProjectionThroughUnion into every
    # downstream HOF consumer (32 signature dots, norms) — see
    # extensions/dedup.py lsh_candidate_pairs stage-1 note.
    return base.union(planted).select(
        "vec_id", F.explode(F.array("v")).alias("v")
    )


def _hp8_corpus_sql() -> str:
    return f"""
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
        UNION ALL
        -- e.vec_id qualification matters: DuckDB's lateral alias rules
        -- would otherwise bind the bare name inside the lambda to the
        -- vec_id+offset OUTPUT alias, shifting the epsilon pattern
        SELECT e.vec_id + {_HP8_ID_OFFSET} AS vec_id,
               list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE)
                        + {_HP8_AMP} * (((e.vec_id * 31 + (i - 1)) % 7) - 3)) AS v
        FROM embeddings e WHERE e.vec_id % {_HP8_STRIDE} = 0
    """


def x_hyperplane_lsh_near_dup_t08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import simhash_near_dup_pairs
    from .similarity import dot, hyperplane_planes, hyperplane_signature, l2_norm

    # r11 materialized the corpus, the signature table and the
    # normalized table as THREE eager localCheckpoints (4 corpus passes
    # → 1 + 1).  r12 fuses them: signature, norm and unit vector are
    # computed in ONE pass over the (lazy) corpus union and the only
    # materialized table is (vec_id, sim, u) — one checkpoint job
    # instead of three, and one corpus-scale vector copy on executor
    # disk instead of two (the r11 verdict's scale-safety concern).
    # Guide §8 shape is unchanged: the banded self-join still touches
    # only the 16-byte (id, sig) projection of the checkpointed rows;
    # u is read by the verify joins only.
    corpus = _hp8_corpus(spark, sf_dir)
    planes = hyperplane_planes(_HP8_PLANES, _HP_DIM)
    n1 = corpus.select(
        "vec_id",
        "v",
        hyperplane_signature("v", planes).alias("sim"),
        # generator barrier: __n must be a runtime attribute or the
        # unit-vector division below re-derives the norm per element
        F.explode(F.array(l2_norm(F.col("v")))).alias("__n"),
    )
    feats = n1.select(
        "vec_id",
        "sim",
        F.transform("v", lambda x: x / F.col("__n")).alias("u"),
    ).localCheckpoint(eager=True)
    cands = simhash_near_dup_pairs(
        feats.select("vec_id", "sim"), id_col="vec_id", simhash_col="sim",
        max_hamming=_HP8_PLANES,  # no hamming prune: pure shared-band LSH
        num_bands=_HP8_BANDS, band_bits=_HP8_BAND_BITS,
        pair_mode="join",
    )
    a = feats.select(F.col("vec_id").alias("id_a"), F.col("u").alias("__na"))
    b = feats.select(F.col("vec_id").alias("id_b"), F.col("u").alias("__nb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        # generator barrier: without it the pushed threshold filter
        # re-inlines the whole dot fold into the join condition — every
        # candidate pays the score twice (verified in the r12 plan)
        .select(
            "id_a",
            "id_b",
            "hamming",
            F.explode(
                F.array(F.round(dot(F.col("__na"), F.col("__nb")), 6))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= _HP8_THRESHOLD)
        .orderBy("id_a", "id_b")
    )


def _hp8_sig_sql() -> str:
    from .similarity import hyperplane_planes

    planes = hyperplane_planes(_HP8_PLANES, _HP_DIM)
    terms = []
    for j, plane in enumerate(planes):
        # fully unrolled scalar dot: a `({lit})[i]` lambda re-builds the
        # 64-element literal list per element per row in DuckDB (O(d^2)
        # per plane) — unrolling keeps the oracle sub-second.  Addition
        # order matches the Spark left-fold exactly.
        d = " + ".join(f"v[{i + 1}] * ({plane[i]!r})" for i in range(len(plane)))
        terms.append(f"(CASE WHEN {d} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)")
    return " + ".join(terms)


register(
    Query(
        name="x_hyperplane_lsh_near_dup_t08",
        build=x_hyperplane_lsh_near_dup_t08,
        oracle=f"""
        WITH corpus AS MATERIALIZED ({_hp8_corpus_sql()}),
        sig AS MATERIALIZED (
            SELECT vec_id, {_hp8_sig_sql()} AS sim FROM corpus
        ), banded AS (
            SELECT vec_id, sim, band,
                   (sim >> (band * {_HP8_BAND_BITS})) & {(1 << _HP8_BAND_BITS) - 1} AS val
            FROM sig, unnest(range({_HP8_BANDS})) AS t(band)
        ), cand AS (
            SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b,
                   bit_count(xor(l.sim, r.sim)) AS hamming
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.val = r.val AND l.vec_id < r.vec_id
        ), nv AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(v, x -> x / {_NORM.format(a='v')}) AS u
            FROM corpus
        )
        SELECT c.id_a, c.id_b, c.hamming,
               round({_DOT.format(a='a.u', b='b.u')}, 6) AS cosine
        FROM cand c
        JOIN nv a ON a.vec_id = c.id_a
        JOIN nv b ON b.vec_id = c.id_b
        WHERE round({_DOT.format(a='a.u', b='b.u')}, 6) >= {_HP8_THRESHOLD}
        ORDER BY id_a, id_b
        """,
        doc=(
            "cosine-LSH near-dup at PRODUCTION parameters: threshold 0.8, "
            "32 planes, 4x8-bit bands (noise-pair candidate rate ~1.6%), "
            "planted deterministic near-duplicates as ground truth "
            "(X2/X3 scale tier; the benched sign-LSH entry)"
        ),
        tags=("X2", "X3", "ann"),
        bench=True,
    )
)


# ------------------------------------------------------- cosine near-dup
# Embedding-space near-duplicate join, blocked by label (the blocking
# key bounds the pair count; at scale the block is an LSH bucket).
def x_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    sim = F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.25)
        .orderBy("label", "id_a", "id_b")
    )


register(
    Query(
        name="x_embedding_near_dup",
        build=x_embedding_near_dup,
        oracle=f"""
        SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
               {_cos_sql('a.embedding', 'b.embedding')} AS cosine
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.25
        ORDER BY a.label, id_a, id_b
        """,
        doc="embedding-cosine near-duplicate threshold join, label-blocked (X2/X3)",
        tags=("X2", "X3"),
    )
)


# ----------------------------------------------- filtered vector search
# Metadata-filtered top-k ("vector search with a WHERE clause"): the
# corpus predicate is applied BEFORE scoring, so it pushes to the
# parquet scan (post-filtering top-k results instead would return
# under-filled result lists — the classic filtered-ANN bug).  Same
# broadcast-queries/stream-corpus shape as x_cosine_topk; at 100 TB
# the predicate prunes partitions/row-groups before any vector math.
_FILTER_LABELS = (0, 2, 4, 6, 8)


def x_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    allowed = emb.filter(F.col("label").isin(*_FILTER_LABELS))
    return cosine_topk_bruteforce(allowed, queries, k=_K).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


register(
    Query(
        name="x_filtered_topk",
        build=x_filtered_topk,
        oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id < {_N_QUERIES}
        ), scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   {_cos_sql('q.qv', 'e.embedding')} AS cosine
            FROM embeddings e JOIN q ON q.query_id <> e.vec_id
            WHERE e.label IN {_FILTER_LABELS}
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {_K} ORDER BY query_id, rank
        """,
        doc="metadata-filtered vector top-k: corpus predicate applied before scoring (filtered ANN)",
        tags=("X3",),
    )
)


# ------------------------------------------------- Matryoshka truncation
# MRL-style dimensionality reduction (Kusupati et al. 2022): keep the
# first 16 of 64 components, re-normalize, report how much of the
# original L2 mass the head retains and the renormalized head's first
# components.  Map-only expression arithmetic — the storage-shrink
# step an embedding corpus runs before building a coarse ANN tier.
_MAT_DIM = 16


def x_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    base = emb.select(
        "vec_id",
        "label",
        F.slice(v, 1, _MAT_DIM).alias("h"),
        l2_norm(v).alias("full_norm"),
    )
    with_h = base.select(
        "vec_id", "label", "h", "full_norm", l2_norm(F.col("h")).alias("head_norm")
    ).filter(F.col("head_norm") > 0)
    return with_h.select(
        "vec_id",
        "label",
        F.round(F.col("head_norm") / F.col("full_norm"), 6).alias("retained_frac"),
        F.round(F.element_at("h", 1) / F.col("head_norm"), 6).alias("u1"),
        F.round(F.element_at("h", 2) / F.col("head_norm"), 6).alias("u2"),
        F.round(F.element_at("h", 3) / F.col("head_norm"), 6).alias("u3"),
    ).orderBy("vec_id")


register(
    Query(
        name="x_matryoshka_truncate",
        build=x_matryoshka_truncate,
        oracle=f"""
        WITH h AS MATERIALIZED (
            SELECT vec_id, label,
                   list_transform(embedding[1:{_MAT_DIM}],
                                  x -> CAST(x AS DOUBLE)) AS h,
                   {_NORM.format(a='embedding')} AS full_norm
            FROM embeddings
        ), n AS (
            SELECT vec_id, label, h, full_norm,
                   sqrt(list_sum(list_transform(h, x -> x * x))) AS head_norm
            FROM h
        )
        SELECT vec_id, label,
               round(head_norm / full_norm, 6) AS retained_frac,
               round(h[1] / head_norm, 6) AS u1,
               round(h[2] / head_norm, 6) AS u2,
               round(h[3] / head_norm, 6) AS u3
        FROM n WHERE head_norm > 0 ORDER BY vec_id
        """,
        doc="Matryoshka truncate-and-renormalize: head-dim L2 mass retention (X3 storage tier)",
        tags=("X3",),
    )
)


# --------------------------------------------------------- semantic join
# Retrieval + metadata join (the serving-side RAG shape): top-k cosine
# neighbors per probe, then the tiny (queries × k) result broadcast
# INTO the documents table to fetch text metadata — document rows
# never shuffle.  Fixture doc_id aligns with vec_id.
_SJ_QUERIES = 4
_SJ_K = 3


def x_semantic_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    probes = emb.filter(F.col("vec_id") < _SJ_QUERIES)
    topk = cosine_topk_bruteforce(emb, probes, k=_SJ_K).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )
    return (
        docs.join(F.broadcast(topk), docs["doc_id"] == F.col("neighbor_id"))
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            "cosine",
            "lang",
            "source",
            F.substring("text", 1, 40).alias("snippet"),
        )
        .orderBy("query_id", "rank")
    )


register(
    Query(
        name="x_semantic_join",
        build=x_semantic_join,
        oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id < {_SJ_QUERIES}
        ), scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   {_cos_sql('q.qv', 'e.embedding')} AS cosine
            FROM embeddings e JOIN q ON q.query_id <> e.vec_id
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, rank, neighbor_id, cosine, lang, source,
               substring(text, 1, 40) AS snippet
        FROM ranked JOIN documents ON doc_id = neighbor_id
        WHERE rank <= {_SJ_K} ORDER BY query_id, rank
        """,
        doc="retrieval + metadata join: broadcast top-k results into the documents table (RAG serving shape)",
        tags=("X3",),
    )
)


# ------------------------------------------------- MaxSim late interaction
# ColBERT-style late-interaction scoring: a multi-token query (the
# embeddings of the lowest vec_ids stand in for per-token query
# vectors) against multi-vector documents (each label group's vectors).
# score(doc) = Σ_token max_vector cos(token, vector).  Scale shape: the
# query-token matrix broadcasts, the corpus streams through ONE scan
# computing all token similarities map-side, and the two-level
# (label, token)-max → label-sum aggregation is the only shuffle.
# Per-token maxima are exact (no accumulation); the final 3-value sum
# goes through exact integer arithmetic (cosines are already rounded to
# 6dp, so ×1e6 is integral) to stay order-independent across engines.
_MAXSIM_TOKENS = 3


def x_maxsim_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    qt = emb.filter(F.col("vec_id") < _MAXSIM_TOKENS).select(
        F.col("vec_id").alias("qt_id"), F.col("embedding").alias("__qv")
    )
    scored = emb.join(F.broadcast(qt)).select(
        "label",
        "qt_id",
        F.round(cosine(F.col("__qv"), F.col("embedding")), 6).alias("c"),
    )
    per_token = scored.groupBy("label", "qt_id").agg(F.max("c").alias("best"))
    per_label = per_token.groupBy("label").agg(
        F.count("*").alias("n_query_tokens"),
        F.round(
            F.sum(F.round(F.col("best") * 1_000_000).cast("long")) / 1_000_000.0, 6
        ).alias("maxsim_score"),
    )
    # rank over all labels: label cardinality is tiny post-agg (the
    # single-partition window runs on ≤ thousands of rows, never the
    # corpus).
    w = Window.partitionBy(single_group("maxsim_score")).orderBy(
        F.desc("maxsim_score"), "label"
    )
    return per_label.withColumn("rank", F.row_number().over(w)).orderBy("rank")


register(
    Query(
        name="x_maxsim_retrieval",
        build=x_maxsim_retrieval,
        oracle=f"""
        WITH q AS (
            SELECT vec_id AS qt_id, embedding AS qv FROM embeddings
            WHERE vec_id < {_MAXSIM_TOKENS}
        ), scored AS (
            SELECT e.label, q.qt_id,
                   {_cos_sql('q.qv', 'e.embedding')} AS c
            FROM embeddings e CROSS JOIN q
        ), per_token AS (
            SELECT label, qt_id, max(c) AS best
            FROM scored GROUP BY label, qt_id
        ), per_label AS (
            SELECT label,
                   count(*) AS n_query_tokens,
                   round(CAST(sum(CAST(round(best * 1000000) AS BIGINT))
                              AS DOUBLE) / 1000000.0, 6) AS maxsim_score
            FROM per_token GROUP BY label
        )
        SELECT label, n_query_tokens, maxsim_score,
               row_number() OVER (ORDER BY maxsim_score DESC, label) AS rank
        FROM per_label ORDER BY rank
        """,
        doc=(
            "ColBERT-style MaxSim late-interaction retrieval: per-token "
            "max cosine summed per label-group document"
        ),
        tags=("X3",),
    )
)


# ------------------------------------------------------------- SemDeDup
# SemDeDup (Abbas et al. 2023): semantic dedup by clustering embeddings
# (k-means cells) and dropping, within each cell, every vector that has
# a lower-id cell-mate above the cosine threshold — the lowest id per
# near-duplicate group survives as canonical.  The cell assignment
# turns the corpus-wide O(n²) similarity join into per-cell blocks
# (quadratic only in cell size; production runs use k ~ 10⁴-10⁵ trained
# cells, here k=4 deterministic seed centroids so the oracle can
# replicate assignment exactly).  Cross-cell near-dups are missed by
# design — that recall/cost tradeoff is the algorithm's core idea.
_SD_THRESHOLD = 0.35


def x_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_seed_centroids(emb, sf_dir)
    # One assignment pass (eager localCheckpoint, inside the run): the
    # within-cell self-join consumes `cells` on both sides and the
    # final left join a third time — three argmin passes otherwise.
    cells = (
        assign_ivf_cells(emb, cents)
        .select("vec_id", "label", "embedding", "ivf_cell")
        .localCheckpoint(eager=True)
    )
    a = cells.alias("a")
    b = cells.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.ivf_cell") == F.col("b.ivf_cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("c"),
        )
        .filter(F.col("c") >= _SD_THRESHOLD)
        .select("vec_id")
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    return (
        cells.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "label",
            F.col("ivf_cell").alias("cell"),
            F.coalesce("__dropped", F.lit(0)).alias("dropped"),
        )
        .orderBy("vec_id")
    )


_SD_CDIST = (
    f"round({_DOT.format(a='c.cv', b='c.cv')}"
    f" - 2 * {_DOT.format(a='e.embedding', b='c.cv')}, 6)"
)

register(
    Query(
        name="x_semdedup",
        build=x_semdedup,
        oracle=f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cv FROM embeddings
            WHERE vec_id < {_N_CENTS}
        ), d AS (
            SELECT e.vec_id, c.cid, {_SD_CDIST} AS dist
            FROM embeddings e CROSS JOIN cents c
        ), assigned AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d
        ), cells AS MATERIALIZED (
            SELECT a.vec_id, e.label, e.embedding, a.cid AS cell
            FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id
            WHERE a.rn = 1
        ), dropped AS (
            SELECT DISTINCT b.vec_id
            FROM cells a JOIN cells b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {_SD_THRESHOLD}
        )
        SELECT c.vec_id, c.label, c.cell,
               CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS dropped
        FROM cells c LEFT JOIN dropped d ON d.vec_id = c.vec_id
        ORDER BY c.vec_id
        """,
        doc=(
            "SemDeDup: cluster-blocked semantic dedup — within-cell "
            "cosine threshold, lowest id canonical (X2/X3 scale tier)"
        ),
        tags=("X3", "X2", "dedup"),
    )
)


# ------------------------------------------- IVF + int8 two-stage search
# The memory-bound serving tier (IVF-PQ shape, scalar-quantized): IVF
# cells prune the corpus, the candidate scan scores against int8 codes
# (4 bytes/dim → 1 byte/dim — at 100 TB the candidate pass reads ¼ the
# bytes and the integer dot products are exact, hence deterministic),
# and only the top candidate slice pays the full-precision re-rank.
# Every stage is reproducible: integer quantized dots, 6dp-rounded
# ratios, id tiebreaks — so the two-stage approximation itself is
# oracle-checked, not just the final answer shape.
_PQ_CAND_MULT = 3  # approximate stage keeps k·3 candidates for re-rank


def x_ann_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .similarity import dot

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = _ivf_seed_centroids(emb, sf_dir)
    base = assign_ivf_cells(emb, centroids)

    v = _as_double(F.col("embedding"))
    scaled = base.select(
        "vec_id",
        "ivf_cell",
        "embedding",
        (F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)).alias(
            "qscale"
        ),
    ).filter(F.col("qscale") > 0)
    # int8 codes as a generator output (explode(array(...)) barrier):
    # the candidate join references the code array once per pair — an
    # inlined quantization subtree would re-quantize per candidate.
    quant = scaled.select(
        "vec_id",
        "ivf_cell",
        "embedding",
        "qscale",
        F.explode(
            F.array(
                F.transform(
                    _as_double(F.col("embedding")),
                    lambda x: F.round(x / F.col("qscale")).cast("long"),
                )
            )
        ).alias("qv"),
    )
    quant = quant.select(
        "*",
        (
            F.col("qscale")
            * F.sqrt(
                F.aggregate(
                    "qv", F.lit(0).cast("long"), lambda a, x: a + x * x
                ).cast("double")
            )
        ).alias("qnorm"),
    )

    # probe cells per query — identical construction to ivf_topk (the
    # r11 SQL-text fast path: one py4j call instead of one per centroid
    # component; same struct-sort argsort, same values)
    from .similarity import _cell_dists_sql

    dists = _cell_dists_sql(centroids, "embedding")
    order = (
        f"array_sort(zip_with({dists}, sequence(0, {len(centroids) - 1}), "
        "(d, i) -> struct(d AS d, i AS i)))"
    )
    probe_cells = F.expr(f"slice(transform({order}, s -> s.i), 1, {_NPROBE})")
    q = (
        quant.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("probe_cell", F.explode(probe_cells))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qe"),
            F.col("qscale").alias("__qs"),
            F.col("qv").alias("__qq"),
            F.col("qnorm").alias("__qn"),
            "probe_cell",
        )
    )

    int_dot = F.aggregate(
        F.zip_with(F.col("__qq"), F.col("qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    cand = (
        quant.join(
            F.broadcast(q),
            (F.col("ivf_cell") == F.col("probe_cell"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "__qe",
            "embedding",
            F.round(
                (F.col("__qs") * F.col("qscale") * int_dot)
                / (F.col("__qn") * F.col("qnorm")),
                6,
            ).alias("approx_cosine"),
        )
    )
    w_a = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), "neighbor_id"
    )
    capped = cand.withColumn("arank", F.row_number().over(w_a)).filter(
        F.col("arank") <= _K * _PQ_CAND_MULT
    )
    rer = capped.select(
        "query_id",
        "neighbor_id",
        "approx_cosine",
        F.round(cosine(F.col("__qe"), F.col("embedding")), 6).alias("cosine"),
    )
    w_e = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        rer.withColumn("rank", F.row_number().over(w_e))
        .filter(F.col("rank") <= _K)
        .orderBy("query_id", "rank")
    )


_PQ_IDOT = (
    "list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.qv[i]))"
)

register(
    Query(
        name="x_ann_ivf_int8",
        build=x_ann_ivf_int8,
        oracle=f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cv FROM embeddings
            WHERE vec_id < {_N_CENTS}
        ), dists AS (
            SELECT e.vec_id, c.cid, {_CDIST} AS dist
            FROM embeddings e CROSS JOIN cents c
        ), assign AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM dists
        ), scaled AS MATERIALIZED (
            SELECT e.vec_id, a.cid AS cell, e.embedding,
                   list_max(list_transform(e.embedding,
                       x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS qscale
            FROM embeddings e JOIN assign a
              ON a.vec_id = e.vec_id AND a.rn = 1
            WHERE list_max(list_transform(e.embedding,
                       x -> abs(CAST(x AS DOUBLE)))) > 0
        ), quant AS MATERIALIZED (
            SELECT vec_id, cell, embedding, qscale,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) / qscale) AS BIGINT))
                       AS qv
            FROM scaled
        ), quant2 AS MATERIALIZED (
            SELECT *, qscale * sqrt(CAST(list_sum(
                       list_transform(qv, x -> x * x)) AS DOUBLE)) AS qnorm
            FROM quant
        ), probes AS (
            SELECT vec_id AS query_id, cid AS probe_cell FROM assign
            WHERE vec_id < {_N_QUERIES} AND rn <= {_NPROBE}
        ), cand AS (
            SELECT p.query_id, c.vec_id AS neighbor_id,
                   round(q.qscale * c.qscale * CAST({_PQ_IDOT} AS DOUBLE)
                         / (q.qnorm * c.qnorm), 6) AS approx_cosine
            FROM probes p
            JOIN quant2 c ON c.cell = p.probe_cell
                         AND c.vec_id <> p.query_id
            JOIN quant2 q ON q.vec_id = p.query_id
        ), capped AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY approx_cosine DESC, neighbor_id) AS arank
            FROM cand
        ), rer AS (
            SELECT t.query_id, t.neighbor_id, t.approx_cosine,
                   {_cos_sql('qe.embedding', 'e.embedding')} AS cosine
            FROM capped t
            JOIN embeddings qe ON qe.vec_id = t.query_id
            JOIN embeddings e ON e.vec_id = t.neighbor_id
            WHERE t.arank <= {_K * _PQ_CAND_MULT}
        )
        SELECT query_id, neighbor_id, approx_cosine, cosine,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank
        FROM rer
        QUALIFY rank <= {_K}
        ORDER BY query_id, rank
        """,
        doc=(
            "IVF + int8 two-stage ANN: quantized-code candidate scoring "
            "(exact integer dots), full-precision re-rank of the top "
            "slice (X3 serving tier)"
        ),
        tags=("X3", "ann", "quantization"),
        bench=True,
    )
)


# ---------------------------------------------------- IVF index health
# The maintenance view behind every IVF deployment decision: per-cell
# population and distance-to-centroid spread.  Unbalanced cells (one
# cell holding most of the corpus) are what make nprobe search
# degenerate — at 100 TB this one aggregate decides when to retrain
# centroids or split cells.  Distances reuse the assignment expression
# (already rounded to 6dp), so the whole view is one map stage + one
# tiny groupBy.
def x_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = _ivf_seed_centroids(emb, sf_dir)
    assigned = assign_ivf_cells(emb, centroids)
    # same quadratic-form distance the assignment ranks on (c·c − 2v·c);
    # r11 SQL-text fast path — the per-component literal build cost one
    # py4j round-trip per centroid component
    from .similarity import _cents_sql, _dot_sql

    own = f"element_at({_cents_sql(centroids)}, CAST(ivf_cell + 1 AS INT))"
    v = "transform(`embedding`, x -> CAST(x AS DOUBLE))"
    d = F.expr(
        f"round({_dot_sql(own, own)} - 2 * {_dot_sql(v, own)}, 6)"
    )
    per_vec = assigned.select(F.col("ivf_cell").alias("cell"), d.alias("d"))
    # corpus size as a 1-row broadcast, not a second count() action
    tot = emb.agg(F.count("*").alias("total"))
    return (
        per_vec.groupBy("cell")
        .agg(
            F.count("*").alias("n_vectors"),
            # exact decimal sum of the (already 6dp-rounded) distances →
            # order-independent mean, bit-equal across engines
            F.round(
                F.sum(F.col("d").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_dist"),
            F.round(F.max("d"), 6).alias("max_dist"),
        )
        .join(F.broadcast(tot))
        .select(
            "cell",
            "n_vectors",
            F.round(F.col("n_vectors") / F.col("total").cast("double"), 4)
            .alias("share"),
            "mean_dist",
            "max_dist",
        )
        .orderBy("cell")
    )


register(
    Query(
        name="x_ivf_cell_stats",
        build=x_ivf_cell_stats,
        oracle=f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cv FROM embeddings
            WHERE vec_id < {_N_CENTS}
        ), dists AS (
            SELECT e.vec_id, c.cid, {_CDIST} AS dist
            FROM embeddings e CROSS JOIN cents c
        ), assign AS (
            SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM dists
        ), cells AS (
            SELECT vec_id, cid AS cell, dist FROM assign WHERE rn = 1
        ), tot AS (SELECT count(*) AS n FROM embeddings)
        SELECT cell,
               count(*) AS n_vectors,
               round(count(*)::DOUBLE / (SELECT n FROM tot), 4) AS share,
               round(CAST(sum(CAST(dist AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*), 6) AS mean_dist,
               round(max(dist), 6) AS max_dist
        FROM cells GROUP BY cell ORDER BY cell
        """,
        doc=(
            "IVF index-health view: per-cell population share and "
            "distance-to-centroid spread (retrain/split diagnostic)"
        ),
        tags=("X3", "ann"),
    )
)


# ------------------------------------------------- hard-negative mining
# Contrastive-training data op: for each anchor, the highest-cosine
# neighbors with a DIFFERENT label — the "hard negatives" that make
# embedding training effective (easy random negatives teach nothing).
# Same broadcast-anchor single-corpus-scan shape as cosine top-k with
# a label-mismatch predicate pushed into the join condition, so
# wrong-label filtering happens before any scoring is kept.
_HN_ANCHORS = 6
_HN_K = 3


def x_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < _HN_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("__al"),
        F.col("embedding").alias("__av"),
    )
    scored = (
        emb.join(F.broadcast(anchors), F.col("label") != F.col("__al"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            F.round(cosine(F.col("__av"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"), "negative_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HN_K)
        .orderBy("anchor_id", "rank")
    )


register(
    Query(
        name="x_hard_negatives",
        build=x_hard_negatives,
        oracle=f"""
        WITH a AS (
            SELECT vec_id AS anchor_id, label AS al, embedding AS av
            FROM embeddings WHERE vec_id < {_HN_ANCHORS}
        ), scored AS (
            SELECT a.anchor_id, e.vec_id AS negative_id,
                   e.label AS negative_label,
                   {_cos_sql('a.av', 'e.embedding')} AS cosine
            FROM embeddings e JOIN a ON e.label <> a.al
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY anchor_id
                       ORDER BY cosine DESC, negative_id) AS rank
            FROM scored
        )
        SELECT anchor_id, negative_id, negative_label, cosine, rank
        FROM ranked WHERE rank <= {_HN_K} ORDER BY anchor_id, rank
        """,
        doc=(
            "hard-negative mining: top-k highest-cosine different-label "
            "neighbors per anchor (contrastive-training data op)"
        ),
        tags=("X3", "curation"),
    )
)


# -------------------------------------- incremental IVF maintenance
# Index-maintenance-at-ingest, the ANN counterpart of
# incremental_near_dup_check: a new embedding batch is assigned to the
# STANDING centroids (map-only, batch-sized scan) and merged into the
# per-cell statistics — the corpus is never re-assigned, and the
# per-cell growth/balance report is what triggers re-training
# (x_ann_ivf_trained) when a cell drifts hot.  Here the batch is
# simulated as the lowest vec_ids arriving into an index over the rest.
_IVFI_BATCH = 50


def x_ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(
            (F.col("vec_id") >= _IVFI_BATCH)
            & (F.col("vec_id") < _IVFI_BATCH + _N_CENTS)
        )
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    centroids = [[float(x) for x in r[0]] for r in cent_rows]

    standing = assign_ivf_cells(
        emb.filter(F.col("vec_id") >= _IVFI_BATCH), centroids
    )
    batch = assign_ivf_cells(emb.filter(F.col("vec_id") < _IVFI_BATCH), centroids)
    old = standing.groupBy("ivf_cell").agg(F.count("*").alias("n_standing"))
    new = batch.groupBy("ivf_cell").agg(F.count("*").alias("n_new"))
    return (
        old.join(new, "ivf_cell", "full_outer")
        .select(
            F.col("ivf_cell").cast("int").alias("ivf_cell"),
            F.coalesce("n_standing", F.lit(0)).alias("n_standing"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            (
                F.coalesce("n_new", F.lit(0))
                + F.coalesce("n_standing", F.lit(0))
            ).alias("n_total"),
            F.round(
                F.coalesce("n_new", F.lit(0))
                / F.greatest(F.coalesce("n_standing", F.lit(0)), F.lit(1)),
                6,
            ).alias("growth"),
        )
        .orderBy("ivf_cell")
    )


register(
    Query(
        name="x_ann_ivf_incremental",
        build=x_ann_ivf_incremental,
        oracle=f"""
        WITH cents AS (
            SELECT vec_id - {_IVFI_BATCH} AS cid, embedding AS cv
            FROM embeddings
            WHERE vec_id >= {_IVFI_BATCH} AND vec_id < {_IVFI_BATCH + _N_CENTS}
        ), dists AS (
            SELECT e.vec_id, c.cid,
                   round({_DOT.format(a='c.cv', b='c.cv')}
                         - 2 * {_DOT.format(a='e.embedding', b='c.cv')}, 6) AS dist
            FROM embeddings e CROSS JOIN cents c
        ), assign AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM dists
        ), cells AS (
            SELECT vec_id, cid AS cell FROM assign WHERE rn = 1
        ), old AS (
            SELECT cell, count(*) AS n_standing FROM cells
            WHERE vec_id >= {_IVFI_BATCH} GROUP BY cell
        ), new AS (
            SELECT cell, count(*) AS n_new FROM cells
            WHERE vec_id < {_IVFI_BATCH} GROUP BY cell
        )
        SELECT CAST(coalesce(o.cell, n.cell) AS INTEGER) AS ivf_cell,
               coalesce(o.n_standing, 0) AS n_standing,
               coalesce(n.n_new, 0) AS n_new,
               coalesce(o.n_standing, 0) + coalesce(n.n_new, 0) AS n_total,
               round(CAST(coalesce(n.n_new, 0) AS DOUBLE)
                     / greatest(coalesce(o.n_standing, 0), 1), 6) AS growth
        FROM old o FULL OUTER JOIN new n ON o.cell = n.cell
        ORDER BY ivf_cell
        """,
        doc=(
            "incremental IVF index maintenance: new batch assigned to "
            "standing centroids (map-only, no corpus re-assignment), "
            "per-cell growth report feeds the re-train decision (X3)"
        ),
        tags=("X3", "ann", "incremental"),
    )
)
