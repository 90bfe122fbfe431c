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
from .similarity import cosine, cosine_topk_bruteforce, l2_norm, _as_double

_N_QUERIES = 8  # vec_id < 8 are the probe vectors
_K = 5

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
