"""Corpus-level curation statistics: budget cuts, mixture temperature,
robust outlier filtering, and embedding drift monitoring.

These are the planning/monitoring operators around a training-data
pipeline (the reference's corpus is the documents collection it embeds,
embeddings-pipeline.py:185-227): decide how much of each source to
take, cut a quality-ordered corpus to a token budget, drop metadata
outliers, and watch the embedding distribution for upstream model or
data drift.

Scale notes are per-operator; the common theme is that nothing here
does a global sort or single-partition window over the corpus — budget
cuts use a two-phase (bucket, then within-bucket) running total, and
drift reduces 64 dimensions in one aggregate pass without an explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query, register
from ..sources.registry import load_table
from ..functions.ranking import single_group
from .text import EN_STOPWORDS

_DIM = 64  # fixture embedding dimensionality (TESTDATA.md)
_BUDGET = 10_000  # token budget for the cut (spans sf: ~50% at sf0.01)
_ALPHA = 0.5  # mixture temperature (sqrt scaling)


# ---------------------------------------------------- token budget cut
# Keep the highest-quality documents until a token budget is exhausted.
# The naive plan is a running sum over one global sort — a
# single-partition window at corpus scale.  The scalable shape used
# here: quantize quality into ~1000 buckets, aggregate tokens per
# bucket (tiny), take the cumulative over the bucket table to find each
# bucket's starting offset, then compute the within-bucket running sum
# partitioned by bucket — every window is either tiny or
# bucket-partitioned.  The DuckDB oracle runs the naive global running
# sum; the equivalence IS the test that the decomposition is exact.
def x_token_budget_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("quality"),
    ).withColumn("bucket", F.floor(F.col("quality") * 1000).cast("int"))

    per_bucket = base.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    # ≤1001 bucket rows — tiny; lit(0) partition = one explicit group
    wb = Window.partitionBy(single_group("bucket")).orderBy(F.col("bucket").desc())
    offsets = per_bucket.withColumn(
        "bucket_start",
        F.coalesce(
            F.sum("bucket_tokens").over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).filter(F.col("bucket_start") < _BUDGET)  # later buckets can't contribute

    ww = Window.partitionBy("bucket").orderBy(F.col("quality").desc(), "doc_id")
    return (
        base.join(F.broadcast(offsets.select("bucket", "bucket_start")), "bucket")
        .withColumn(
            "cum_tokens", F.col("bucket_start") + F.sum("n_tokens").over(ww)
        )
        .filter(F.col("cum_tokens") <= _BUDGET)
        .select("doc_id", "quality", "n_tokens", "cum_tokens")
        .orderBy(F.col("quality").desc(), "doc_id")
    )


register(
    Query(
        name="x_token_budget_cut",
        build=x_token_budget_cut,
        oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                         / len(string_split(text, ' ')), 6) AS quality
            FROM documents
        ), run AS (
            SELECT *, sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM base
        )
        SELECT doc_id, quality, n_tokens,
               CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM run WHERE cum_tokens <= {_BUDGET}
        ORDER BY quality DESC, doc_id
        """,
        doc="quality-ordered token budget cut via two-phase bucketed running total (no global-sort window)",
        tags=("X4", "curation"),
    )
)


# ------------------------------------------- temperature-scaled mixture
# Multilingual/multi-source mixture weighting (the XLM-R / mT5 recipe):
# sampling weight ∝ share^alpha flattens the source distribution so
# small sources aren't drowned.  Two tiny aggregates over the per-source
# rollup; only the rollup itself touches the corpus.
def x_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    tot = per_src.agg(F.sum("n_tokens").alias("total_tokens"))
    shared = per_src.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("n_tokens") / F.col("total_tokens")
    )
    z = shared.agg(
        F.sum(F.pow(F.col("share"), F.lit(_ALPHA))).alias("z")
    )
    return (
        shared.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("share", 6).alias("share"),
            F.round(F.pow(F.col("share"), F.lit(_ALPHA)) / F.col("z"), 6).alias(
                "temp_weight"
            ),
            F.round(
                (F.pow(F.col("share"), F.lit(_ALPHA)) / F.col("z"))
                / F.col("share"),
                6,
            ).alias("upsample_factor"),
        )
        .orderBy("source")
    )


register(
    Query(
        name="x_temperature_mixture",
        build=x_temperature_mixture,
        oracle=f"""
        WITH per_src AS (
            SELECT source, count(*) AS n_docs,
                   sum(len(string_split(text, ' '))) AS n_tokens
            FROM documents GROUP BY source
        ), shared AS (
            SELECT *, CAST(n_tokens AS DOUBLE)
                      / (SELECT sum(n_tokens) FROM per_src) AS share
            FROM per_src
        ), z AS (SELECT sum(pow(share, {_ALPHA})) AS z FROM shared)
        SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
               round(share, 6) AS share,
               round(pow(share, {_ALPHA}) / z, 6) AS temp_weight,
               round((pow(share, {_ALPHA}) / z) / share, 6) AS upsample_factor
        FROM shared CROSS JOIN z ORDER BY source
        """,
        doc="temperature-scaled source mixture: share^alpha weights + upsample factors",
        tags=("X4", "curation"),
    )
)


# ------------------------------------------------- robust outlier filter
# Tukey-fence outlier detection on a per-source metadata column: exact
# per-group quartiles → [q1 - 1.5·IQR, q3 + 1.5·IQR] bounds broadcast
# back over the corpus.  At 100 TB the exact quantile becomes
# approx_percentile (a_approx_percentiles is the contract for that
# substitution); the bounds join stays a tiny broadcast either way.
def x_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = lambda p: F.expr(f"percentile(n_chars, {p})")  # noqa: E731
    bounds = docs.groupBy("source").agg(
        (q(0.25) - 1.5 * (q(0.75) - q(0.25))).alias("lo"),
        (q(0.75) + 1.5 * (q(0.75) - q(0.25))).alias("hi"),
    )
    flagged = docs.join(F.broadcast(bounds), "source").withColumn(
        "is_outlier",
        ((F.col("n_chars") < F.col("lo")) | (F.col("n_chars") > F.col("hi"))).cast(
            "int"
        ),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("is_outlier").alias("n_outliers"),
            F.round(F.first("lo"), 4).alias("lo"),
            F.round(F.first("hi"), 4).alias("hi"),
        )
        .orderBy("source")
    )


register(
    Query(
        name="x_outlier_filter",
        build=x_outlier_filter,
        oracle="""
        WITH bounds AS (
            SELECT source,
                   quantile_cont(n_chars, 0.25)
                     - 1.5 * (quantile_cont(n_chars, 0.75)
                              - quantile_cont(n_chars, 0.25)) AS lo,
                   quantile_cont(n_chars, 0.75)
                     + 1.5 * (quantile_cont(n_chars, 0.75)
                              - quantile_cont(n_chars, 0.25)) AS hi
            FROM documents GROUP BY source
        )
        SELECT d.source, count(*) AS n_docs,
               CAST(sum(CASE WHEN d.n_chars < b.lo OR d.n_chars > b.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               round(any_value(b.lo), 4) AS lo,
               round(any_value(b.hi), 4) AS hi
        FROM documents d JOIN bounds b ON d.source = b.source
        GROUP BY d.source ORDER BY d.source
        """,
        doc="Tukey-fence robust outlier filter per source (broadcast quartile bounds)",
        tags=("X4", "curation"),
    )
)


# --------------------------------------------------- embedding drift
# Distribution monitor between two corpus halves (hash-split analog of
# yesterday-vs-today): per-dimension means reduced in ONE aggregate
# pass — 64 avg() expressions, no posexplode (which would shuffle
# dim× the corpus) — then the L2 shift and cosine between the two mean
# vectors.  Means are rounded before differencing so the FP partial-sum
# order (Spark partitions vs DuckDB's fold) cannot leak into the hash.
def x_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    sq_norm = F.aggregate(
        F.transform(v, lambda x: x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x * x,
    )
    g = (
        emb.withColumn("half", (F.col("vec_id") % 2).cast("int"))
        .groupBy("half")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.sqrt(sq_norm)), 6).alias("mean_norm"),
            *[
                F.round(F.avg(v[i].cast("double")), 9).alias(f"m{i}")
                for i in range(_DIM)
            ],
        )
    )
    a = g.filter(F.col("half") == 0).alias("a")
    b = g.filter(F.col("half") == 1).alias("b")

    def fold(expr_fn):
        acc = expr_fn(0)
        for i in range(1, _DIM):
            acc = acc + expr_fn(i)
        return acc

    sq_shift = fold(
        lambda i: (F.col(f"a.m{i}") - F.col(f"b.m{i}"))
        * (F.col(f"a.m{i}") - F.col(f"b.m{i}"))
    )
    dot_ab = fold(lambda i: F.col(f"a.m{i}") * F.col(f"b.m{i}"))
    norm_a = F.sqrt(fold(lambda i: F.col(f"a.m{i}") * F.col(f"a.m{i}")))
    norm_b = F.sqrt(fold(lambda i: F.col(f"b.m{i}") * F.col(f"b.m{i}")))
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.col("a.mean_norm").alias("mean_norm_a"),
        F.col("b.mean_norm").alias("mean_norm_b"),
        F.round(F.sqrt(sq_shift), 6).alias("l2_mean_shift"),
        F.round(dot_ab / (norm_a * norm_b), 6).alias("mean_cosine"),
    )


def _drift_oracle() -> str:
    means = ",\n                   ".join(
        f"round(avg(CAST(embedding[{i + 1}] AS DOUBLE)), 9) AS m{i}"
        for i in range(_DIM)
    )
    sq_shift = " + ".join(f"(a.m{i} - b.m{i}) * (a.m{i} - b.m{i})" for i in range(_DIM))
    dot_ab = " + ".join(f"a.m{i} * b.m{i}" for i in range(_DIM))
    norm_a = " + ".join(f"a.m{i} * a.m{i}" for i in range(_DIM))
    norm_b = " + ".join(f"b.m{i} * b.m{i}" for i in range(_DIM))
    return f"""
        WITH g AS (
            SELECT CAST(vec_id % 2 AS INTEGER) AS half, count(*) AS n,
                   round(avg(sqrt(list_sum(list_transform(
                         range(1, len(embedding) + 1),
                         i -> CAST(embedding[i] AS DOUBLE)
                              * CAST(embedding[i] AS DOUBLE))))), 6) AS mean_norm,
                   {means}
            FROM embeddings GROUP BY CAST(vec_id % 2 AS INTEGER)
        )
        SELECT a.n AS n_a, b.n AS n_b,
               a.mean_norm AS mean_norm_a, b.mean_norm AS mean_norm_b,
               round(sqrt({sq_shift}), 6) AS l2_mean_shift,
               round(({dot_ab}) / (sqrt({norm_a}) * sqrt({norm_b})), 6)
                   AS mean_cosine
        FROM g a CROSS JOIN g b WHERE a.half = 0 AND b.half = 1
        """


register(
    Query(
        name="x_embedding_drift",
        build=x_embedding_drift,
        oracle=_drift_oracle(),
        doc="embedding drift monitor: per-dimension means in one agg pass (no explode), L2 shift + mean-vector cosine",
        tags=("X3", "monitoring"),
    )
)


# -------------------------------------- weighted sampling (A-ES keys)
# Efraimidis–Spirakis weighted sampling without replacement: every row
# gets key = ln(u)/w (u uniform, w its weight) and the top-k keys form
# the sample — one map + one top-k, no per-stratum loops, mergeable
# across partitions (take the global top-k of per-partition top-ks).
# u derives from a deterministic integer mix (Knuth multiplicative
# hash) instead of an RNG so the sample — and the DuckDB oracle — are
# exactly reproducible.
_WS_K = 20


def x_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) + 1
    ) / F.lit(4294967297.0)
    key = F.round(F.log(u) / F.col("n_chars"), 12)
    top = (
        docs.select("doc_id", "source", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(_WS_K)
    )
    w = Window.partitionBy(single_group("es_key")).orderBy(
        F.col("es_key").desc(), "doc_id"
    )
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")


register(
    Query(
        name="x_weighted_sample",
        build=x_weighted_sample,
        oracle=f"""
        WITH keyed AS (
            SELECT doc_id, source, n_chars,
                   round(ln(((doc_id * 2654435761) % 4294967296 + 1)
                            / 4294967297.0) / n_chars, 12) AS es_key
            FROM documents
        ), top AS (
            SELECT *, row_number() OVER (ORDER BY es_key DESC, doc_id) AS rank
            FROM keyed
        )
        SELECT doc_id, source, n_chars, es_key, rank
        FROM top WHERE rank <= {_WS_K} ORDER BY rank
        """,
        doc="Efraimidis-Spirakis weighted sample without replacement: deterministic ln(u)/w keys, global top-k",
        tags=("X4", "sampling"),
    )
)


# ----------------------------------------------------- dataset card
# The per-source summary a data team publishes with every corpus
# snapshot (HuggingFace dataset-card statistics): volume, token
# inventory, exact-duplicate rate, language mix, quality means, and
# exact token-length quantiles — ONE pass over documents (a window for
# the dup flag + one grouped aggregation; the quantiles use the same
# exact interpolated-percentile contract as a_percentiles, mergeable
# sketch variants exist under a_approx_percentiles for the 100 TB
# path).
def x_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    w = Window.partitionBy("fp").orderBy("doc_id")
    sw = F.array(*[F.lit(x) for x in EN_STOPWORDS])
    flagged = docs.select(
        "doc_id",
        "source",
        fp.alias("fp"),
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("distinct_ratio"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
            / F.size(toks)
            >= 0.04
        ).cast("long").alias("is_en"),
    ).withColumn("is_dup", (F.row_number().over(w) > 1).cast("long"))
    pct = lambda q: F.round(F.expr(f"percentile(n_tokens, {q})"), 2)  # noqa: E731
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.sum("is_dup") / F.count("*"), 6).alias("dup_rate"),
            F.round(F.sum("is_en") / F.count("*"), 6).alias("en_share"),
            F.round(F.avg("distinct_ratio"), 6).alias("mean_distinct_ratio"),
            pct(0.5).alias("p50_tokens"),
            pct(0.9).alias("p90_tokens"),
        )
        .orderBy("source")
    )


_CARD_SW = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

register(
    Query(
        name="x_dataset_card",
        build=x_dataset_card,
        oracle=rf"""
        WITH flagged AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' ')))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio,
                   CASE WHEN len(list_filter(string_split(text, ' '),
                                             t -> t IN ({_CARD_SW})))
                             / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.04
                        THEN 1 ELSE 0 END AS is_en,
                   CASE WHEN row_number() OVER (
                            PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
                            ORDER BY doc_id) > 1
                        THEN 1 ELSE 0 END AS is_dup
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(sum(is_dup) / CAST(count(*) AS DOUBLE), 6) AS dup_rate,
               round(sum(is_en) / CAST(count(*) AS DOUBLE), 6) AS en_share,
               round(avg(distinct_ratio), 6) AS mean_distinct_ratio,
               round(quantile_cont(n_tokens, 0.5), 2) AS p50_tokens,
               round(quantile_cont(n_tokens, 0.9), 2) AS p90_tokens
        FROM flagged GROUP BY source ORDER BY source
        """,
        doc=(
            "per-source dataset card: volume, tokens, dup rate, language "
            "mix, quality mean, exact length quantiles in one pass"
        ),
        tags=("curation", "X4", "reporting"),
    )
)
