"""Oracle-checked catalog entries for the dedup operators (X1/X2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import Query, register
from ..sources.registry import load_table
from .dedup import (
    SIMHASH16_SQL,
    exact_dedup_stats,
    lsh_candidate_pairs,
    minhash_signature_sql,
    ngram_jaccard_pairs,
    shingles_sql,
    simhash16,
)

_SH = shingles_sql("text")


# ------------------------------------------------------------- exact dedup
def x_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_stats(docs, "text", "source").orderBy("source")


register(
    Query(
        name="x_exact_dedup",
        build=x_exact_dedup,
        oracle=r"""
        WITH fp AS (
            SELECT source,
                   md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
            FROM documents
        )
        SELECT source, count(*) AS n_docs, count(DISTINCT fp) AS n_unique,
               count(*) - count(DISTINCT fp) AS n_duplicates
        FROM fp GROUP BY source ORDER BY source
        """,
        doc="exact content-hash dedup accounting per source (X1)",
        bench=True,
        tags=("X1",),
    )
)


# ----------------------------------------------------------- jaccard top-k
# Exact n-gram Jaccard, top-3 most similar pairs per source
# (deterministic: ranked by exact rational similarity then ids).
def x_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", "source")
    w = Window.partitionBy("source").orderBy(
        F.desc("jaccard"), "id_a", "id_b"
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("source", "id_a", "id_b", "jaccard", "rank")
        .orderBy("source", "rank")
    )


register(
    Query(
        name="x_ngram_jaccard",
        build=x_ngram_jaccard,
        oracle=f"""
        WITH sh AS (
            SELECT source, doc_id, {_SH} AS sh FROM documents
        ), pairs AS (
            SELECT a.source,
                   a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_filter(a.sh, x -> list_contains(b.sh, x)))
                         / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
            FROM sh a JOIN sh b
              ON a.source = b.source AND a.doc_id < b.doc_id
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY source
                       ORDER BY jaccard DESC, id_a, id_b) AS rank
            FROM pairs
        )
        SELECT source, id_a, id_b, jaccard, rank
        FROM ranked WHERE rank <= 3 ORDER BY source, rank
        """,
        doc="exact n-gram Jaccard near-dup, top-3 pairs per source (X2)",
        tags=("X2",),
    )
)


# ------------------------------------------------------------- minhash LSH
def x_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(
        docs, "doc_id", "text", num_hashes=8, rows_per_band=1, block_col="source"
    )
    return (
        pairs.groupBy("source")
        .agg(F.count("*").alias("n_candidate_pairs"))
        .orderBy("source")
    )


_SIG = minhash_signature_sql("sh", 8)
register(
    Query(
        name="x_minhash_lsh",
        build=x_minhash_lsh,
        oracle=f"""
        WITH sh AS (
            SELECT source, doc_id, {_SH} AS sh FROM documents
        ), sig AS (
            SELECT source, doc_id, {_SIG} AS sig FROM sh
        ), banded AS (
            SELECT source, doc_id, b AS band_id, md5(CAST(sig[b + 1] AS VARCHAR)) AS band_hash
            FROM sig, unnest(range(8)) AS t(b)
        ), pairs AS (
            SELECT DISTINCT l.source, l.doc_id AS id_a, r.doc_id AS id_b
            FROM banded l JOIN banded r
              ON l.band_id = r.band_id AND l.band_hash = r.band_hash
             AND l.source = r.source AND l.doc_id < r.doc_id
        )
        SELECT source, count(*) AS n_candidate_pairs
        FROM pairs GROUP BY source ORDER BY source
        """,
        doc="MinHash+LSH candidate-pair discovery, banded signature join (X2)",
        bench=True,
        tags=("X2",),
    )
)


# ----------------------------------------------------------------- simhash
def x_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", simhash16("text").alias("simhash")
    ).orderBy("doc_id")


register(
    Query(
        name="x_simhash",
        build=x_simhash,
        oracle=f"""
        SELECT doc_id, CAST({SIMHASH16_SQL.format(text="text")} AS BIGINT) AS simhash
        FROM documents ORDER BY doc_id
        """,
        doc="16-bit SimHash fingerprint per document (X2)",
        tags=("X2",),
    )
)


# ----------------------------------------------------- simhash near-dup
# Banded hamming join: exact for hd<=3 by pigeonhole over 4 nibble
# bands; the oracle is the plain O(n^2) self-join — results must be
# identical, which is precisely the claim the banding makes.
def x_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import simhash16, simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    with_sim = docs.select("doc_id", "source", simhash16("text").alias("sim"))
    return simhash_near_dup_pairs(
        with_sim, id_col="doc_id", simhash_col="sim", max_hamming=3,
        block_col="source",
    ).orderBy("source", "id_a", "id_b")


from .dedup import SIMHASH16_SQL as _SH_SQL  # noqa: E402

register(
    Query(
        name="x_simhash_near_dup",
        build=x_simhash_near_dup,
        oracle=f"""
        WITH s AS MATERIALIZED (
            SELECT doc_id, source, {_SH_SQL.format(text='text')} AS sim
            FROM documents
        )
        SELECT l.source, l.doc_id AS id_a, r.doc_id AS id_b,
               bit_count(xor(l.sim, r.sim)) AS hamming
        FROM s l JOIN s r
          ON l.source = r.source AND l.doc_id < r.doc_id
        WHERE bit_count(xor(l.sim, r.sim)) <= 3
        ORDER BY l.source, id_a, id_b
        """,
        doc="SimHash near-dup pairs: banded nibble buckets (pigeonhole-exact for hd<=3), oracled vs full self-join",
        tags=("X2", "simhash"),
    )
)


# ----------------------------------------- wide simhash (scale tier)
# 60-bit md5 fingerprint with 4×15-bit bands: 2^15 values per band
# keeps bucket sizes ~n/32768 per block (vs n/16 for the nibble tier),
# which is what stops pair emission degenerating to O(n²/16) on a big
# single-source corpus.  md5 keeps it DuckDB-reproducible; the
# xxhash64/64-bit variant (token_hashes(fast=True), 4×16-bit bands) is
# the same plan shape and is covered by unit tests + the stress
# harness (xxhash64 has no DuckDB mirror).
def x_simhash_wide_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import simhash_near_dup_pairs, simhash_wide_agg, token_hash_scalar

    docs = load_table(spark, sf_dir, "documents")
    # Corpus-wide (no source blocking — near-dups cross sources), over
    # whitespace/case-normalized text, the same canonical form the
    # exact-dedup fingerprint uses.  Fingerprints via the aggregation
    # tier (explode + codegen'd bit sums — the corpus-scale shape;
    # bit-identical to the HOF expression tier, see tests).  Tokens are
    # exploded BEFORE hashing so the md5 runs as a codegen'd projection
    # (hashing inside the array-building transform() lambda is
    # interpreted per token — ~4× slower end to end).
    norm = F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
    tok = docs.select("doc_id", F.explode(F.split(norm, " ")).alias("__t"))
    hashed = tok.select("doc_id", token_hash_scalar("__t").alias("th"))
    with_sim = simhash_wide_agg(
        hashed, ["doc_id"], "th", width=60, pre_exploded=True
    )
    return simhash_near_dup_pairs(
        with_sim, id_col="doc_id", simhash_col="sim", max_hamming=3,
        num_bands=4, band_bits=15,
    ).orderBy("id_a", "id_b")


from .dedup import simhash_wide_sql as _swide  # noqa: E402

register(
    Query(
        name="x_simhash_wide_near_dup",
        build=x_simhash_wide_near_dup,
        oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
            FROM documents
        ), s AS MATERIALIZED (
            SELECT doc_id, CAST({_swide('norm', 60)} AS BIGINT) AS sim FROM d
        )
        SELECT l.doc_id AS id_a, r.doc_id AS id_b,
               bit_count(xor(l.sim, r.sim)) AS hamming
        FROM s l JOIN s r ON l.doc_id < r.doc_id
        WHERE bit_count(xor(l.sim, r.sim)) <= 3
        ORDER BY id_a, id_b
        """,
        doc="60-bit SimHash near-dup pairs, 4x15-bit bands (scale-tier banding), oracled vs full self-join",
        bench=True,
        tags=("X2", "simhash"),
    )
)


# ------------------------------------------------- dedup clustering
# Pairs → components: the step that turns a near-dup pair list into a
# dedup decision (canonical doc = min id per cluster).  Min-label
# propagation (driver-looped fixed point, one shuffle per round; see
# connected_components) oracled against a recursive-CTE transitive
# closure — an independent formulation of the same components.
def x_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import connected_components, simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    with_sim = docs.select("doc_id", "source", simhash16("text").alias("sim"))
    pairs = simhash_near_dup_pairs(
        with_sim, id_col="doc_id", simhash_col="sim", max_hamming=3,
        block_col="source",
    )
    comp = connected_components(pairs, "id_a", "id_b")
    sizes = comp.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "cluster")
        .select(
            F.col("node").alias("doc_id"),
            F.col("cluster").alias("cluster_id"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )


register(
    Query(
        name="x_dedup_clusters",
        build=x_dedup_clusters,
        oracle=f"""
        WITH RECURSIVE s AS MATERIALIZED (
            SELECT doc_id, source, {_SH_SQL.format(text='text')} AS sim
            FROM documents
        ), pairs AS MATERIALIZED (
            SELECT l.doc_id AS id_a, r.doc_id AS id_b
            FROM s l JOIN s r ON l.source = r.source AND l.doc_id < r.doc_id
            WHERE bit_count(xor(l.sim, r.sim)) <= 3
        ), edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b AS u, id_a AS v FROM pairs
        ), reach(u, v) AS (
            SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        ), comp AS (
            SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u
        ), sizes AS (
            SELECT cluster_id, count(*) AS cluster_size
            FROM comp GROUP BY cluster_id
        )
        SELECT c.doc_id, c.cluster_id, z.cluster_size
        FROM comp c JOIN sizes z USING (cluster_id)
        ORDER BY doc_id
        """,
        doc="near-dup pairs clustered into components (min-label propagation vs recursive-CTE closure), canonical = min id",
        tags=("X1", "X2", "iterative"),
    )
)


# Contracted form of the same decision path: representatives per
# DISTINCT fingerprint, pairs + closure over representatives only,
# members inherit by fingerprint join.  Labels EVERY doc (singletons
# cluster with their exact duplicates), unlike x_dedup_clusters which
# only labels paired docs.  The banded pairing is exact for hd ≤ 3
# (pigeonhole over 4 bands), so the oracle can use the brute-force
# hamming join over representatives.
def x_dedup_clusters_contracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import contracted_simhash_clusters

    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select("doc_id", simhash16("text").alias("sim"))
    out = contracted_simhash_clusters(
        fps, id_col="doc_id", simhash_col="sim",
        max_hamming=3, num_bands=4, band_bits=4,
    )
    return out.select(
        F.col("id").alias("doc_id"), F.col("cluster").alias("cluster_id")
    ).orderBy("doc_id")


register(
    Query(
        name="x_dedup_clusters_contracted",
        build=x_dedup_clusters_contracted,
        oracle=f"""
        WITH RECURSIVE s AS MATERIALIZED (
            SELECT doc_id, {_SH_SQL.format(text='text')} AS sim
            FROM documents
        ), reps AS MATERIALIZED (
            SELECT sim, min(doc_id) AS rep FROM s GROUP BY sim
        ), pairs AS MATERIALIZED (
            SELECT l.rep AS id_a, r.rep AS id_b
            FROM reps l JOIN reps r ON l.rep < r.rep
            WHERE bit_count(xor(l.sim, r.sim)) <= 3
        ), edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b AS u, id_a AS v FROM pairs
        ), reach(u, v) AS (
            SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        ), comp AS (
            SELECT u AS rep, min(v) AS cluster FROM reach GROUP BY u
        )
        SELECT st.doc_id, COALESCE(c.cluster, rp.rep) AS cluster_id
        FROM s st JOIN reps rp USING (sim)
        LEFT JOIN comp c ON c.rep = rp.rep
        ORDER BY st.doc_id
        """,
        doc=(
            "fingerprint-contracted near-dup clustering: components "
            "over distinct fingerprints, members inherit by join "
            "(the corpus-entropy-bounded scale path)"
        ),
        tags=("X1", "X2", "iterative"),
    )
)


# Incremental-ingest check: the "new batch" (every 10th doc) against
# the remaining corpus.  The production shape behind the reference's
# incremental pipeline composed with near-dup dedup: each increment
# broadcasts against the standing band index instead of re-pairing
# the corpus.
def x_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import incremental_near_dup_check

    docs = load_table(spark, sf_dir, "documents")
    # One fingerprint pass (eager localCheckpoint, inside the run): the
    # new/corpus split otherwise re-evaluates simhash16 per side, and
    # the hamming filter's inferred isnotnull(sim) pushes through the
    # band Generate and re-derives the expression a third time on the
    # corpus side.  This is also the documented scale story — the
    # standing corpus fingerprints are a persisted index at ingest,
    # never recomputed per increment.
    fps = docs.select(
        "doc_id", simhash16("text").alias("sim")
    ).localCheckpoint(eager=True)
    new = fps.filter(F.col("doc_id") % 10 == 0)
    corpus = fps.filter(F.col("doc_id") % 10 != 0)
    return incremental_near_dup_check(
        new, corpus, max_hamming=3, num_bands=4, band_bits=4
    ).orderBy("new_id", "old_id")


register(
    Query(
        name="x_incremental_near_dup",
        build=x_incremental_near_dup,
        oracle=f"""
        WITH s AS MATERIALIZED (
            SELECT doc_id, {_SH_SQL.format(text='text')} AS sim
            FROM documents
        )
        SELECT n.doc_id AS new_id, c.doc_id AS old_id,
               bit_count(xor(n.sim, c.sim)) AS hamming
        FROM s n JOIN s c
          ON n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
        WHERE bit_count(xor(n.sim, c.sim)) <= 3
        ORDER BY new_id, old_id
        """,
        doc=(
            "incremental near-dup check: new batch banded-joined "
            "against the standing corpus band index (dedup-at-ingest)"
        ),
        tags=("X2", "incremental"),
    )
)


# The decision artifact: clusters → keep/drop per doc → per-source
# accounting.  Canonical = min id per component (the contracted path
# labels every doc, so singletons count as kept); the rollup is what a
# curation run reports and what the delete/rewrite step consumes.
def x_dedup_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import contracted_simhash_clusters

    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select("doc_id", simhash16("text").alias("sim"))
    labeled = contracted_simhash_clusters(
        fps, id_col="doc_id", simhash_col="sim",
        max_hamming=3, num_bands=4, band_bits=4,
    )
    decided = labeled.select(
        F.col("id").alias("doc_id"),
        (F.col("id") != F.col("cluster")).cast("int").alias("dropped"),
    )
    return (
        docs.join(decided, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("dropped").alias("n_dropped"),
        )
        .select(
            "source",
            "n_docs",
            "n_dropped",
            F.round((F.col("n_docs") - F.col("n_dropped")) / F.col("n_docs"), 4)
            .alias("keep_rate"),
        )
        .orderBy("source")
    )


register(
    Query(
        name="x_dedup_decision",
        build=x_dedup_decision,
        oracle=f"""
        WITH RECURSIVE s AS MATERIALIZED (
            SELECT doc_id, {_SH_SQL.format(text='text')} AS sim
            FROM documents
        ), reps AS MATERIALIZED (
            SELECT sim, min(doc_id) AS rep FROM s GROUP BY sim
        ), pairs AS MATERIALIZED (
            SELECT l.rep AS id_a, r.rep AS id_b
            FROM reps l JOIN reps r ON l.rep < r.rep
            WHERE bit_count(xor(l.sim, r.sim)) <= 3
        ), edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b AS u, id_a AS v FROM pairs
        ), reach(u, v) AS (
            SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        ), comp AS (
            SELECT u AS rep, min(v) AS cluster FROM reach GROUP BY u
        ), decided AS (
            SELECT st.doc_id,
                   CAST(st.doc_id <> COALESCE(c.cluster, rp.rep) AS INT)
                       AS dropped
            FROM s st JOIN reps rp USING (sim)
            LEFT JOIN comp c ON c.rep = rp.rep
        )
        SELECT d.source,
               count(*) AS n_docs,
               CAST(sum(dec.dropped) AS BIGINT) AS n_dropped,
               round((count(*) - sum(dec.dropped))::DOUBLE / count(*), 4)
                   AS keep_rate
        FROM documents d JOIN decided dec USING (doc_id)
        GROUP BY d.source ORDER BY d.source
        """,
        doc=(
            "near-dup survivorship decision: contracted clusters → "
            "keep/drop per doc → per-source keep-rate rollup"
        ),
        tags=("X1", "X2", "curation"),
    )
)


# ----------------------------- prefix-filtered set-similarity join
# PPJoin-style exact Jaccard join: order each document's shingle set by
# global rarity (document frequency asc), keep only the PREFIX that a
# >=t match cannot avoid sharing (|s| - ceil(t*|s|) + 1 rarest
# shingles), and generate candidates from an equi-join on prefix
# shingles — the inverted index touches ~half the postings, and rare-
# first ordering keeps posting lists short.  Exact verification runs on
# candidates only; the prefix filter is LOSSLESS for Jaccard >= t
# (completeness vs the brute-force all-pairs join is unit-tested).
# Fixture documents are mutually dissimilar, so near-duplicates are
# PLANTED deterministically (every STRIDE-th doc copied with one
# appended token — Jaccard ~ |s|/(|s|+3) ~ 0.94), same pattern as the
# t08 sign-LSH entry.
_SSJ_T = 0.5
_SSJ_STRIDE = 5
_SSJ_ID_OFFSET = 10_000_000


def _ssj_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % _SSJ_STRIDE == 0).select(
        (F.col("doc_id") + _SSJ_ID_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq0")).alias("text"),
    )
    return docs.union(planted)


_SSJ_CORPUS_SQL = f"""
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + {_SSJ_ID_OFFSET} AS doc_id, text || ' zq0' AS text
            FROM documents WHERE doc_id % {_SSJ_STRIDE} = 0
"""


_SETSIM_CACHE: list[DataFrame] = []  # persisted set handles, oldest first
_SETSIM_CACHE_MAX = 4  # bounded: older handles auto-unpersist beyond this


def release_setsim_cache() -> int:
    """Unpersist every set representation ``setsim_prefix_join`` cached
    (``persist_sets`` True or auto-on) and drop the handles; returns the
    number released.  Long sessions that sweep the operator repeatedly
    (stress loops, catalog sweeps) should call this between rounds —
    otherwise the registry itself bounds accumulation at
    ``_SETSIM_CACHE_MAX`` by unpersisting the oldest handle."""
    n = len(_SETSIM_CACHE)
    for df in _SETSIM_CACHE:
        try:
            df.unpersist()
        except Exception:
            pass
    _SETSIM_CACHE.clear()
    return n


def _plan_is_trivial(df: DataFrame) -> bool:
    """True when ``df``'s analyzed plan is scan-shaped (relations,
    projections, filters only) — recomputing it ×4 is then as cheap as
    reading it from cache, so auto mode skips the persist.  Any
    recomputation-heavy node (join, aggregate, union, explode, window,
    dedup) makes the plan non-trivial.  A bare ``Sort`` does NOT: a
    scan+orderBy recomputes for the price of the scan (the operator
    re-shuffles by shingle anyway, so the input order is irrelevant),
    and counting it heavy made auto mode persist corpora for no
    benefit (r7 verdict).  Inspection failure (plan string
    unavailable) is treated as trivial: not persisting is always
    correct, merely slower."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return True
    heavy = (
        "Join", "Aggregate", "Union", "Generate", "Window",
        "Deduplicate", "Distinct", "Expand",
    )
    return not any(node in plan for node in heavy)


def setsim_prefix_join(
    corpus: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = _SSJ_T,
    encode_ids: bool = False,
    persist_sets: bool | None = None,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via prefix filtering.

    Verification never builds a union array: |A∪B| = |A|+|B|-|A∩B|
    from precomputed sizes, so each candidate pair costs one
    intersect.  ``encode_ids=True`` is the scale tier: the verify
    joins ship arrays of xxhash64 shingle ids (8 bytes/element)
    instead of the shingle strings (~25 bytes) — at x100 stress the
    string arrays dominate the verify shuffle.  A 64-bit collision
    between a shingle of A and a different shingle of B would inflate
    one intersection by 1 (P ~ |A|·|B|/2^64 per pair — negligible,
    and excluded from the oracle tier which keeps strings).

    The plan references the ordered-set representation (and therefore
    the whole INPUT subtree above it) four times — prefix postings ×2
    via the self-join, verify sets ×2.  ``persist_sets=True`` caches
    AND eagerly materializes that representation so an expensive
    upstream (e.g. a full-corpus exact-dedup pass feeding the
    survivors in) executes ONCE: the ×1000 stress measured 309.6 s
    as-shipped vs 23.6 s with the barrier — the whole superlinear
    growth was recomputation of the 5M-doc upstream, not the join
    itself (a lazy persist alone recovers almost nothing: AQE races
    the four branches into the cold cache; BASELINE.md quad-verify
    section).

    ``persist_sets=None`` (default) AUTO-DECIDES by the rule the ×1000
    stress established: persist iff the corpus plan is non-trivial
    (contains a join / aggregate / union / explode / window / dedup
    node — i.e. recomputing it ×4 is real work); a bare scan+filter
    recomputes for free and skips the cache.  Cached handles are owned
    by this module: :func:`release_setsim_cache` frees them, and the
    registry auto-unpersists the oldest beyond its bound so repeated
    calls in one session cannot accumulate executor storage without
    limit.
    """
    from .dedup import shingles

    sh = corpus.select(id_col, shingles(text_col).alias("sh")).filter(
        F.size("sh") > 0
    )
    ex = sh.select(id_col, F.explode("sh").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count("*").alias("df"))
    ordered = (
        ex.join(dfreq, "s")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "s"))), lambda x: x["s"]
            ).alias("oset")
        )
        .withColumn(
            "prefix",
            F.slice(
                "oset",
                1,
                (
                    F.size("oset")
                    - F.ceil(F.lit(threshold) * F.size("oset"))
                    + 1
                ).cast("int"),
            ),
        )
    )
    if persist_sets is None:
        persist_sets = not _plan_is_trivial(corpus)
    if persist_sets:
        # EAGER materialization, not just a lazy persist: within one
        # action, AQE submits the four consumer branches' stages
        # concurrently and each races to compute the not-yet-populated
        # cache — measured at ×1000: 309.6 s unpersisted, 240.9 s lazy
        # persist, 23.6 s with the barrier (BASELINE.md quad-verify
        # section).  The count() is one job over the (entropy-bounded)
        # set representation and is the whole point of the flag.
        ordered = ordered.persist()
        ordered.count()
        _SETSIM_CACHE.append(ordered)
        while len(_SETSIM_CACHE) > _SETSIM_CACHE_MAX:
            try:
                _SETSIM_CACHE.pop(0).unpersist()
            except Exception:
                pass
    pre = ordered.select(id_col, F.explode("prefix").alias("s"))
    cand = (
        pre.alias("a")
        .join(pre.alias("b"), "s")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    vset = F.col("oset")
    if encode_ids:
        vset = F.transform("oset", lambda s: F.xxhash64(s))
    sets = ordered.select(
        id_col, vset.alias("vset"), F.size("oset").alias("nsh")
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    return (
        cand.join(
            sets.select(
                F.col(id_col).alias("id_a"),
                F.col("vset").alias("sa"),
                F.col("nsh").alias("na"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("id_b"),
                F.col("vset").alias("sb"),
                F.col("nsh").alias("nb"),
            ),
            "id_b",
        )
        # generator barrier (see lsh_candidate_pairs): CollapseProject
        # would re-inline a plain projected alias into both references,
        # re-evaluating the intersect — explode(array(...)) blocks it
        .select(
            "id_a", "id_b", "na", "nb",
            F.explode(F.array(inter)).alias("inter"),
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def x_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return setsim_prefix_join(_ssj_corpus(spark, sf_dir)).orderBy("id_a", "id_b")


register(
    Query(
        name="x_setsim_prefix_join",
        build=x_setsim_prefix_join,
        oracle=f"""
        WITH corpus AS MATERIALIZED ({_SSJ_CORPUS_SQL}),
        sh AS MATERIALIZED (
            SELECT doc_id, {_SH} AS sh FROM corpus WHERE len({_SH}) > 0
        ), ex AS (
            SELECT doc_id, unnest(sh) AS s FROM sh
        ), dfreq AS (
            SELECT s, count(*) AS df FROM ex GROUP BY s
        ), ordered AS MATERIALIZED (
            SELECT e.doc_id, list(e.s ORDER BY d.df, e.s) AS oset
            FROM ex e JOIN dfreq d USING (s) GROUP BY e.doc_id
        ), pre AS (
            SELECT doc_id, unnest(oset[1 : len(oset)
                   - CAST(ceil({_SSJ_T} * len(oset)) AS INTEGER) + 1]) AS s
            FROM ordered
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM pre a JOIN pre b ON a.s = b.s AND a.doc_id < b.doc_id
        )
        SELECT c.id_a, c.id_b,
               round(CAST(len(list_filter(x.oset, v -> list_contains(y.oset, v)))
                          AS DOUBLE)
                     / len(list_distinct(list_concat(x.oset, y.oset))), 6)
                   AS jaccard
        FROM cand c
        JOIN ordered x ON x.doc_id = c.id_a
        JOIN ordered y ON y.doc_id = c.id_b
        WHERE round(CAST(len(list_filter(x.oset, v -> list_contains(y.oset, v)))
                         AS DOUBLE)
                    / len(list_distinct(list_concat(x.oset, y.oset))), 6)
              >= {_SSJ_T}
        ORDER BY id_a, id_b
        """,
        doc=(
            "PPJoin-style prefix-filtered exact Jaccard join: rare-first "
            "shingle ordering, lossless prefix candidate generation, "
            "verify on candidates only (X2 scale tier)"
        ),
        tags=("X2", "similarity-join"),
    )
)


# --------------------------------- SymSpell deletion-neighborhood join
# Fuzzy string matching at scale: instead of an edit-distance theta-join
# (O(n²) levenshtein calls), each clean name indexes its single-DELETION
# variants and corrupted strings join that index by EXACT equality — the
# SymSpell trick: if B = A minus one character, then B ∈ deletions(A).
# Candidate generation is an equi-join on a string key (broadcastable /
# shuffle-hash — never a cross join); levenshtein runs only on
# candidates.  Corrupted variants are PLANTED deterministically (delete
# the (c_custkey mod len)-th character), so ground truth is exact.
_SYM_ID_OFFSET = 10_000_000


def _sym_variants_sql(col: str) -> str:
    """Spark SQL expr: the array of single-deletion variants of ``col``."""
    return (
        f"array_distinct(transform(sequence(1, length({col})),"
        f" i -> concat(substring({col}, 1, i - 1),"
        f" substring({col}, i + 1, length({col})))))"
    )


_SYM_VARIANTS_SQL = _sym_variants_sql("c_name")


def symspell_fuzzy_join(cust: DataFrame, *, encode_ids: bool = False) -> DataFrame:
    """SymSpell deletion-neighborhood fuzzy join over ``(c_custkey,
    c_name)``: exact equi-join on single-deletion variants replaces the
    O(n²) edit-distance theta-join; levenshtein verifies candidates
    only.

    ``encode_ids=True`` is the scale tier (the engine's standing
    string-tier/hash-tier split, see ``setsim_prefix_join``): the
    candidate join ships ``(orig_id, xxhash64(variant))`` — 16 bytes —
    instead of ``(orig_id, orig_name, variant)`` strings (~60 bytes),
    and names are re-joined only for the FEW surviving candidate pairs
    before the exact verify.  The ×1000 stress measured the string-key
    shuffle (279M exploded variant rows, ~17 GB) crossing the
    single-node spill cliff; the hashed keys cut that volume ~4×.
    Lossless BY CONSTRUCTION, not probabilistically: every hash-tier
    candidate is re-verified by exact deletion-set membership
    (``corrupt_name ∈ variants(orig_name)``) before the levenshtein
    filter — the string tier's equi-join IS that membership test, so a
    64-bit collision can never survive into the output even when the
    colliding string happens to sit within edit distance 1 (e.g. a
    substitution), and both tiers share one oracle verbatim.  The
    operator output is UNSORTED (a global sort on corpus-sized output
    is the one plan shape that must not live inside an operator at
    100×); the catalog wrappers order for the hash comparator."""
    corrupted = cust.select(
        (F.col("c_custkey") + _SYM_ID_OFFSET).alias("corrupt_id"),
        F.expr(
            "concat(substring(c_name, 1, cast(c_custkey % length(c_name) as int)),"
            " substring(c_name, cast(c_custkey % length(c_name) as int) + 2,"
            " length(c_name)))"
        ).alias("corrupt_name"),
    )
    if encode_ids:
        # r12 (guide §2.4, verdict item): the names ride the posting
        # shuffle instead of being re-joined afterwards.  The r11 form
        # shipped 16-byte (orig_id, vh) postings, then paid a
        # candidate-distinct exchange plus TWO candidate-sized re-joins
        # to recover the names for the verify — and on this corpus
        # every candidate survives (148k of 148k at sf0.1), so the
        # re-join stages dominated the query (5.6 s vs 1.7 s for the
        # string tier).  Carrying orig_name makes a posting row
        # (orig_id, orig_name, vh) ≈ 34 B — still ~25% less than the
        # string tier's (orig_id, orig_name, variant) string-keyed row,
        # with the join key a fixed 8-byte long — while the corrupt
        # side is unexploded (one row per customer), so carrying
        # corrupt_name there is ~free.  The pre-verify distinct is
        # dropped: duplicate candidates can only arise from a 64-bit
        # collision between two DISTINCT deletion variants of one name
        # and the same corrupt string, and the final DISTINCT (shared
        # with the string tier) already removes any such duplicate.
        deletions_h = cust.select(
            F.col("c_custkey").alias("orig_id"),
            F.col("c_name").alias("orig_name"),
            F.explode(F.expr(_SYM_VARIANTS_SQL)).alias("variant"),
        ).select("orig_id", "orig_name", F.xxhash64("variant").alias("vh"))
        corrupted_h = corrupted.select(
            "corrupt_id", "corrupt_name", F.xxhash64("corrupt_name").alias("vh")
        )
        # exact membership re-verify on candidates, which makes the
        # hash tier collision-proof (see docstring).  Membership in the
        # single-deletion set has a closed form: corrupt ∈
        # deletions(orig) ⟺ len(orig) = len(corrupt) + 1 AND
        # levenshtein(orig, corrupt) = 1 (a one-edit transform that
        # shortens by one char can only be a deletion).  Precondition:
        # orig_name is non-empty — deletions('') contains '' in the
        # array form but fails the length test here; unreachable for
        # customer names, which are never empty.  The predicate
        # form runs as a codegen'd builtin; rebuilding the variant
        # ARRAY per candidate row was an interpreted ~len(name)-
        # substring HOF that dominated the query when candidates are
        # plentiful (TPCH customer names are near-identical).
        matched = deletions_h.join(corrupted_h, "vh").filter(
            (F.length("orig_name") == F.length("corrupt_name") + 1)
            & (F.levenshtein("orig_name", "corrupt_name") == 1)
        )
    else:
        deletions = cust.select(
            F.col("c_custkey").alias("orig_id"),
            F.col("c_name").alias("orig_name"),
            F.explode(F.expr(_SYM_VARIANTS_SQL)).alias("variant"),
        )
        matched = deletions.join(
            corrupted, deletions.variant == corrupted.corrupt_name
        )
    return (
        matched.select(
            "orig_id",
            "corrupt_id",
            "orig_name",
            "corrupt_name",
            F.levenshtein("orig_name", "corrupt_name").alias("distance"),
        )
        .filter(F.col("distance") <= 1)
        .distinct()
    )


def x_symspell_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return symspell_fuzzy_join(cust).orderBy("orig_id", "corrupt_id")


def x_symspell_fuzzy_join_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale tier: hashed 16-byte candidate keys, names re-joined for
    the verify only — identical output, shared oracle."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return symspell_fuzzy_join(cust, encode_ids=True).orderBy(
        "orig_id", "corrupt_id"
    )


_SYM_ORACLE = f"""
        WITH corrupted AS (
            SELECT c_custkey + {_SYM_ID_OFFSET} AS corrupt_id,
                   substr(c_name, 1, CAST(c_custkey % len(c_name) AS INTEGER))
                   || substr(c_name,
                             CAST(c_custkey % len(c_name) AS INTEGER) + 2,
                             len(c_name)) AS corrupt_name
            FROM customer
        ), deletions AS (
            SELECT c_custkey AS orig_id, c_name AS orig_name,
                   unnest(list_distinct(list_transform(
                       range(1, len(c_name) + 1),
                       i -> substr(c_name, 1, i - 1)
                            || substr(c_name, i + 1, len(c_name))))) AS variant
            FROM customer
        )
        SELECT DISTINCT d.orig_id, c.corrupt_id, d.orig_name, c.corrupt_name,
               levenshtein(d.orig_name, c.corrupt_name) AS distance
        FROM deletions d JOIN corrupted c ON d.variant = c.corrupt_name
        WHERE levenshtein(d.orig_name, c.corrupt_name) <= 1
        ORDER BY orig_id, corrupt_id
        """

register(
    Query(
        name="x_symspell_fuzzy_join",
        build=x_symspell_fuzzy_join,
        oracle=_SYM_ORACLE,
        doc=(
            "SymSpell deletion-neighborhood fuzzy join: exact equi-join on "
            "single-deletion variants replaces the O(n²) edit-distance "
            "theta-join; levenshtein verifies candidates only (X2 tier)"
        ),
        tags=("X2", "fuzzy-join"),
    )
)

register(
    Query(
        name="x_symspell_fuzzy_join_fast",
        build=x_symspell_fuzzy_join_fast,
        oracle=_SYM_ORACLE,  # shared verbatim: exact verify makes hashing lossless
        doc=(
            "SymSpell scale tier: candidate equi-join on xxhash64(variant) "
            "16-byte keys (~4× less shuffle than the string keys), names "
            "re-joined for the few candidates before the exact verify — "
            "identical output, shared oracle (X2)"
        ),
        tags=("X2", "fuzzy-join", "scale"),
    )
)


# ------------------------------- asymmetric containment (quote) join
# Quote/excerpt detection: containment(Q→D) = |sh(Q) ∩ sh(D)| / |sh(Q)|
# — asymmetric, so a short quote inside a long document scores ~1 where
# Jaccard would vanish.  Prefix filtering stays lossless on the QUOTE
# side only (pigeonhole: >= ceil(t·|Q|) shared shingles cannot all
# avoid a (|Q| - ceil(t·|Q|) + 1)-element prefix), so candidates come
# from quote-prefix postings joined against the documents' FULL posting
# index; verification touches candidates only.  Quotes are PLANTED
# (first 12 tokens of every 7th document), giving exact ground truth.
_CONT_T = 0.8
_CONT_STRIDE = 7
_CONT_TOKENS = 12
_CONT_ID_OFFSET = 20_000_000


def x_quote_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import shingles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    quotes = docs.filter(F.col("doc_id") % _CONT_STRIDE == 0).select(
        (F.col("doc_id") + _CONT_ID_OFFSET).alias("quote_id"),
        F.array_join(
            F.slice(F.split("text", " "), 1, _CONT_TOKENS), " "
        ).alias("qtext"),
    )
    # Shingle each side once.  The quote table is small (one row per
    # STRIDE-th document, ≤ 10 shingles) and keeps its per-doc array
    # checkpoint; the DOCUMENT side is checkpointed as EXPLODED
    # (doc_id, shingle) postings (r12): the r11 form materialized the
    # full per-document shingle ARRAYS for the whole corpus — rows
    # whose width scales with document length (the r11 verdict's
    # executor-memory concern) — solely so the verify could run
    # array_intersect.  Shingles are DISTINCT per document (see
    # ``shingles``), so |qsh ∩ dsh| equals the number of matching
    # postings, and the verify below counts join matches instead of
    # intersecting arrays: no corpus-scale array cells anywhere, and
    # the postings table is the same one the document-frequency pass
    # and the candidate join already consume.
    qsh = (
        quotes.select("quote_id", shingles("qtext").alias("qsh"))
        .filter(F.size("qsh") > 0)
        .localCheckpoint(eager=True)
    )
    dex = (
        docs.select("doc_id", F.explode(shingles("text")).alias("s"))
        .localCheckpoint(eager=True)
    )

    # rare-first ordering of the quote prefix (shortest postings)
    qex = qsh.select("quote_id", F.explode("qsh").alias("s"))
    dfreq = dex.groupBy("s").agg(F.count("*").alias("df"))
    qordered = (
        qex.join(dfreq, "s", "left")
        .fillna({"df": 0})
        .groupBy("quote_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "s"))), lambda x: x["s"]
            ).alias("oset")
        )
        .select(
            "quote_id",
            F.slice(
                "oset",
                1,
                (
                    F.size("oset") - F.ceil(F.lit(_CONT_T) * F.size("oset")) + 1
                ).cast("int"),
            ).alias("prefix"),
        )
    )
    cand = (
        qordered.select("quote_id", F.explode("prefix").alias("s"))
        .join(dex, "s")
        .select("quote_id", "doc_id")
        .distinct()
    )
    # verify: count shared postings per candidate pair (= intersection
    # size, both sides distinct), then containment = shared / |qsh|
    shared = (
        cand.join(qex, "quote_id")
        .join(dex, ["doc_id", "s"])
        .groupBy("quote_id", "doc_id")
        .agg(F.count("*").alias("__shared"))
    )
    qsize = qsh.select("quote_id", F.size("qsh").alias("__nq"))
    return (
        shared.join(qsize, "quote_id")
        .select(
            "quote_id",
            "doc_id",
            F.round(F.col("__shared") / F.col("__nq"), 6).alias("containment"),
        )
        .filter(F.col("containment") >= _CONT_T)
        .orderBy("quote_id", "doc_id")
    )


register(
    Query(
        name="x_quote_containment_join",
        build=x_quote_containment_join,
        oracle=f"""
        WITH docs AS (SELECT doc_id, text FROM documents),
        quotes AS (
            SELECT doc_id + {_CONT_ID_OFFSET} AS quote_id,
                   array_to_string(string_split(text, ' ')[1:{_CONT_TOKENS}], ' ')
                       AS qtext
            FROM docs WHERE doc_id % {_CONT_STRIDE} = 0
        ), qsh AS MATERIALIZED (
            SELECT quote_id, {shingles_sql("qtext")} AS qsh FROM quotes
            WHERE len({shingles_sql("qtext")}) > 0
        ), dsh AS MATERIALIZED (
            SELECT doc_id, {_SH} AS dsh FROM docs WHERE len({_SH}) > 0
        ), dex AS (
            SELECT doc_id, unnest(dsh) AS s FROM dsh
        ), dfreq AS (
            SELECT s, count(*) AS df FROM dex GROUP BY s
        ), qordered AS MATERIALIZED (
            SELECT q.quote_id,
                   list(q.s ORDER BY coalesce(d.df, 0), q.s) AS oset
            FROM (SELECT quote_id, unnest(qsh) AS s FROM qsh) q
            LEFT JOIN dfreq d USING (s)
            GROUP BY q.quote_id
        ), cand AS (
            SELECT DISTINCT p.quote_id, dex.doc_id
            FROM (SELECT quote_id,
                         unnest(oset[1 : len(oset)
                                - CAST(ceil({_CONT_T} * len(oset)) AS INTEGER)
                                + 1]) AS s
                  FROM qordered) p
            JOIN dex USING (s)
        )
        SELECT c.quote_id, c.doc_id,
               round(CAST(len(list_filter(q.qsh, v -> list_contains(d.dsh, v)))
                          AS DOUBLE) / len(q.qsh), 6) AS containment
        FROM cand c
        JOIN qsh q ON q.quote_id = c.quote_id
        JOIN dsh d ON d.doc_id = c.doc_id
        WHERE round(CAST(len(list_filter(q.qsh, v -> list_contains(d.dsh, v)))
                         AS DOUBLE) / len(q.qsh), 6) >= {_CONT_T}
        ORDER BY c.quote_id, c.doc_id
        """,
        doc=(
            "asymmetric containment join (quote/excerpt detection): "
            "lossless prefix on the quote side vs full document posting "
            "index, verify on candidates only (X2 tier)"
        ),
        tags=("X2", "similarity-join"),
    )
)


# --------------------------------------- MinHash as a Jaccard estimator
# The estimator property behind every MinHash application: the fraction
# of agreeing signature components estimates Jaccard (E[match_k] = J,
# sd = sqrt(J(1-J)/k) under min-wise independence).  LSH
# (x_minhash_lsh) uses the signatures for bucketing; this entry closes
# the theory loop by measuring estimator error against EXACT Jaccard on
# the planted near-dup pairs.  Caveat measured honestly here: the
# affine permutation family (A_s linear in s) is only APPROXIMATELY
# min-wise independent — on small shingle sets component errors
# correlate, so a few pairs exceed the iid 5-sigma envelope (observed:
# 1/100 pairs at |err| 0.28 where iid sd is 0.03).  The within_gate
# flag is computed identically on both engines (it reports, not
# enforces); aggregate accuracy (mean |err| <= 0.1, >=90% within 0.25)
# is unit-tested.
_MHJ_K = 32


def x_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import hashed_shingles, minhash_from_hashes, shingles

    corpus = _ssj_corpus(spark, sf_dir)
    base = corpus.select("doc_id", shingles("text").alias("sh")).filter(
        F.size("sh") > 0
    )
    # two-step hash → permute with the materialization barrier
    # (hashed_shingles docstring: no CSE inside HOF lambdas)
    hashed = base.select(
        "doc_id",
        "sh",
        F.explode(F.array(hashed_shingles(F.col("sh")))).alias("__hs"),
    )
    # One shingle+hash+minhash pass (eager localCheckpoint, inside the
    # run): both join sides below otherwise re-evaluate the whole
    # signature pipeline over their slice of the corpus.
    sigs = hashed.select(
        "doc_id", "sh", minhash_from_hashes(F.col("__hs"), _MHJ_K).alias("sig")
    ).localCheckpoint(eager=True)
    a = sigs.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh").alias("sa"),
        F.col("sig").alias("siga"),
    )
    b = sigs.select(
        (F.col("doc_id") - _SSJ_ID_OFFSET).alias("id_a"),
        F.col("doc_id").alias("id_b"),
        F.col("sh").alias("sb"),
        F.col("sig").alias("sigb"),
    ).filter(F.col("id_b") >= _SSJ_ID_OFFSET)
    matches = F.aggregate(
        F.zip_with("siga", "sigb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    return (
        a.join(b, "id_a")
        .select(
            "id_a",
            "id_b",
            F.explode(
                F.array(
                    F.struct(
                        F.round(matches / F.lit(_MHJ_K), 6).alias("est"),
                        inter.alias("inter"),
                        F.size("sa").alias("na"),
                        F.size("sb").alias("nb"),
                    )
                )
            ).alias("m"),
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("m.inter")
                / (F.col("m.na") + F.col("m.nb") - F.col("m.inter")),
                6,
            ).alias("exact_jaccard"),
            F.col("m.est").alias("minhash_estimate"),
            (
                F.abs(
                    F.col("m.est")
                    - F.col("m.inter")
                    / (F.col("m.na") + F.col("m.nb") - F.col("m.inter"))
                )
                <= 0.25
            )
            .cast("int")
            .alias("within_gate"),
        )
        .orderBy("id_a")
    )


def _mhj_oracle() -> str:
    sig = minhash_signature_sql("sh", _MHJ_K)
    return f"""
        WITH corpus AS MATERIALIZED ({_SSJ_CORPUS_SQL}),
        sh AS MATERIALIZED (
            SELECT doc_id, {_SH} AS sh FROM corpus WHERE len({_SH}) > 0
        ), sigs AS MATERIALIZED (
            SELECT doc_id, sh, {sig} AS sig FROM sh
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.sh AS sa, b.sh AS sb, a.sig AS siga, b.sig AS sigb
            FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + {_SSJ_ID_OFFSET}
        ), scored AS (
            SELECT id_a, id_b,
                   round(CAST(len(list_filter(sa, v -> list_contains(sb, v)))
                              AS DOUBLE)
                         / len(list_distinct(list_concat(sa, sb))), 6)
                       AS exact_jaccard,
                   round(CAST(len(list_filter(range(1, {_MHJ_K} + 1),
                                  i -> siga[i] = sigb[i])) AS DOUBLE)
                         / {_MHJ_K}, 6) AS minhash_estimate
            FROM pairs
        )
        SELECT id_a, id_b, exact_jaccard, minhash_estimate,
               CAST(CASE WHEN abs(minhash_estimate - exact_jaccard) <= 0.25
                         THEN 1 ELSE 0 END AS INTEGER) AS within_gate
        FROM scored ORDER BY id_a
        """


register(
    Query(
        name="x_minhash_jaccard_estimate",
        build=x_minhash_jaccard_estimate,
        oracle=_mhj_oracle(),
        doc=(
            "MinHash signature agreement as an unbiased Jaccard estimator "
            "(k=32) measured against exact Jaccard on planted near-dup "
            "pairs — the estimator contract behind the LSH tier (X2)"
        ),
        tags=("X2", "sketch"),
    )
)
