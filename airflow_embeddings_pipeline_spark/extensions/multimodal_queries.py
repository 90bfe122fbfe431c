"""Oracle-checked catalog entries for multimodal plumbing (X5).

The decode itself is a stub (no codecs in this container) — what the
oracle verifies is the real Spark-side machinery: binary payload
synthesis, Arrow-batched ``mapInPandas`` feature extraction, and the
frame-sampling explode.  Features are defined over the payload's hex
form so DuckDB (whose md5 only takes VARCHAR) computes the identical
values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import Query, register
from ..sources.registry import load_table
from .multimodal import attach_media, extract_features, resize_media, sample_frames

# payload = unhex(md5('0'||text) || md5('1'||text) || md5('2'||text) || md5('3'||text))
_PAYLOAD_HEX = (
    "concat(md5(concat('0', text)), md5(concat('1', text)), "
    "md5(concat('2', text)), md5(concat('3', text)))"
)
_MEDIA_TYPE = "(['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)]"


# ------------------------------------------------------------ features
def x_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs)
    return extract_features(media).orderBy("doc_id")


register(
    Query(
        name="x_multimodal_features",
        build=x_multimodal_features,
        oracle=f"""
        WITH media AS (
            SELECT doc_id, {_MEDIA_TYPE} AS media_type, {_PAYLOAD_HEX} AS hexp
            FROM documents
        )
        SELECT doc_id, media_type,
               CAST(length(hexp) / 2 AS INT) AS n_bytes,
               CAST(concat('0x', substring(md5(hexp), 1, 8)) AS BIGINT) AS checksum,
               round(list_sum(list_transform(range(1, CAST(length(hexp)/2 AS INT) + 1),
                     i -> CAST(concat('0x', substring(hexp, i*2-1, 2)) AS INT)))
                     / (length(hexp) / 2), 6) AS mean_byte
        FROM media ORDER BY doc_id
        """,
        doc="binary media payload + mapInPandas feature extraction (X5; decode stubbed)",
        tags=("X5",),
    )
)


# -------------------------------------------------------- frame sampling
def x_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs)
    return sample_frames(media, every_n_bytes=16).orderBy("doc_id", "frame_id")


register(
    Query(
        name="x_frame_sample",
        build=x_frame_sample,
        oracle=f"""
        WITH media AS (
            SELECT doc_id, {_MEDIA_TYPE} AS media_type, upper({_PAYLOAD_HEX}) AS hexp
            FROM documents
        )
        SELECT doc_id, b AS frame_id, substring(hexp, b*32 + 1, 32) AS frame_hex
        FROM media, unnest(range(greatest(CAST(length(hexp)/32 AS INT), 1))) AS t(b)
        WHERE media_type = 'video'
        ORDER BY doc_id, frame_id
        """,
        doc="video frame sampling over binary payloads (X5; stride slicing)",
        tags=("X5",),
    )
)


# --------------------------------------------------------------- resize
_RESIZE_T = 16


def x_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs)
    return resize_media(media, target_bytes=_RESIZE_T).orderBy("doc_id")


register(
    Query(
        name="x_media_resize",
        build=x_media_resize,
        oracle=f"""
        WITH media AS (
            SELECT doc_id, {_MEDIA_TYPE} AS media_type, {_PAYLOAD_HEX} AS hexp
            FROM documents
        ), rs AS (
            SELECT doc_id, media_type,
                   CAST(length(hexp) / 2 AS INT) AS orig_bytes,
                   array_to_string(list_transform(range({_RESIZE_T}),
                       i -> substring(hexp,
                            CAST((i * (length(hexp) // 2)) // {_RESIZE_T} AS INT)
                                * 2 + 1, 2)), '') AS rhex
            FROM media
        )
        SELECT doc_id, media_type, orig_bytes,
               CAST(length(rhex) / 2 AS INT) AS resized_bytes,
               CAST(concat('0x', substring(md5(rhex), 1, 8)) AS BIGINT)
                   AS resized_checksum
        FROM rs ORDER BY doc_id
        """,
        doc=(
            "media resize/resample plumbing: deterministic byte-stride "
            "subsample via mapInPandas (X5; codec stubbed)"
        ),
        tags=("X5",),
    )
)


# ------------------------------------------------- cross-modal match
# Cross-modal retrieval mechanics: media feature vectors (mapInPandas
# encoder plumbing, fake tier = first 8 payload bytes) matched by
# cosine against per-label centroids of the text-embedding space
# (first 8 dims, exact-mean rounded).  The centroid set is bounded
# (one row per label) and ships as literals under a single generated
# expression — assignment is a map-only argmax, no similarity join.
# A real deployment swaps the fake encoder for a model in embed_media
# and keeps every schema and the plan shape.
_XM_DIM = 8


def x_crossmodal_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import embed_media

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    media = embed_media(attach_media(docs), dim=_XM_DIM)

    cent_rows = (
        emb.groupBy("label")
        .agg(
            *[
                F.round(F.avg(F.col("embedding")[i].cast("double")), 9).alias(
                    f"m{i}"
                )
                for i in range(_XM_DIM)
            ]
        )
        .orderBy("label")
        .collect()
    )
    labels = [int(r["label"]) for r in cent_rows]

    def lit(x: float) -> str:
        return repr(float(x)) + "D"

    mnorm = "sqrt(" + " + ".join(
        f"mvec[{i}] * mvec[{i}]" for i in range(_XM_DIM)
    ) + ")"
    coss = []
    for r in cent_rows:
        c = [float(r[f"m{i}"]) for i in range(_XM_DIM)]
        dot = " + ".join(f"mvec[{i}] * {lit(c[i])}" for i in range(_XM_DIM))
        cnorm = 0.0
        for x in c:
            cnorm += x * x
        import math

        coss.append(f"round(({dot}) / ({mnorm} * {lit(math.sqrt(cnorm))}), 6)")
    arr = ", ".join(coss)
    label_arr = ", ".join(str(l) for l in labels)
    best = F.expr(
        f"element_at(array({label_arr}), "
        f"CAST(array_position(array({arr}), array_max(array({arr}))) AS INT))"
    )
    return (
        media.select("media_type", best.alias("label"))
        .groupBy("media_type", "label")
        .agg(F.count("*").alias("n"))
        .orderBy("media_type", "label")
    )


def _xm_oracle() -> str:
    mcols = ",\n                   ".join(
        f"round(avg(CAST(embedding[{i + 1}] AS DOUBLE)), 9) AS m{i}"
        for i in range(_XM_DIM)
    )
    dot = " + ".join(f"mvec[{i + 1}] * c.m{i}" for i in range(_XM_DIM))
    mnorm = "sqrt(" + " + ".join(
        f"mvec[{i + 1}] * mvec[{i + 1}]" for i in range(_XM_DIM)
    ) + ")"
    cnorm = "sqrt(" + " + ".join(f"c.m{i} * c.m{i}" for i in range(_XM_DIM)) + ")"
    return f"""
        WITH media AS (
            SELECT doc_id, {_MEDIA_TYPE} AS media_type, {_PAYLOAD_HEX} AS hexp
            FROM documents
        ), mv AS (
            SELECT doc_id, media_type,
                   list_transform(range(1, {_XM_DIM} + 1),
                       i -> CAST(CAST(concat('0x', substring(hexp, i*2-1, 2))
                                      AS INT) AS DOUBLE)) AS mvec
            FROM media
        ), cents AS (
            SELECT label, {mcols} FROM embeddings GROUP BY label
        ), scored AS (
            SELECT mv.doc_id, mv.media_type, c.label,
                   round(({dot}) / ({mnorm} * {cnorm}), 6) AS cos
            FROM mv CROSS JOIN cents c
        ), best AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY cos DESC, label) AS rn
            FROM scored
        )
        SELECT media_type, label, count(*) AS n
        FROM best WHERE rn = 1
        GROUP BY media_type, label ORDER BY media_type, label
        """


register(
    Query(
        name="x_crossmodal_match",
        build=x_crossmodal_match,
        oracle=_xm_oracle(),
        doc=(
            "cross-modal matching: mapInPandas media feature vectors vs "
            "per-label text-embedding centroids, map-only literal argmax "
            "(X5 retrieval plumbing; encoder stubbed deterministically)"
        ),
        tags=("X5", "X3", "retrieval"),
    )
)


# ------------------------------------ perceptual-hash image near-dup
# Image dedup without decoding: a 60-bit aHash (byte > corpus-free
# per-payload mean threshold, integer-exact b*64 > sum compare) over
# the opaque payload bytes, then the SAME banded-hamming machinery the
# text SimHash tier uses (4×15-bit bands, exact for hamming ≤ 3 by
# pigeonhole).  Near-duplicate images are PLANTED deterministically
# (every 30th doc's image payload re-appears with two bytes bumped —
# ≤ 2 threshold bits can differ), so candidate generation and verify
# run against known ground truth and the oracle is a full self-join.
# The real-codec tier swaps payload bytes for decoded gray pixels
# (extract_features) with the identical downstream plan.  Scale shape:
# map-only hashing, one bucket shuffle, no all-pairs join.
_PH_ID_OFFSET = 10_000_000
_PH_BUMP = 7

_PH_BARR_SPARK = (
    "transform(sequence(0, 63), i -> "
    "CAST(conv(substring(hx, i * 2 + 1, 2), 16, 10) AS BIGINT))"
)
_PH_AHASH_SPARK = (
    "CAST(aggregate(sequence(0, 59), CAST(0 AS BIGINT), (a, i) -> "
    "a + IF(element_at(barr, i + 1) * 64 > total, "
    "shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))) AS BIGINT)"
)


def x_media_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    images = attach_media(docs).filter(F.col("media_type") == "image")
    base = images.select("doc_id", F.lower(F.hex("payload")).alias("hx"))
    bump = (
        f"concat(substring(hx, 1, 6), "
        f"lower(lpad(hex((conv(substring(hx, 7, 2), 16, 10) + {_PH_BUMP}) % 256), 2, '0')), "
        f"substring(hx, 9, 26), "
        f"lower(lpad(hex((conv(substring(hx, 35, 2), 16, 10) + {_PH_BUMP}) % 256), 2, '0')), "
        f"substring(hx, 37, 92))"
    )
    planted = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + _PH_ID_OFFSET).alias("doc_id"),
        F.expr(bump).alias("hx"),
    )
    corpus = base.union(planted)
    # generator barriers between the three projections: CollapseProject
    # would otherwise re-inline the 64-conv byte array into both the
    # total and each of the 60 bit terms
    with_bytes = corpus.select(
        "doc_id", F.explode(F.array(F.expr(_PH_BARR_SPARK))).alias("barr")
    )
    with_total = with_bytes.select(
        "doc_id",
        "barr",
        F.explode(
            F.array(F.expr("aggregate(barr, CAST(0 AS BIGINT), (a, x) -> a + x)"))
        ).alias("total"),
    )
    # Materialize the (doc_id, ahash) fingerprint table once (eager
    # localCheckpoint, computed inside every run): it is consumed five
    # times below (fps group-by, both membership joins, both intra
    # self-join sides), and each lazy consumer re-ran the whole
    # hex→bytes→total→hash chain — plus a pushed-down isnotnull per
    # join key re-deriving it again (6 duplicated filter copies in the
    # pre-change plan).  Guide §8: hash the payload once, decide on the
    # 16-byte proxy.
    hashed = with_total.select(
        "doc_id", F.expr(_PH_AHASH_SPARK).alias("ahash")
    ).localCheckpoint(eager=True)
    # Fingerprint contraction (the proven sign-LSH/MinHash ordering —
    # BASELINE.md's exact-first lesson): band and verify over DISTINCT
    # aHash values only, so the banded-join cost is bounded by corpus
    # ENTROPY, not corpus size — on a replica-heavy corpus (the ×400
    # stress regime: exact byte copies share one aHash) the expensive
    # stage shrinks by the replication factor.  Pairs are then
    # reconstructed by two equi-joins back onto the membership table:
    # inter-fingerprint pairs inherit the representatives' hamming;
    # intra-fingerprint pairs (identical hash, hamming 0) come from a
    # members self-equi-join.  Output is identical to banding the raw
    # corpus (pair-bound by construction either way).
    fps = hashed.groupBy("ahash").agg(F.count("*").alias("__n"))
    inter_fp = simhash_near_dup_pairs(
        fps.select(F.col("ahash").alias("fp"), F.col("ahash")),
        id_col="fp", simhash_col="ahash",
        max_hamming=3, num_bands=4, band_bits=15, pair_mode="join",
    )
    mem_a = hashed.select(F.col("ahash").alias("fp_a"), F.col("doc_id").alias("da"))
    mem_b = hashed.select(F.col("ahash").alias("fp_b"), F.col("doc_id").alias("db"))
    inter = (
        inter_fp.join(mem_a, F.col("id_a") == F.col("fp_a"))
        .join(mem_b, F.col("id_b") == F.col("fp_b"))
        .select(
            F.least("da", "db").alias("id_a"),
            F.greatest("da", "db").alias("id_b"),
            "hamming",
        )
    )
    intra = (
        hashed.alias("l")
        .join(hashed.alias("r"), "ahash")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.bit_count(F.col("ahash").bitwiseXOR(F.col("ahash"))).alias("hamming"),
        )
    )
    return inter.unionByName(intra).orderBy("id_a", "id_b")


def _phash_oracle() -> str:
    # payload hex replicated from attach_media's md5-chain construction
    hx = "md5('0' || text) || md5('1' || text) || md5('2' || text) || md5('3' || text)"
    bump = (
        f"substr(hx, 1, 6) || "
        f"lower(printf('%02x', CAST((CAST('0x' || substr(hx, 7, 2) AS BIGINT) + {_PH_BUMP}) % 256 AS INTEGER))) || "
        f"substr(hx, 9, 26) || "
        f"lower(printf('%02x', CAST((CAST('0x' || substr(hx, 35, 2) AS BIGINT) + {_PH_BUMP}) % 256 AS INTEGER))) || "
        f"substr(hx, 37, 92)"
    )
    return f"""
        WITH img AS (
            SELECT doc_id, {hx} AS hx FROM documents WHERE doc_id % 3 = 0
        ), corpus AS (
            SELECT doc_id, hx FROM img
            UNION ALL
            SELECT doc_id + {_PH_ID_OFFSET} AS doc_id, {bump} AS hx
            FROM img WHERE doc_id % 10 = 0
        ), withb AS MATERIALIZED (
            SELECT doc_id,
                   list_transform(range(0, 64),
                       i -> CAST('0x' || substr(hx, i * 2 + 1, 2) AS BIGINT)) AS barr
            FROM corpus
        ), hashed AS MATERIALIZED (
            SELECT doc_id,
                   CAST(list_sum(list_transform(range(0, 60),
                       i -> CASE WHEN barr[i + 1] * 64 > list_sum(barr)
                                 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END))
                        AS BIGINT) AS ahash
            FROM withb
        )
        SELECT l.doc_id AS id_a, r.doc_id AS id_b,
               bit_count(xor(l.ahash, r.ahash)) AS hamming
        FROM hashed l JOIN hashed r ON l.doc_id < r.doc_id
        WHERE bit_count(xor(l.ahash, r.ahash)) <= 3
        ORDER BY id_a, id_b
        """


register(
    Query(
        name="x_media_phash_near_dup",
        build=x_media_phash_near_dup,
        oracle=_phash_oracle(),
        doc=(
            "perceptual-aHash image near-dup: 60-bit payload-byte hash, "
            "4×15-bit banded hamming buckets (exact ≤ 3), planted "
            "perturbed copies as ground truth; oracled vs full self-join"
        ),
        tags=("X5", "X2", "multimodal"),
    )
)
