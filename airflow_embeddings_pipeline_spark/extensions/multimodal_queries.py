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
