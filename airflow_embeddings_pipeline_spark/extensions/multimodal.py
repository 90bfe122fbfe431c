"""Multimodal columns (X5): image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

Container note: no image/audio codecs ship in this environment, so the
actual byte→pixels/samples decode is STUBBED — ``use_real_codec=True``
raises ``NotImplementedError`` where PIL/ffmpeg would be called.  All
Spark-side plumbing is real and tested: schema (binary payload +
metadata struct), partition-sized Arrow batches, UDF signatures, and
deterministic fake features derived from the payload bytes so tests
and oracles have stable values.

Scale design: payloads stay opaque bytes end-to-end (no base64 inflation,
no driver round-trip); feature extraction is a map-only stage —
``spark.sql.files.maxPartitionBytes`` bounds the Arrow batch footprint,
and at 100 TB the operator is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<format:string, width:int, height:int, n_frames:int>"
)


def attach_media(docs: DataFrame, *, payload_repeat: int = 4) -> DataFrame:
    """Synthesize a deterministic binary payload column from document
    content (md5-chain bytes) plus typed metadata — the fixture-side
    stand-in for real image/audio bytes arriving from a lake."""
    payload = F.unhex(
        F.concat(*[F.md5(F.concat(F.lit(str(i)), F.col("text"))) for i in range(payload_repeat)])
    )
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        F.lit("fake/v1").alias("format"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
    )
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode_features(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for codec output: (n_bytes, checksum,
    mean_byte).  Checksum is md5 over the lowercase-hex form so the
    SQL oracle (DuckDB md5 takes VARCHAR only) computes the identical
    value.  Replace with PIL/soundfile decode in a full container."""
    checksum = int(hashlib.md5(payload.hex().encode()).hexdigest()[:8], 16)
    mean_byte = sum(payload) / len(payload) if payload else 0.0
    return len(payload), checksum, round(mean_byte, 6)


def extract_features(
    media: DataFrame, *, use_real_codec: bool = False
) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas`` —
    one Arrow batch in, one feature frame out, no shuffle.

    The batch function is fully self-contained (stdlib imports inside)
    so cloudpickle ships it by value: executor workers never need this
    package importable, which is exactly the situation when a driver
    process imports the engine from an arbitrary cwd."""
    out_schema = (
        "doc_id long, media_type string, n_bytes int, checksum long, mean_byte double"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def decode(payload: bytes) -> tuple[int, int, float]:
            checksum = int(_hl.md5(payload.hex().encode()).hexdigest()[:8], 16)
            mean_byte = sum(payload) / len(payload) if payload else 0.0
            return len(payload), checksum, round(mean_byte, 6)

        for pdf in batches:
            if use_real_codec:
                # Real path: PIL.Image.open(io.BytesIO(b)) / soundfile /
                # av frame iteration — codecs absent in this container.
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile/av; "
                    "not available in this environment"
                )
            feats = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": feats.map(lambda t: t[0]),
                    "checksum": feats.map(lambda t: t[1]),
                    "mean_byte": feats.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(op, schema=out_schema)


def resize_media(
    media: DataFrame, *, target_bytes: int = 16, use_real_codec: bool = False
) -> DataFrame:
    """Resize/resample plumbing: deterministic byte-stride subsample of
    the payload down to ``target_bytes`` (byte i of the output is byte
    ``(i·n)//t`` of the input) — the batch shape of an image resize /
    audio resample, minus the codec (``use_real_codec=True`` raises
    where PIL.thumbnail / soxr would run).  mapInPandas, map-only, no
    shuffle; payload bytes never leave the executor."""
    out_schema = (
        "doc_id long, media_type string, orig_bytes int, "
        "resized_bytes int, resized_checksum long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def shrink(payload: bytes) -> tuple[int, int, int]:
            if use_real_codec:
                raise NotImplementedError(
                    "real media resize requires PIL/soxr/av; "
                    "not available in this environment"
                )
            n = len(payload)
            t = min(target_bytes, n)
            out = bytes(payload[(i * n) // t] for i in range(t)) if t else b""
            checksum = int(_hl.md5(out.hex().encode()).hexdigest()[:8], 16)
            return n, len(out), checksum

        for pdf in batches:
            r = pdf["payload"].map(shrink)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "orig_bytes": r.map(lambda x: x[0]),
                    "resized_bytes": r.map(lambda x: x[1]),
                    "resized_checksum": r.map(lambda x: x[2]),
                }
            )

    return media.mapInPandas(op, schema=out_schema)


def sample_frames(media: DataFrame, *, every_n_bytes: int = 16) -> DataFrame:
    """Frame sampling for 'video' payloads: slice the byte stream into
    fixed-stride frames and emit one row per sampled frame (explode) —
    the batch-shape of video frame extraction, minus the codec."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(
                (F.length("payload") / every_n_bytes).cast("int") - 1, F.lit(0)
            ),
        ),
        lambda i: F.struct(
            i.alias("frame_id"),
            F.substring(F.hex("payload"), i * every_n_bytes * 2 + 1, every_n_bytes * 2)
            .alias("frame_hex"),
        ),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", F.explode(frames).alias("f"))
        .select("doc_id", F.col("f.frame_id").alias("frame_id"), F.col("f.frame_hex").alias("frame_hex"))
    )
