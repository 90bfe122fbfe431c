"""Multimodal columns (X5): image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

Two tiers, selected by ``use_real_codec``:

* **fake tier (default, oracle path)** — deterministic features derived
  from the payload bytes so tests and DuckDB oracles have stable values.
  All Spark-side plumbing (schema, Arrow batch shape, UDF signatures,
  zero-shuffle map-only plan) is identical to the real tier.
* **real tier** — PIL (images) / soundfile (audio) decode, selected
  when the codec libraries are importable.  Availability is probed at
  OP-BUILD TIME on the driver (``probe_codecs``); if the needed codec
  is absent the builder raises :class:`CodecUnavailable` immediately —
  a clear driver-side signal, never a mid-job executor crash.  Rows
  whose bytes fail to decode yield NULL feature columns (quarantine
  semantics, E1) rather than failing the batch.

This container ships no codecs, so CI exercises the probe + the
detected-absent path; the real decode functions are plain library calls
that run unmodified in a full container.

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


class CodecUnavailable(RuntimeError):
    """Raised at op-build time when ``use_real_codec=True`` but the
    required codec library is not importable in this environment."""


def probe_codecs() -> dict[str, bool]:
    """Driver-side availability probe for the real-decode tier.

    Returns ``{"PIL": bool, "soundfile": bool, "av": bool}``.  Called at
    op-build time so a missing codec surfaces as an immediate, clear
    :class:`CodecUnavailable` on the driver instead of a serialized
    ImportError from inside an executor task."""
    import importlib

    out: dict[str, bool] = {}
    for mod in ("PIL", "soundfile", "av"):
        try:
            importlib.import_module(mod)
            out[mod] = True
        except Exception:
            out[mod] = False
    return out


def _require_codecs(*mods: str) -> None:
    avail = probe_codecs()
    missing = [m for m in mods if not avail.get(m)]
    if missing:
        raise CodecUnavailable(
            f"real media decode requires {missing} (detected absent at "
            "op-build probe); install the codec libraries or use the "
            "deterministic fake tier (use_real_codec=False)"
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
    process imports the engine from an arbitrary cwd.

    Real tier (``use_real_codec=True``; probed at build time): images
    decode via PIL (``mean_byte`` = mean grayscale pixel, ``checksum``
    = md5 over the pixel buffer), audio via soundfile (``mean_byte`` =
    mean |amplitude| scaled to byte range, ``checksum`` over the sample
    buffer).  Undecodable rows (wrong bytes, unknown media_type) yield
    NULL features instead of failing the Arrow batch."""
    if use_real_codec:
        _require_codecs("PIL", "soundfile")
    out_schema = (
        "doc_id long, media_type string, n_bytes int, checksum long, mean_byte double"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def fake_decode(payload: bytes, media_type: str) -> tuple:
            checksum = int(_hl.md5(payload.hex().encode()).hexdigest()[:8], 16)
            mean_byte = sum(payload) / len(payload) if payload else 0.0
            return len(payload), checksum, round(mean_byte, 6)

        def real_decode(payload: bytes, media_type: str) -> tuple:
            import io

            try:
                if media_type == "image":
                    from PIL import Image

                    pix = Image.open(io.BytesIO(payload)).convert("L").tobytes()
                    checksum = int(_hl.md5(pix.hex().encode()).hexdigest()[:8], 16)
                    mean = (sum(pix) / len(pix)) if pix else 0.0
                    return len(payload), checksum, round(mean, 6)
                if media_type == "audio":
                    import soundfile as sf

                    data, _rate = sf.read(io.BytesIO(payload))
                    buf = data.tobytes()
                    checksum = int(_hl.md5(buf.hex().encode()).hexdigest()[:8], 16)
                    mean = float(abs(data).mean() * 255.0) if data.size else 0.0
                    return len(payload), checksum, round(mean, 6)
                return None, None, None
            except Exception:
                return None, None, None

        decode = real_decode if use_real_codec else fake_decode
        for pdf in batches:
            feats = [
                decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [t[0] for t in feats],
                    "checksum": [t[1] for t in feats],
                    "mean_byte": [t[2] for t in feats],
                }
            )

    return media.mapInPandas(op, schema=out_schema)


def resize_media(
    media: DataFrame, *, target_bytes: int = 16, use_real_codec: bool = False
) -> DataFrame:
    """Resize/resample plumbing: deterministic byte-stride subsample of
    the payload down to ``target_bytes`` (byte i of the output is byte
    ``(i·n)//t`` of the input) — the batch shape of an image resize /
    audio resample.  mapInPandas, map-only, no shuffle; payload bytes
    never leave the executor.

    Real tier (``use_real_codec=True``; probed at build time): images
    are PIL-thumbnailed so the longest side is ``target_bytes`` pixels
    and re-encoded to PNG; undecodable rows yield NULL outputs."""
    if use_real_codec:
        _require_codecs("PIL")
    out_schema = (
        "doc_id long, media_type string, orig_bytes int, "
        "resized_bytes int, resized_checksum long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def shrink(payload: bytes) -> tuple:
            if use_real_codec:
                import io

                try:
                    from PIL import Image

                    img = Image.open(io.BytesIO(payload))
                    img.thumbnail((target_bytes, target_bytes))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out = buf.getvalue()
                except Exception:
                    return len(payload), None, None
                checksum = int(_hl.md5(out.hex().encode()).hexdigest()[:8], 16)
                return len(payload), len(out), checksum
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


def embed_media(media: DataFrame, *, dim: int = 8) -> DataFrame:
    """Media embedding plumbing: mapInPandas emits a ``dim``-float
    feature vector per payload — the batch shape of a vision/audio
    encoder.  The fake tier reads the first ``dim`` payload bytes as
    doubles (deterministic, SQL-replicable); a real tier would run the
    encoder model here with the identical schema and batch shape.
    Map-only, zero shuffle; payload bytes never leave the executor."""
    out_schema = "doc_id long, media_type string, mvec array<double>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [
                [float(b) for b in (p[:dim] if p is not None else b"")]
                + [0.0] * max(0, dim - (len(p) if p is not None else 0))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "mvec": vecs,
                }
            )

    return media.mapInPandas(op, schema=out_schema)
