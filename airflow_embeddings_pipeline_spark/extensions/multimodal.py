"""Multimodal columns (X5): image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

Two tiers, selected by ``use_real_codec``:

* **fake tier (default, oracle path)** — deterministic features derived
  from the payload bytes so tests and DuckDB oracles have stable values.
  All Spark-side plumbing (schema, Arrow batch shape, UDF signatures,
  zero-shuffle map-only plan) is identical to the real tier.
* **real tier** — PIL (images) / soundfile (audio) decode when the
  codec libraries are importable, with a pure-stdlib fallback codec
  (``zlib`` + ``struct`` PNG decode/encode, ``wave`` + numpy WAV
  decode) so the real tier executes END-TO-END even in containers that
  ship no codec libraries.  The PIL-vs-stdlib choice is probed PER
  EXECUTOR BATCH (a heterogeneous cluster where the driver has PIL but
  an executor does not degrades that executor to the stdlib codec
  instead of quarantining its rows); ``allow_stdlib_fallback=False``
  additionally runs a driver-side probe (``probe_codecs``) and raises
  :class:`CodecUnavailable` immediately when the full libraries are
  absent — a clear driver-side signal, never a mid-job executor crash.
  Rows whose bytes fail to decode yield NULL feature columns
  (quarantine semantics, E1) rather than failing the batch.

The stdlib codec handles non-interlaced 8-bit PNG (gray / RGB / LA /
RGBA, all five scanline filters) and PCM WAV; its grayscale conversion
uses PIL's exact ITU-R 601-2 integer formula so checksums agree with
the PIL path on the shared subset.  Formats outside that subset NULL
out (quarantine) unless PIL/soundfile are present.

Reference behavior generalized: opaque binary columns moving through
columnar interchange (parquet snappy staging,
embeddings-pipeline.py:248-255) — this module adds the decode /
feature / resize surface a multimodal training corpus needs on top of
that interchange.

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


def _require_codecs(*mods: str, allow_stdlib_fallback: bool = True) -> None:
    """Raise :class:`CodecUnavailable` when a required codec library is
    absent AND the caller refused the stdlib fallback.  With the default
    ``allow_stdlib_fallback=True`` the real tier always builds — the
    stdlib PNG/WAV codec covers the container-no-codecs case, and rows
    in formats outside its subset quarantine to NULL."""
    avail = probe_codecs()
    missing = [m for m in mods if not avail.get(m)]
    if missing and not allow_stdlib_fallback:
        raise CodecUnavailable(
            f"real media decode requires {missing} (detected absent at "
            "op-build probe) and allow_stdlib_fallback=False; install "
            "the codec libraries, allow the stdlib PNG/WAV fallback, or "
            "use the deterministic fake tier (use_real_codec=False)"
        )


def _make_stdlib_codec():
    """Build the pure-stdlib codec functions.

    Defined inside a factory so the returned functions are CLOSURES —
    cloudpickle ships them by value into the mapInPandas batch function,
    keeping executors free of any dependency on this package (the same
    self-containment contract as the rest of the module).
    """
    import struct
    import zlib

    def _to_gray(raw: bytes, width: int, height: int, channels: int) -> bytes:
        # PIL convert("L") parity: ITU-R 601-2 integer luma
        # L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16; LA/RGBA drop
        # alpha (PIL's convert("L") composites nothing — it drops).
        if channels == 1:
            return raw
        out = bytearray(width * height)
        if channels == 2:  # gray + alpha
            out[:] = raw[0::2]
            return bytes(out)
        for i in range(width * height):
            o = i * channels
            r, g, b = raw[o], raw[o + 1], raw[o + 2]
            out[i] = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
        return bytes(out)

    def png_decode(data: bytes) -> tuple[int, int, bytes]:
        """Decode a non-interlaced 8-bit PNG to (width, height, gray
        pixel bytes).  Raises ValueError on anything outside that
        subset — callers map that to NULL-quarantine."""
        if data[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG")
        pos, width, height, bit_depth, color_type = 8, 0, 0, 0, 0
        idat = bytearray()
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            ctype = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if ctype == b"IHDR":
                width, height, bit_depth, color_type, _comp, _filt, interlace = (
                    struct.unpack(">IIBBBBB", body)
                )
                if bit_depth != 8 or interlace != 0:
                    raise ValueError("unsupported PNG (need 8-bit, non-interlaced)")
            elif ctype == b"IDAT":
                idat += body
            elif ctype == b"IEND":
                break
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            raise ValueError(f"unsupported PNG color type {color_type}")
        raw = zlib.decompress(bytes(idat))
        stride = width * channels
        if len(raw) != (stride + 1) * height:
            raise ValueError("PNG scanline size mismatch")
        out = bytearray(stride * height)
        prev = bytes(stride)
        for y in range(height):
            rowstart = y * (stride + 1)
            filt = raw[rowstart]
            line = bytearray(raw[rowstart + 1 : rowstart + 1 + stride])
            if filt == 1:  # Sub
                for i in range(channels, stride):
                    line[i] = (line[i] + line[i - channels]) & 0xFF
            elif filt == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif filt == 3:  # Average
                for i in range(stride):
                    left = line[i - channels] if i >= channels else 0
                    line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif filt == 4:  # Paeth
                for i in range(stride):
                    a = line[i - channels] if i >= channels else 0
                    b = prev[i]
                    c = prev[i - channels] if i >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
            elif filt != 0:
                raise ValueError(f"bad PNG filter {filt}")
            out[y * stride : (y + 1) * stride] = line
            prev = bytes(line)
        return width, height, _to_gray(bytes(out), width, height, channels)

    def png_encode_gray(width: int, height: int, pixels: bytes) -> bytes:
        """Encode 8-bit grayscale pixels as a minimal valid PNG
        (filter-0 scanlines, single IDAT)."""
        if len(pixels) != width * height:
            raise ValueError("pixel buffer size mismatch")

        def chunk(ctype: bytes, body: bytes) -> bytes:
            crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
            return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        scan = b"".join(
            b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan, 9))
            + chunk(b"IEND", b"")
        )

    def wav_decode(data: bytes):
        """Decode a PCM WAV to a float64 numpy array in [-1, 1) with
        soundfile parity (int16 / 32768, int32 / 2**31, uint8 shifted),
        mono-flattened exactly as soundfile returns 1-D for mono."""
        import io
        import wave

        import numpy as np

        with wave.open(io.BytesIO(data), "rb") as w:
            n_ch, sampwidth, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            frames = w.readframes(w.getnframes())
        if sampwidth == 2:
            arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
        elif sampwidth == 4:
            arr = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
        elif sampwidth == 1:
            arr = (np.frombuffer(frames, dtype="u1").astype(np.float64) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported WAV sample width {sampwidth}")
        if n_ch > 1:
            arr = arr.reshape(-1, n_ch)
        return arr, rate

    return png_decode, png_encode_gray, wav_decode


# Driver-side handles for tests and fixture construction.
png_decode_gray, png_encode_gray, wav_decode_f64 = _make_stdlib_codec()


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
    media: DataFrame,
    *,
    use_real_codec: bool = False,
    allow_stdlib_fallback: bool = True,
) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas`` —
    one Arrow batch in, one feature frame out, no shuffle.

    The batch function is fully self-contained (stdlib imports inside)
    so cloudpickle ships it by value: executor workers never need this
    package importable, which is exactly the situation when a driver
    process imports the engine from an arbitrary cwd.

    Real tier (``use_real_codec=True``; codecs probed per executor
    batch, so heterogeneous driver/executor installs degrade per-node
    instead of quarantining): images
    decode via PIL when importable, else the stdlib PNG codec
    (``mean_byte`` = mean grayscale pixel, ``checksum`` = md5 over the
    pixel buffer — identical on both paths for 8-bit PNGs); audio via
    soundfile when importable, else stdlib ``wave`` (``mean_byte`` =
    mean |amplitude| scaled to byte range, ``checksum`` over the
    float64 sample buffer).  Undecodable rows (wrong bytes, unknown
    media_type, formats outside the active codec's subset) yield NULL
    features instead of failing the Arrow batch."""
    if use_real_codec:
        _require_codecs(
            "PIL", "soundfile", allow_stdlib_fallback=allow_stdlib_fallback
        )
    std_png_decode, _std_png_encode, std_wav_decode = _make_stdlib_codec()
    out_schema = (
        "doc_id long, media_type string, n_bytes int, checksum long, mean_byte double"
    )

    _strict_real = use_real_codec and not allow_stdlib_fallback

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        # Codec availability is probed HERE, on the executor, not
        # captured from a driver-side probe: on a heterogeneous cluster
        # where the driver has PIL/soundfile but an executor does not,
        # that executor silently degrades to the stdlib codec instead
        # of quarantining every row to NULL — UNLESS the caller demanded
        # the full libraries (allow_stdlib_fallback=False), in which
        # case a codec-less executor fails its task loudly: the strict
        # flag's contract is "full-library decode or no decode", and the
        # stdlib WAV/PNG paths diverge from soundfile/PIL outside the
        # PCM/PNG subset (those rows would quarantine, not mis-decode,
        # but the caller explicitly opted out of that degradation).
        try:
            from PIL import Image as _Image
        except Exception:
            _Image = None
        try:
            import soundfile as _sf
        except Exception:
            _sf = None
        if _strict_real and (_Image is None or _sf is None):
            missing = [
                n for n, m in (("PIL", _Image), ("soundfile", _sf)) if m is None
            ]
            raise RuntimeError(
                f"CodecUnavailable on executor: real media decode requires "
                f"{missing} and allow_stdlib_fallback=False — install the "
                "codec libraries on every executor or allow the stdlib "
                "fallback"
            )

        def fake_decode(payload: bytes, media_type: str) -> tuple:
            checksum = int(_hl.md5(payload.hex().encode()).hexdigest()[:8], 16)
            mean_byte = sum(payload) / len(payload) if payload else 0.0
            return len(payload), checksum, round(mean_byte, 6)

        def real_decode(payload: bytes, media_type: str) -> tuple:
            import io

            try:
                if media_type == "image":
                    if _Image is not None:
                        pix = _Image.open(io.BytesIO(payload)).convert("L").tobytes()
                    else:
                        _w, _h, pix = std_png_decode(bytes(payload))
                    checksum = int(_hl.md5(pix.hex().encode()).hexdigest()[:8], 16)
                    mean = (sum(pix) / len(pix)) if pix else 0.0
                    return len(payload), checksum, round(mean, 6)
                if media_type == "audio":
                    if _sf is not None:
                        data, _rate = _sf.read(io.BytesIO(payload))
                    else:
                        data, _rate = std_wav_decode(bytes(payload))
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
    media: DataFrame,
    *,
    target_bytes: int = 16,
    use_real_codec: bool = False,
    allow_stdlib_fallback: bool = True,
) -> DataFrame:
    """Resize/resample plumbing: deterministic byte-stride subsample of
    the payload down to ``target_bytes`` (byte i of the output is byte
    ``(i·n)//t`` of the input) — the batch shape of an image resize /
    audio resample.  mapInPandas, map-only, no shuffle; payload bytes
    never leave the executor.

    Real tier (``use_real_codec=True``; codecs probed per executor
    batch, so heterogeneous driver/executor installs degrade per-node
    instead of quarantining): images
    are PIL-thumbnailed so the longest side is ``target_bytes`` pixels
    and re-encoded to PNG; without PIL the stdlib codec decodes 8-bit
    PNGs, nearest-neighbor downscales the grayscale plane, and
    re-encodes via the stdlib PNG writer.  Undecodable rows yield NULL
    outputs."""
    if use_real_codec:
        _require_codecs("PIL", allow_stdlib_fallback=allow_stdlib_fallback)
    std_png_decode, std_png_encode, _std_wav = _make_stdlib_codec()
    out_schema = (
        "doc_id long, media_type string, orig_bytes int, "
        "resized_bytes int, resized_checksum long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        # executor-side probe (see extract_features): driver codec
        # availability must not decide the executor decode path
        try:
            from PIL import Image as _Image
        except Exception:
            _Image = None

        def shrink(payload: bytes) -> tuple:
            if use_real_codec:
                import io

                try:
                    if _Image is not None:
                        img = _Image.open(io.BytesIO(payload))
                        img.thumbnail((target_bytes, target_bytes))
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        out = buf.getvalue()
                    else:
                        w, h, pix = std_png_decode(bytes(payload))
                        scale = max(w, h) / target_bytes
                        if scale > 1:
                            nw = max(1, round(w / scale))
                            nh = max(1, round(h / scale))
                            pix = bytes(
                                pix[((y * h) // nh) * w + (x * w) // nw]
                                for y in range(nh)
                                for x in range(nw)
                            )
                            w, h = nw, nh
                        out = std_png_encode(w, h, pix)
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
