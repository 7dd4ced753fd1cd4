"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` — the pattern a
training-data pipeline uses for image/audio/video columns at 100 TB.

The container has no native codec libraries, so the decoders are
implemented pure-Python from the specs: PNG (``_png_decode``), baseline
JPEG (``sources/jpeg.py`` — Huffman + IDCT + 4:2:0 + restart markers),
GIF (``sources/gif.py``), MJPEG/AVI video (``sources/avi.py`` — RIFF
container walk + per-frame JPEG decode, real frame sampling), and
WAV/PCM (``_wav_decode``), plus the MPEG-1/MP3 frame walker
(``sources/mp3.py`` — rate/channels/duration metadata without PCM).
Only MP3 PCM synthesis and non-MJPEG video codecs remain
``NotImplementedError`` stubs (they need ffmpeg — the explicit swap-in
point at deployment; rationale in ``sources/mp3.py`` and ``SCALE.md``).  ``extract_features`` computes deterministic
byte-level features (size, md5, a fixed-stride byte sample) so the whole
Spark-side pipeline — schema, Arrow batch shape, partitioning, UDF
signature — is differentially testable (the md5/byte features are
reproducible in the DuckDB oracle over the same synthesized payloads);
``multimodal_decoded`` differentially checks the real decode kernels.

Scale design: payloads stay opaque binary end-to-end (no driver
collect); ``mapInPandas`` streams Arrow record batches through Python
with ~10-100× less overhead than row-at-a-time UDFs; heavy media work
would set ``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound
per-batch memory (payload_bytes × batch_rows) and repartition by size
class first so batches are uniform.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from star_schema_etl_airflow_spark.sources.fixtures import load_table

MEDIA_TYPES = ("image", "audio", "video")
SAMPLE_STRIDE = 37  # fixed stride for the deterministic byte sample
SAMPLE_LEN = 8

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_md5", T.StringType()),
    # '|'-joined sampled byte values: a scalar canonical form (the
    # differential harness canonicalizes through pandas, which cannot
    # hash list-typed cells); the per-byte list stays a kernel-internal
    # intermediate.
    T.StructField("byte_sample", T.StringType()),
])


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal table from the documents fixture: the text
    bytes play the opaque payload; media_type cycles deterministically."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_bytes_declared"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → samples per pixel (8-bit, non-palette, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_decode(payload: bytes) -> dict:
    """Pure-Python PNG decode (stdlib only): chunk walk, IDAT inflate,
    scanline unfilter per the spec's five filter types.  Supports 8-bit
    depth, color types gray/RGB/gray-alpha/RGBA, no interlace — the
    shapes a training pipeline normalizes to anyway; everything else
    raises ``NotImplementedError`` so the gap is explicit, not silent.
    Truncated or corrupt payloads raise ``ValueError`` (the decode_err
    row contract — found by fuzzing: a short chunk header leaked
    ``struct.error`` and a corrupt IDAT leaked ``zlib.error``)."""
    try:
        return _png_decode_impl(payload)
    except (struct.error, IndexError, zlib.error) as exc:
        raise ValueError(f"malformed PNG stream: {exc}") from exc


def _png_decode_impl(payload: bytes) -> dict:
    if payload[:8] != PNG_SIG:
        raise NotImplementedError("not a PNG payload")
    pos, width = 8, None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if zlib.crc32(ctype + data) != struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length]
        )[0]:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if bit_depth != 8 or interlace or (
                color_type not in _PNG_CHANNELS and color_type != 3
            ):
                raise NotImplementedError(
                    f"PNG bit_depth={bit_depth} color_type={color_type} "
                    f"interlace={interlace} not supported by the pure-Python "
                    "decoder (8-bit gray/RGB/GA/RGBA/palette, "
                    "non-interlaced only)"
                )
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = data
        elif ctype == b"tRNS":
            # tRNS changes decoded pixel output only for indexed color
            # (type 3: per-palette-entry alpha); on gray/RGB it is
            # ignorable single-color transparency metadata, skipped like
            # any other ancillary chunk
            if color_type == 3:
                raise NotImplementedError(
                    "PNG tRNS (palette transparency) not supported by "
                    "the pure-Python decoder")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    # indexed-color rows carry one palette index per pixel; the filter
    # pass runs at 1 byte/px, then indices map through PLTE to RGB
    channels = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    if color_type == 3 and plte is None:
        raise ValueError("PNG indexed-color image missing PLTE")
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT size mismatch")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        for x in range(stride):
            a = line[x - channels] if x >= channels else 0   # left
            b = prev[x]                                       # up
            c = prev[x - channels] if x >= channels else 0    # up-left
            if f == 1:
                line[x] = (line[x] + a) & 0xFF
            elif f == 2:
                line[x] = (line[x] + b) & 0xFF
            elif f == 3:
                line[x] = (line[x] + (a + b) // 2) & 0xFF
            elif f == 4:
                line[x] = (line[x] + _paeth(a, b, c)) & 0xFF
            elif f != 0:
                raise ValueError(f"PNG filter type {f} invalid")
        out.extend(line)
        prev = line
    if color_type == 3:
        n_entries = len(plte) // 3
        if any(i >= n_entries for i in out):
            raise ValueError("PNG palette index out of range")
        out = bytearray(
            b for i in out for b in plte[3 * i:3 * i + 3]
        )
        channels = 3
    return {
        "kind": "image", "width": width, "height": height,
        "channels": channels, "color_type": color_type,
        "pixels": bytes(out),
    }


def _png_encode(
    pixels: bytes, width: int, height: int, color_type: int = 2
) -> bytes:
    """Minimal PNG writer (filter 0 rows, one zlib IDAT) — the re-encode
    half of :func:`resize_image`."""
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride:(y + 1) * stride])

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _wav_decode(payload: bytes) -> dict:
    """WAV/PCM decode via the stdlib ``wave`` reader: container metadata
    plus the raw frames (ints recoverable with ``struct``)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            frames = w.readframes(w.getnframes())
            return {
                "kind": "audio",
                "sample_rate": w.getframerate(),
                "n_channels": w.getnchannels(),
                "sample_width": w.getsampwidth(),
                "n_frames": w.getnframes(),
                "frames": frames,
            }
    except (wave.Error, EOFError, RuntimeError) as exc:
        # stdlib wave is PCM-only (and raises bare EOFError on payloads
        # truncated mid-header, and a bare RuntimeError from
        # Chunk.skip() when a corrupt chunk length seeks past the
        # stream — both found by fuzzing); route compressed WAVE
        # through the pure-Python IMA ADPCM decoder before declaring
        # defeat
        from star_schema_etl_airflow_spark.sources.adpcm import (
            ima_adpcm_decode,
        )

        try:
            dec = ima_adpcm_decode(payload)
        except (ValueError, NotImplementedError):
            raise NotImplementedError(
                f"not a PCM or IMA-ADPCM WAV payload: {exc}") from exc
        return {
            "kind": "audio",
            "sample_rate": dec["sample_rate"],
            "n_channels": dec["n_channels"],
            "sample_width": 2,
            "n_frames": dec["n_frames"],
            "frames": b"".join(
                struct.pack("<h", s) for s in dec["samples"]
            ),
        }


JPEG_SIG = b"\xff\xd8"
GIF_SIGS = (b"GIF87a", b"GIF89a")


def decode_media(payload: bytes, media_type: str) -> dict:
    """Decode a media payload to a structured dict.

    Real pure-Python decoders: PNG (chunk walk + inflate + unfilter,
    :func:`_png_decode`), baseline JPEG (Huffman + IDCT,
    ``sources/jpeg.py``), WAV/PCM (:func:`_wav_decode`), and the
    MPEG-1/MP3 frame walker (metadata without PCM,
    ``sources/mp3.py``).  Images dispatch on the container signature.
    Formats needing native codec libraries (MP3 PCM synthesis,
    non-MJPEG video) raise ``NotImplementedError`` — the production
    swap-in point for ffmpeg, kept explicit rather than faked."""
    if media_type == "image":
        if payload[:8] == PNG_SIG:
            return _png_decode(payload)
        if payload[:2] == JPEG_SIG:
            from star_schema_etl_airflow_spark.sources.jpeg import (
                jpeg_decode,
            )

            return jpeg_decode(payload)
        if payload[:6] in GIF_SIGS:
            from star_schema_etl_airflow_spark.sources.gif import gif_decode

            return gif_decode(payload)
        raise NotImplementedError(
            "unrecognized image container (PNG, baseline JPEG, and GIF "
            "decoders available; swap in PIL for the long tail at "
            "deployment)"
        )
    if media_type == "audio":
        from star_schema_etl_airflow_spark.sources.mp3 import (
            is_mp3,
            mp3_probe,
        )

        if is_mp3(payload):
            # metadata-only: the MPEG-1 frame walk yields rate /
            # channels / exact duration without PCM synthesis (the
            # synthesis window is tabulated, not closed-form — see
            # sources/mp3.py; production swaps in ffmpeg HERE for the
            # samples themselves)
            return mp3_probe(payload)
        if payload[:4] == b"fLaC":
            from star_schema_etl_airflow_spark.sources.flac import (
                flac_decode,
            )

            dec = flac_decode(payload)
            return {
                "kind": "audio",
                "sample_rate": dec["sample_rate"],
                "n_channels": dec["n_channels"],
                "sample_width": 2,
                "n_frames": dec["n_frames"],
                "frames": b"".join(
                    struct.pack("<h", s) for s in dec["samples"]
                ),
            }
        return _wav_decode(payload)
    if media_type == "video":
        from star_schema_etl_airflow_spark.sources.avi import (
            avi_decode,
            is_avi,
        )

        if is_avi(payload):
            # metadata + container walk only: frame pixels decode on
            # demand (frame_sample / avi_decode with explicit indices)
            dec = avi_decode(payload, frame_indices=[])
            dec["channels"] = 3
            return dec
        raise NotImplementedError(
            "unrecognized video container (MJPEG/AVI decoder available; "
            "swap in ffmpeg for other codecs at deployment)"
        )
    raise NotImplementedError(
        f"no {media_type} codec in this environment "
        "(MP3 framing/metadata is real — sources/mp3.py — but PCM "
        "synthesis and the non-MPEG-1 long tail need ffmpeg; swap in "
        "at deployment)"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor image resize, decode → resample → re-encode in
    the source container (PNG→PNG, JPEG→JPEG) — all pure Python.
    (Production swaps the resample kernel for PIL/OpenCV; the pipeline
    contract — binary in, binary out, pure function usable inside
    ``mapInPandas`` — is exactly this.)"""
    img = decode_media(payload, "image")
    sw, sh, ch = img["width"], img["height"], img["channels"]
    src = img["pixels"]
    out = bytearray(width * height * ch)
    for y in range(height):
        sy = min(sh - 1, (y * sh) // height)
        for x in range(width):
            sx = min(sw - 1, (x * sw) // width)
            si = (sy * sw + sx) * ch
            di = (y * width + x) * ch
            out[di:di + ch] = src[si:si + ch]
    if payload[:2] == JPEG_SIG:
        from star_schema_etl_airflow_spark.sources.jpeg import jpeg_encode

        return jpeg_encode(bytes(out), width, height, ch)
    # GIF decodes carry no PNG color_type, and indexed PNGs (type 3)
    # decode to plain RGB — re-encode with the color_type implied by
    # the channel count (1→gray, 3→RGB, 4→RGBA) in both cases
    ct = img.get("color_type")
    if ct is None or ct == 3:
        ct = {1: 0, 3: 2, 4: 6}[ch]
    return _png_encode(bytes(out), width, height, ct)


DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("decoded", T.BooleanType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("decode_err", T.StringType()),
])


def decode_stats(media: DataFrame) -> DataFrame:
    """Run :func:`decode_media` over every payload via Arrow-batched
    ``mapInPandas``: per-media decoded metadata (image dims / audio rate)
    where a pure-Python codec exists, a recorded ``decode_err`` where it
    does not — undecodable payloads become inspectable rows, never a
    failed 100 TB job."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                try:
                    m = decode_media(bytes(payload), mtype)
                    rows.append((
                        mid, mtype, True,
                        m.get("width"), m.get("height"), m.get("channels"),
                        m.get("sample_rate"), m.get("n_frames"), None,
                    ))
                except (NotImplementedError, ValueError) as exc:
                    rows.append((
                        mid, mtype, False,
                        None, None, None, None, None, str(exc)[:120],
                    ))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA])

    return media.mapInPandas(kernel, schema=DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample ``n_frames`` evenly spaced "frames" from each video payload.

    MJPEG/AVI payloads yield REAL frames: the container walk picks
    ``n_frames`` evenly spaced '00dc' chunks and emits each frame's
    still-compressed JPEG bytes — no entropy decode, so a skipped frame
    costs nothing (the property that matters when sampling 4 frames
    from a 10k-frame clip at 100 TB).  Non-AVI payloads keep the
    deterministic byte-slice stand-in (the ffmpeg swap-in point); the
    plumbing — one input row → n output rows through an Arrow-batched
    iterator, binary in/binary out — is identical either way."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from star_schema_etl_airflow_spark.sources.avi import (
            avi_decode,
            avi_frame_bytes,
            is_avi,
        )

        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            out = []
            for media_id, payload in zip(vids["media_id"], vids["payload"]):
                payload = bytes(payload)
                if is_avi(payload):
                    # a truncated container can pass is_avi yet fail the
                    # chunk walk; one corrupt clip must not kill the
                    # sampling job — fall through to the byte-slice
                    # stand-in instead (FRAME_SCHEMA has no error column)
                    try:
                        total = avi_decode(
                            payload, frame_indices=[])["n_frames"]
                        take = min(n_frames, total)
                        frames = [
                            avi_frame_bytes(payload, (i * total) // take)
                            for i in range(take)
                        ]
                    except (ValueError, NotImplementedError):
                        frames = None
                    if frames is not None:
                        out.extend(
                            (media_id, i, fb) for i, fb in enumerate(frames)
                        )
                        continue
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    chunk = payload[i * step:(i + 1) * step]
                    if chunk:
                        out.append((media_id, i, bytes(chunk)))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction (the mapInPandas kernel)."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": payloads.map(len).astype("int64"),
            "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            "byte_sample": payloads.map(
                lambda b: "|".join(
                    str(int(x)) for x in b[::SAMPLE_STRIDE][:SAMPLE_LEN]
                )
            ),
        })


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic byte-level features via Arrow-batched mapInPandas."""
    return media.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media table → mapInPandas feature extraction (registered query)."""
    return extract_features(build_media_table(spark, sf_dir))


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.IntegerType()),
    T.StructField("zero_crossings", T.LongType()),
    T.StructField("decode_err", T.StringType()),
])


def _pcm_samples(meta: dict) -> list[int]:
    """First-channel PCM ints from a decoded WAV dict (8-bit unsigned
    centered to signed; 16/32-bit little-endian signed)."""
    width, nch = meta["sample_width"], meta["n_channels"]
    fmt = {1: "b", 2: "<h", 4: "<i"}[width]
    raw = meta["frames"]
    if width == 1:
        vals = [b - 128 for b in raw]
    else:
        vals = [
            struct.unpack_from(fmt, raw, i)[0]
            for i in range(0, len(raw), width)
        ]
    return vals[::nch]  # channel 0


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction over decoded PCM via Arrow-batched
    ``mapInPandas``: duration, RMS, peak amplitude, zero-crossing count
    (the cheap speech/music/silence discriminators a curation pipeline
    gates on).  Sums of squares run in exact Python ints before one
    sqrt, so features are partition-order independent; undecodable
    payloads surface as rows with ``decode_err`` (the decode_stats
    contract)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                try:
                    if mtype != "audio":
                        raise NotImplementedError(
                            f"audio features on media_type={mtype}"
                        )
                    m = decode_media(bytes(payload), "audio")
                    s = _pcm_samples(m)
                    n = len(s)
                    rms = (
                        (sum(v * v for v in s) / n) ** 0.5 if n else 0.0
                    )
                    zc = sum(
                        1
                        for a, b in zip(s, s[1:])
                        if (a >= 0) != (b >= 0)
                    )
                    rows.append((
                        mid, m["sample_rate"], n,
                        n / m["sample_rate"] if m["sample_rate"] else 0.0,
                        rms, max((abs(v) for v in s), default=0), zc, None,
                    ))
                except (
                    NotImplementedError,
                    ValueError,
                    KeyError,
                    # wave.readframes can return a partial tail on a
                    # truncated PCM data chunk; struct.unpack_from then
                    # raises struct.error — that's a malformed payload,
                    # which must surface as a decode_err row, not kill
                    # the task (the decode_stats contract).
                    struct.error,
                ) as exc:
                    rows.append((
                        mid, None, None, None, None, None, None,
                        str(exc)[:120],
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA]
            )

    return media.mapInPandas(kernel, schema=AUDIO_FEATURE_SCHEMA)


def patchify(pixels: bytes, width: int, height: int, channels: int,
             patch: int) -> list[tuple[int, int, bytes]]:
    """Split a decoded image into non-overlapping ``patch``×``patch``
    tiles (ViT-style): ``[(patch_row, patch_col, tile_bytes), ...]`` in
    row-major order.  Partial tiles at the right/bottom edge are
    DROPPED (the ViT convention is resize-to-multiple first; dropping
    keeps the op exact and closed-form — the resize path is
    :func:`resize_image`).  Pure function usable inside ``mapInPandas``
    — per-payload cost, no shuffle."""
    import numpy as np

    a = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    )
    out = []
    for pr in range(height // patch):
        for pc in range(width // patch):
            tile = a[pr * patch:(pr + 1) * patch,
                     pc * patch:(pc + 1) * patch, :]
            out.append((pr, pc, np.ascontiguousarray(tile).tobytes()))
    return out
