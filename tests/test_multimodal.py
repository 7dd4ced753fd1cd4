"""Multimodal plumbing: binary payload schema, mapInPandas batch shape,
and the decode stub contract."""

from __future__ import annotations

import hashlib

import pytest

from star_schema_etl_airflow_spark.sources.multimodal import (
    build_media_table,
    decode_media,
    extract_features,
)

SF_DIR = "/root/testdata/sf0.001"


def test_media_table_schema(spark):
    media = build_media_table(spark, SF_DIR)
    assert dict(media.dtypes)["payload"] == "binary"
    assert dict(media.dtypes)["media_type"] == "string"
    row = media.filter("media_id = 1").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.media_type == "audio"  # 1 % 3 == 1 → MEDIA_TYPES[1]


def test_feature_extraction_roundtrip(spark):
    media = build_media_table(spark, SF_DIR)
    feats = extract_features(media)
    row = feats.filter("media_id = 0").first()
    src = media.filter("media_id = 0").first().payload
    assert row.n_bytes == len(src)
    assert row.payload_md5 == hashlib.md5(src).hexdigest()
    assert row.byte_sample == "|".join(str(int(x)) for x in src[::37][:8])
    # every document produced exactly one feature row
    assert feats.count() == media.count()


def _make_wav(sample_rate=8000, n_frames=160, n_channels=1):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        pcm = b"".join(
            struct.pack(
                "<" + "h" * n_channels,
                *([int(12000 * math.sin(2 * math.pi * 440 * i / sample_rate))]
                  * n_channels),
            )
            for i in range(n_frames)
        )
        w.writeframes(pcm)
    return buf.getvalue()


def _make_png(width=5, height=4, color_type=2):
    from star_schema_etl_airflow_spark.sources.multimodal import (
        _PNG_CHANNELS,
        _png_encode,
    )

    ch = _PNG_CHANNELS[color_type]
    pixels = bytes(
        (x * 40 + y * 10 + c * 3) % 256
        for y in range(height) for x in range(width) for c in range(ch)
    )
    return _png_encode(pixels, width, height, color_type), pixels


def test_wav_decode_roundtrip():
    payload = _make_wav(sample_rate=16000, n_frames=320, n_channels=2)
    m = decode_media(payload, "audio")
    assert m["kind"] == "audio"
    assert m["sample_rate"] == 16000
    assert m["n_channels"] == 2
    assert m["n_frames"] == 320
    assert len(m["frames"]) == 320 * 2 * 2  # frames × channels × 2 bytes


def test_png_decode_roundtrip():
    payload, pixels = _make_png(width=7, height=3, color_type=6)
    m = decode_media(payload, "image")
    assert (m["width"], m["height"], m["channels"]) == (7, 3, 4)
    assert m["pixels"] == pixels


def test_png_unfilter_all_filter_types():
    """Hand-build a PNG whose rows use filters 0-4; the decoder must
    invert each per the spec."""
    import struct
    import zlib

    from star_schema_etl_airflow_spark.sources.multimodal import (
        PNG_SIG,
        _paeth,
        _png_decode,
    )

    width, height, ch = 4, 5, 3
    stride = width * ch
    pixels = bytes((x * 17 + 5) % 256 for x in range(stride * height))
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        f = y % 5
        line = bytearray(pixels[y * stride:(y + 1) * stride])
        filt = bytearray(stride)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                filt[x] = line[x]
            elif f == 1:
                filt[x] = (line[x] - a) & 0xFF
            elif f == 2:
                filt[x] = (line[x] - b) & 0xFF
            elif f == 3:
                filt[x] = (line[x] - (a + b) // 2) & 0xFF
            else:
                filt[x] = (line[x] - _paeth(a, b, c)) & 0xFF
        raw.append(f)
        raw.extend(filt)
        prev = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    payload = (PNG_SIG + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    assert _png_decode(payload)["pixels"] == pixels


def test_resize_image_real():
    from star_schema_etl_airflow_spark.sources.multimodal import resize_image

    payload, _ = _make_png(width=8, height=8, color_type=2)
    small = resize_image(payload, 4, 4)
    m = decode_media(small, "image")
    assert (m["width"], m["height"], m["channels"]) == (4, 4, 3)
    # nearest-neighbor: top-left output pixel == top-left source pixel
    src = decode_media(payload, "image")
    assert m["pixels"][:3] == src["pixels"][:3]


def test_undecodable_formats_stay_explicit():
    with pytest.raises(NotImplementedError):
        decode_media(b"II*\x00....", "image")  # TIFF: no decoder
    with pytest.raises(ValueError):
        # JPEG is a REAL decoder now (sources/jpeg.py); a truncated
        # stream is malformed data, not a missing codec
        decode_media(b"\xff\xd8\xff\xe0JFIF....", "image")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00 ftypmp42....", "video")  # MP4
    with pytest.raises(ValueError):
        # MP3 framing is a REAL walker now (sources/mp3.py); a
        # truncated ID3 tag is malformed data, not a missing codec
        decode_media(b"ID3\x04\x00....", "audio")


def test_decode_stats_over_spark(spark):
    """decode_stats: real WAV/PNG payloads decode in the mapInPandas
    kernel; undecodable ones surface as rows with decode_err."""
    from star_schema_etl_airflow_spark.sources.multimodal import decode_stats

    wav = _make_wav(sample_rate=8000, n_frames=100)
    png, _ = _make_png(width=6, height=2)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(wav)),
         (2, "image", bytearray(png)),
         (3, "video", bytearray(b"not-a-video"))],
        "media_id long, media_type string, payload binary",
    )
    rows = {r.media_id: r for r in decode_stats(media).collect()}
    assert rows[1].decoded and rows[1].sample_rate == 8000 \
        and rows[1].n_frames == 100
    assert rows[2].decoded and (rows[2].width, rows[2].height) == (6, 2)
    assert not rows[3].decoded and rows[3].decode_err


def test_frame_sample_plumbing(spark):
    from star_schema_etl_airflow_spark.sources.multimodal import (
        build_media_table,
        frame_sample,
    )

    media = build_media_table(spark, SF_DIR)
    frames = frame_sample(media, n_frames=4)
    assert dict(frames.dtypes)["frame"] == "binary"

    n_videos = media.filter("media_type = 'video'").count()
    per_media = frames.groupBy("media_id").count().collect()
    assert len(per_media) == n_videos
    assert all(r["count"] == 4 for r in per_media)

    # frames of one video concatenate back into a payload prefix
    vid = media.filter("media_type = 'video'").first()
    got = b"".join(
        bytes(r.frame) for r in sorted(
            frames.filter(f"media_id = {vid.media_id}").collect(),
            key=lambda r: r.frame_idx,
        )
    )
    assert vid.payload.startswith(got[: len(vid.payload) // 4])


def test_audio_features_match_pure_python(spark):
    """Synthesize deterministic 16-bit PCM WAVs, extract features via
    the Arrow kernel, and check against a pure-Python recomputation."""
    import io
    import math
    import struct
    import wave

    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.sources.multimodal import (
        audio_features,
    )

    def make_wav(freq_hz, n, rate=8000, amp=12000):
        samples = [
            int(amp * math.sin(2 * math.pi * freq_hz * i / rate))
            for i in range(n)
        ]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"".join(struct.pack("<h", v) for v in samples))
        return buf.getvalue(), samples

    payloads = {1: make_wav(440, 800), 2: make_wav(50, 1600)}
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ])
    media = spark.createDataFrame(
        [(k, "audio", v[0]) for k, v in payloads.items()]
        + [(3, "video", b"not-audio")],
        schema,
    )
    got = {r["media_id"]: r for r in audio_features(media).collect()}
    for mid, (_, samples) in payloads.items():
        r = got[mid]
        assert r["decode_err"] is None
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == len(samples)
        assert r["duration_s"] == len(samples) / 8000
        exp_rms = (sum(v * v for v in samples) / len(samples)) ** 0.5
        assert abs(r["rms"] - exp_rms) < 1e-9
        assert r["peak"] == max(abs(v) for v in samples)
        exp_zc = sum(
            1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
        )
        assert r["zero_crossings"] == exp_zc
    # the 440 Hz tone crosses zero far more often than the 50 Hz one
    assert got[1]["zero_crossings"] > got[2]["zero_crossings"]
    assert got[3]["decode_err"] is not None


def test_resize_image_gif_reencodes_as_png():
    """Regression (round-5 advice): resize of a GIF payload raised
    KeyError('color_type') instead of resizing — the GIF decode dict
    carries no PNG color_type, so the PNG re-encode must derive one
    from the channel count."""
    from star_schema_etl_airflow_spark.sources.gif import gif_encode_indexed
    from star_schema_etl_airflow_spark.sources.multimodal import resize_image

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = bytes([(x + y) % 4 for y in range(6) for x in range(8)])
    payload = gif_encode_indexed(idx, 8, 6, pal)
    small = resize_image(payload, 4, 3)
    m = decode_media(small, "image")
    assert (m["width"], m["height"], m["channels"]) == (4, 3, 3)
    src = decode_media(payload, "image")
    assert m["pixels"][:3] == src["pixels"][:3]


def test_patchify_tiles_and_partial_edge_drop():
    from star_schema_etl_airflow_spark.sources.multimodal import patchify

    import numpy as np

    a = np.arange(10 * 12 * 3, dtype=np.uint8).reshape(10, 12, 3)
    tiles = patchify(a.tobytes(), 12, 10, 3, 4)
    # 12//4 × 10//4 = 3 × 2 grid; the 2-row bottom remainder drops
    assert [(r, c) for r, c, _ in tiles] == [
        (0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)
    ]
    want = a[4:8, 8:12, :]
    got = np.frombuffer(tiles[5][2], dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(want, got)


def test_frame_sample_corrupt_avi_falls_back(spark):
    """ADVICE r6: a payload that passes is_avi but fails the container
    walk must not kill the sampling job — it falls back to the
    byte-slice stand-in (FRAME_SCHEMA has no error column to absorb a
    raise)."""
    import struct

    from star_schema_etl_airflow_spark.sources.multimodal import frame_sample

    corrupt = (b"RIFF" + struct.pack("<I", 2000) + b"AVI "
               + b"\x00" * 400)  # is_avi passes; walk finds no movi
    media = spark.createDataFrame(
        [(1, "video", bytearray(corrupt))],
        "media_id long, media_type string, payload binary",
    )
    rows = frame_sample(media, n_frames=4).collect()
    assert len(rows) == 4                       # byte-slice stand-in rows
    got = b"".join(bytes(r.frame) for r in sorted(
        rows, key=lambda r: r.frame_idx))
    assert corrupt.startswith(got) and len(got) > 0


def test_decode_error_contract_under_fuzzing():
    """Every codec must map corrupt input to the decode_err contract
    (ValueError/NotImplementedError) — never a bare struct.error /
    KeyError / OverflowError / StopIteration / RuntimeError, which
    would escape decode_stats' except clause and fail the whole job.
    Deterministic fuzz: 250 random truncate/flip/splice corruptions of
    one valid payload per container (seed pinned; this run found and
    pinned 5 distinct leak classes across PNG/JPEG/WAV)."""
    import math
    import random

    from star_schema_etl_airflow_spark.sources.adpcm import ima_adpcm_encode
    from star_schema_etl_airflow_spark.sources.avi import avi_encode_mjpeg
    from star_schema_etl_airflow_spark.sources.flac import flac_encode
    from star_schema_etl_airflow_spark.sources.gif import gif_encode_indexed
    from star_schema_etl_airflow_spark.sources.jpeg import jpeg_encode
    from star_schema_etl_airflow_spark.sources.mp3 import mp3_frame
    from star_schema_etl_airflow_spark.sources.multimodal import (
        _png_encode,
        decode_media,
    )

    sine = [int(8000 * math.sin(i / 9)) for i in range(600)]
    px = bytes((3 * i) % 256 for i in range(16 * 16 * 3))
    idx = bytes(i % 4 for i in range(16 * 16))
    pal = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    payloads = {
        "flac": (flac_encode(sine, 8000), "audio"),
        "flac-stereo": (flac_encode(
            [v for p in zip(sine, sine) for v in p], 8000, channels=2),
            "audio"),
        "adpcm": (ima_adpcm_encode(sine, 8000), "audio"),
        "png": (_png_encode(px, 16, 16, 2), "image"),
        "jpeg": (jpeg_encode(px, 16, 16, 3), "image"),
        "gif": (gif_encode_indexed(idx, 16, 16, pal), "image"),
        "avi": (avi_encode_mjpeg([px] * 3, 16, 16, fps=10, quality=90),
                "video"),
        "mp3": (b"".join(mp3_frame(3, 128, 44100) for _ in range(3)),
                "audio"),
    }
    rng = random.Random(7)
    leaks = []
    for name, (pl, mt) in payloads.items():
        for trial in range(250):
            b = bytearray(pl)
            op = rng.randrange(3)
            if op == 0:
                b = b[:rng.randrange(len(b))]
            elif op == 1:
                for _ in range(rng.randrange(1, 6)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                i = rng.randrange(len(b))
                b = (b[:i]
                     + bytes(rng.randrange(256) for _ in range(8))
                     + b[i:])
            try:
                decode_media(bytes(b), mt)
            except (ValueError, NotImplementedError):
                pass
            except Exception as exc:  # noqa: BLE001 — the assertion
                leaks.append((name, trial, type(exc).__name__))
    assert not leaks, leaks[:10]


def _make_palette_png(width, height, palette, indices):
    """Independent indexed-color PNG writer (test-only): IHDR color
    type 3 + PLTE + filter-0 index rows — the encoder half the
    production decoder deliberately lacks."""
    import struct
    import zlib

    from star_schema_etl_airflow_spark.sources.multimodal import PNG_SIG

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(indices[y * width:(y + 1) * width])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", palette)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_palette_decode():
    """Indexed-color (type 3) PNGs decode through PLTE to RGB — the
    most common shape for icons/diagrams in a real crawl."""
    palette = bytes([10, 20, 30, 200, 0, 0, 0, 200, 0, 0, 0, 200])
    w, h = 5, 3
    indices = bytes((x + y) % 4 for y in range(h) for x in range(w))
    m = decode_media(_make_palette_png(w, h, palette, indices), "image")
    assert (m["width"], m["height"], m["channels"]) == (w, h, 3)
    want = bytes(
        b for i in indices for b in palette[3 * i:3 * i + 3]
    )
    assert m["pixels"] == want


def test_png_palette_boundaries():
    import pytest

    palette = bytes([1, 2, 3, 4, 5, 6])       # 2 entries
    # index 7 out of range → ValueError, not garbage pixels
    bad = _make_palette_png(2, 1, palette, bytes([0, 7]))
    with pytest.raises(ValueError, match="palette index"):
        decode_media(bad, "image")
    # missing PLTE → ValueError
    import re
    import struct
    import zlib

    from star_schema_etl_airflow_spark.sources.multimodal import PNG_SIG

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    raw = b"\x00\x00\x01"
    no_plte = (PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        decode_media(no_plte, "image")
    # tRNS stays an explicit boundary
    trns = (PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", palette) + chunk(b"tRNS", b"\x80")
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="tRNS"):
        decode_media(trns, "image")


def test_png_palette_resize_roundtrip():
    """resize_image over an indexed PNG: decodes via PLTE, resamples,
    re-encodes as plain RGB (palette is decode-only)."""
    from star_schema_etl_airflow_spark.sources.multimodal import resize_image

    palette = bytes([0, 0, 0, 255, 255, 255] + [0] * 6)
    indices = bytes((x ^ y) & 1 for y in range(8) for x in range(8))
    payload = _make_palette_png(8, 8, palette, indices)
    small = decode_media(resize_image(payload, 4, 4), "image")
    assert (small["width"], small["height"], small["channels"]) == (4, 4, 3)
    # nearest-neighbor keeps the checkerboard's top-left black pixel
    assert small["pixels"][:3] == bytes([0, 0, 0])


def test_png_trns_ignored_on_truecolor_raises_on_palette():
    """ADVICE r7: tRNS is ignorable single-color transparency metadata
    on gray/RGB (skip it, like any ancillary chunk); only on indexed
    color (type 3) does it change pixel output, where the pure-Python
    decoder declares its subset boundary."""
    import struct
    import zlib

    import pytest

    from star_schema_etl_airflow_spark.sources.multimodal import _png_encode

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    def splice_trns(png, data):
        i = png.index(b"IDAT") - 4
        return png[:i] + chunk(b"tRNS", data) + png[i:]

    pixels = bytes(range(30))
    rgb = splice_trns(_png_encode(pixels, 5, 2, 2),
                      struct.pack(">HHH", 1, 2, 3))
    m = decode_media(rgb, "image")
    assert (m["width"], m["height"], m["pixels"]) == (5, 2, pixels)

    gray = splice_trns(_png_encode(bytes(range(10)), 5, 2, 0),
                       struct.pack(">H", 1))
    assert decode_media(gray, "image")["pixels"] == bytes(range(10))

    palette = bytes([10, 20, 30, 200, 0, 0])
    indexed = splice_trns(
        _make_palette_png(2, 1, palette, bytes([0, 1])), bytes([128]))
    with pytest.raises(NotImplementedError, match="tRNS"):
        decode_media(indexed, "image")
