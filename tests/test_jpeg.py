"""Pure-Python baseline JPEG codec tests (sources/jpeg.py).

The encoder and decoder share only the spec constants (Annex-K tables,
zigzag, DCT basis); the entropy coders, header writers/parsers, and
sampling logic are separate implementations, so a round-trip failure
localizes a real bug.  The closed-form differential check against an
independent DC-only writer is the ``jpeg_decoded`` oracle query."""

from __future__ import annotations

import numpy as np
import pytest

from star_schema_etl_airflow_spark.sources.jpeg import (
    jpeg_decode,
    jpeg_encode,
)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 // max(w - 1, 1),
        yy * 255 // max(h - 1, 1),
        (xx + yy) * 255 // max(w + h - 2, 1),
    ], axis=-1).astype(np.uint8)


def _decode_rgb(payload: bytes, h: int, w: int) -> np.ndarray:
    img = jpeg_decode(payload)
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    return np.frombuffer(img["pixels"], dtype=np.uint8).reshape(h, w, 3)


def test_roundtrip_smooth_rgb_tight_error():
    h, w = 24, 40
    img = _gradient(h, w)
    out = _decode_rgb(jpeg_encode(img.tobytes(), w, h, 3, quality=90), h, w)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2.0


def test_roundtrip_solid_color_near_exact():
    solid = np.full((16, 16, 3), [120, 64, 200], dtype=np.uint8)
    out = _decode_rgb(jpeg_encode(solid.tobytes(), 16, 16, 3, quality=90),
                      16, 16)
    assert np.abs(out.astype(int) - solid.astype(int)).max() <= 1


def test_roundtrip_grayscale():
    h, w = 24, 40
    g = (np.mgrid[0:h, 0:w][0] * 255 // (h - 1)).astype(np.uint8)
    img = jpeg_decode(jpeg_encode(g.tobytes(), w, h, 1, quality=90))
    assert img["channels"] == 1
    out = np.frombuffer(img["pixels"], dtype=np.uint8).reshape(h, w)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2


def test_roundtrip_420_subsampling():
    h, w = 24, 40
    img = _gradient(h, w)
    out = _decode_rgb(
        jpeg_encode(img.tobytes(), w, h, 3, quality=90, subsample=True),
        h, w)
    # chroma is 2x2 box-filtered: luma stays tight, chroma smears a bit
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4.0


def test_non_multiple_of_8_dimensions():
    h, w = 17, 23
    img = _gradient(h, w)
    out = _decode_rgb(jpeg_encode(img.tobytes(), w, h, 3, quality=95), h, w)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_restart_markers_are_lossless_resync():
    h, w = 40, 56
    img = _gradient(h, w)
    plain = jpeg_decode(jpeg_encode(img.tobytes(), w, h, 3, quality=90))
    for ri in (1, 3):
        rst = jpeg_decode(
            jpeg_encode(img.tobytes(), w, h, 3, quality=90,
                        restart_interval=ri))
        assert rst["pixels"] == plain["pixels"]


def test_encode_is_deterministic():
    img = _gradient(16, 16)
    a = jpeg_encode(img.tobytes(), 16, 16, 3, quality=80)
    b = jpeg_encode(img.tobytes(), 16, 16, 3, quality=80)
    assert a == b


def test_noise_survives_high_quality():
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = _decode_rgb(jpeg_encode(noise.tobytes(), 16, 16, 3, quality=95),
                      16, 16)
    # worst-case content: bounded distortion, not garbage
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 12.0


def test_quality_monotone_in_size():
    img = _gradient(32, 32)
    sizes = [len(jpeg_encode(img.tobytes(), 32, 32, 3, quality=q))
             for q in (30, 60, 90)]
    assert sizes == sorted(sizes)


def test_non_jpeg_and_progressive_raise_not_implemented():
    with pytest.raises(NotImplementedError):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")
    # splice the SOF0 marker of a valid stream into SOF2 (progressive)
    enc = bytearray(jpeg_encode(_gradient(8, 8).tobytes(), 8, 8, 3))
    idx = bytes(enc).find(b"\xff\xc0")
    assert idx > 0
    enc[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(enc))


def test_truncated_stream_raises_value_error():
    enc = jpeg_encode(_gradient(16, 16).tobytes(), 16, 16, 3)
    with pytest.raises(ValueError):
        jpeg_decode(enc[: len(enc) // 2])


def test_decode_media_dispatches_on_signature():
    from star_schema_etl_airflow_spark.sources.multimodal import (
        _png_encode,
        decode_media,
    )

    img = _gradient(8, 8)
    jp = decode_media(jpeg_encode(img.tobytes(), 8, 8, 3), "image")
    assert jp["channels"] == 3 and jp["width"] == 8
    png = decode_media(_png_encode(img.tobytes(), 8, 8, 2), "image")
    assert png["pixels"] == img.tobytes()
    with pytest.raises(NotImplementedError):
        decode_media(b"II*\x00....", "image")  # TIFF: no decoder


def test_resize_image_roundtrips_jpeg_container():
    from star_schema_etl_airflow_spark.sources.multimodal import resize_image

    img = _gradient(16, 16)
    small = resize_image(jpeg_encode(img.tobytes(), 16, 16, 3), 8, 8)
    assert small[:2] == b"\xff\xd8"
    dec = jpeg_decode(small)
    assert (dec["width"], dec["height"]) == (8, 8)


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; the walk must skip them, not misread a segment length."""
    h, w = 16, 16
    img = _gradient(h, w)
    payload = jpeg_encode(img.tobytes(), w, h, 3, quality=90)
    # insert fill bytes before the first DQT marker (FF DB)
    i = payload.index(b"\xff\xdb")
    padded = payload[:i] + b"\xff\xff\xff" + payload[i:]
    ref = _decode_rgb(payload, h, w)
    out = _decode_rgb(padded, h, w)
    assert np.array_equal(ref, out)


def test_non_interleaved_multi_scan_raises():
    """A 3-component frame whose first SOS carries only one component
    (legal non-interleaved baseline) must fail loudly, not silently
    return the Y plane as grayscale."""
    h, w = 16, 16
    payload = bytearray(jpeg_encode(_gradient(h, w).tobytes(), w, h, 3))
    i = payload.index(b"\xff\xda")
    ns = payload[i + 4]
    assert ns == 3
    # rebuild the SOS header with only the first component
    seglen = 2 + 1 + 2 * 1 + 3
    sos = (b"\xff\xda" + seglen.to_bytes(2, "big") + b"\x01"
           + bytes(payload[i + 5:i + 7])        # first comp spec
           + bytes(payload[i + 11:i + 14]))     # ss, se, ah/al
    patched = bytes(payload[:i]) + sos + bytes(payload[i + 14:])
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        jpeg_decode(patched)
