"""Pure-Python MJPEG/AVI container codec tests (sources/avi.py).

Encoder (struct writer) and decoder (chunk walk) are independent
implementations of the RIFF/AVI layout; frame pixels go through the
separately-tested JPEG codec, so container bugs and codec bugs
localize apart."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from star_schema_etl_airflow_spark.sources.avi import (
    avi_decode,
    avi_encode_mjpeg,
    avi_frame_bytes,
    is_avi,
)
from star_schema_etl_airflow_spark.sources.jpeg import jpeg_decode


def _frames(n: int, w: int = 16, h: int = 8) -> list[bytes]:
    out = []
    for i in range(n):
        rgb = np.full((h, w, 3), [40 + 17 * i, 90, 200 - 11 * i],
                      dtype=np.uint8)
        out.append(rgb.tobytes())
    return out


def test_roundtrip_structure_and_pixels():
    w, h, n, fps = 16, 8, 5, 12
    payload = avi_encode_mjpeg(_frames(n, w, h), w, h, fps=fps, quality=90)
    assert is_avi(payload)
    dec = avi_decode(payload)
    assert (dec["width"], dec["height"], dec["n_frames"], dec["fps"]) == \
        (w, h, n, fps)
    assert len(dec["frames"]) == n
    for i, fr in enumerate(dec["frames"]):
        assert (fr["frame_idx"], fr["width"], fr["height"],
                fr["channels"]) == (i, w, h, 3)
        got = np.frombuffer(fr["pixels"], dtype=np.uint8).reshape(h, w, 3)
        want = np.frombuffer(_frames(n, w, h)[i], dtype=np.uint8) \
            .reshape(h, w, 3)
        # solid-color frames survive JPEG within ±1
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_frame_subset_decode_matches_jpeg_decode():
    """Selective decode returns exactly the same pixels as running the
    JPEG decoder over the raw frame bytes — and skips the others."""
    w, h = 24, 16
    payload = avi_encode_mjpeg(_frames(7, w, h), w, h)
    sub = avi_decode(payload, frame_indices=[2, 5])
    assert [f["frame_idx"] for f in sub["frames"]] == [2, 5]
    for f in sub["frames"]:
        raw = avi_frame_bytes(payload, f["frame_idx"])
        assert raw[:2] == b"\xff\xd8"
        direct = jpeg_decode(raw)
        assert direct["pixels"] == f["pixels"]


def test_metadata_only_walk_decodes_nothing():
    payload = avi_encode_mjpeg(_frames(3), 16, 8, fps=30)
    meta = avi_decode(payload, frame_indices=[])
    assert meta["n_frames"] == 3 and meta["fps"] == 30
    assert meta["frames"] == []


def test_tableless_mjpeg_frame_uses_annex_k_defaults():
    """Strip the DHT segments from a frame (legal for MJPEG per the
    OpenDML convention) — the decoder must fall back to the Annex K.3
    typical tables and produce identical pixels (the encoder writes
    those same tables)."""
    payload = avi_encode_mjpeg(_frames(1), 16, 8)
    raw = avi_frame_bytes(payload, 0)
    stripped = bytearray()
    pos = 0
    while pos < len(raw):
        if raw[pos] == 0xFF and pos + 4 <= len(raw) and raw[pos + 1] == 0xC4:
            (seglen,) = struct.unpack(">H", raw[pos + 2:pos + 4])
            pos += 2 + seglen
            continue
        stripped.append(raw[pos])
        pos += 1
    assert b"\xff\xc4" not in bytes(stripped[:stripped.index(0xDA)])
    direct = jpeg_decode(raw)
    tableless = jpeg_decode(bytes(stripped))
    assert tableless["pixels"] == direct["pixels"]


def test_malformed_and_unsupported_stay_explicit():
    with pytest.raises(NotImplementedError, match="not a RIFF/AVI"):
        avi_decode(b"not an avi at all")
    payload = bytearray(avi_encode_mjpeg(_frames(2), 16, 8))
    i = payload.index(b"vids") + 4
    payload[i:i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPEG only"):
        avi_decode(bytes(payload))
    with pytest.raises(ValueError, match="out of range"):
        avi_decode(avi_encode_mjpeg(_frames(2), 16, 8), frame_indices=[9])


def test_decode_media_video_route():
    from star_schema_etl_airflow_spark.sources.multimodal import decode_media

    payload = avi_encode_mjpeg(_frames(4), 16, 8, fps=10)
    m = decode_media(payload, "video")
    assert (m["width"], m["height"], m["n_frames"], m["fps"],
            m["channels"]) == (16, 8, 4, 10, 3)
    with pytest.raises(NotImplementedError, match="unrecognized video"):
        decode_media(b"\x00" * 64, "video")
