"""MPEG-1 frame walker (sources/mp3.py): framing arithmetic against
hand-computed ISO/IEC 11172-3 frame lengths, ID3 skipping, VBR walks,
channel/layer surfaces, and the explicit subset boundaries."""

from __future__ import annotations

import pytest

from star_schema_etl_airflow_spark.sources.mp3 import (
    is_mp3,
    mp3_frame,
    mp3_probe,
)


def test_frame_lengths_match_spec_formulas():
    # Layer III, 128 kbps @ 44100: 144*128000/44100 = 417 (pad → 418)
    assert len(mp3_frame(3, 128, 44100)) == 417
    assert len(mp3_frame(3, 128, 44100, pad=1)) == 418
    # Layer III, 320 kbps @ 48000: 144*320000/48000 = 960
    assert len(mp3_frame(3, 320, 48000)) == 960
    # Layer II, 192 kbps @ 44100: 144*192000/44100 = 626
    assert len(mp3_frame(2, 192, 44100)) == 626
    # Layer I, 192 kbps @ 44100: (12*192000/44100 + 0)*4 = 52*4 = 208
    assert len(mp3_frame(1, 192, 44100)) == 208
    assert len(mp3_frame(1, 192, 44100, pad=1)) == 212  # slot = 4 bytes


def test_probe_cbr_stream():
    stream = b"".join(mp3_frame(3, 128, 44100) for _ in range(25))
    m = mp3_probe(stream)
    assert m["layer"] == 3
    assert m["sample_rate"] == 44100
    assert m["n_channels"] == 2
    assert m["frame_count"] == 25
    assert m["n_frames"] == 25 * 1152
    # exact integer duration: 28800 samples / 44100 Hz
    assert m["duration_micros"] == 25 * 1152 * 1_000_000 // 44100
    assert m["bitrate_kbps_avg"] == 128


def test_probe_vbr_stream_and_average_bitrate():
    rates = [128, 192, 320, 96]
    stream = b"".join(mp3_frame(3, k, 44100) for k in rates)
    m = mp3_probe(stream)
    assert m["frame_count"] == 4
    assert m["bitrate_kbps_avg"] == sum(rates) // 4


def test_probe_skips_id3v2_and_trailing_tag():
    body = b"junkdata" * 4
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, len(body)]) + body
    frames = b"".join(mp3_frame(2, 64, 32000, mono=True)
                      for _ in range(3))
    tag_v1 = b"TAG" + b"\x00" * 125            # ID3v1 trailer
    m = mp3_probe(id3 + frames + tag_v1)
    assert m["frame_count"] == 3
    assert m["n_channels"] == 1
    assert m["sample_rate"] == 32000
    assert m["layer"] == 2


def test_layer1_sample_count():
    stream = b"".join(mp3_frame(1, 256, 48000) for _ in range(5))
    m = mp3_probe(stream)
    assert m["n_frames"] == 5 * 384            # Layer I: 384/frame


def test_boundaries_are_explicit():
    with pytest.raises(ValueError, match="sync lost"):
        mp3_probe(b"\x00\x01\x02\x03" * 10)
    with pytest.raises(ValueError, match="no MPEG frames"):
        mp3_probe(b"ID3\x04\x00\x00\x00\x00\x00\x00")
    # MPEG-2 (version bits 10) is out of subset
    f = bytearray(mp3_frame(3, 128, 44100))
    f[1] &= ~0x08
    with pytest.raises(NotImplementedError, match="MPEG-1"):
        mp3_probe(bytes(f))
    # free-format bitrate (index 0)
    f = bytearray(mp3_frame(3, 128, 44100))
    f[2] &= 0x0F
    with pytest.raises(NotImplementedError, match="free-format"):
        mp3_probe(bytes(f))
    # layer/rate/mode must not change mid-stream
    mixed = mp3_frame(3, 128, 44100) + mp3_frame(3, 128, 48000)
    with pytest.raises(ValueError, match="inconsistent"):
        mp3_probe(mixed)
    # truncated mid-header after a valid frame: walker stops cleanly
    ok = mp3_frame(3, 128, 44100)
    assert mp3_probe(ok + b"\xff")["frame_count"] == 1


def test_sniff_and_decode_media_route():
    from star_schema_etl_airflow_spark.sources.multimodal import decode_media

    stream = b"".join(mp3_frame(3, 160, 44100) for _ in range(2))
    assert is_mp3(stream)
    assert not is_mp3(b"RIFF....WAVE")
    m = decode_media(stream, "audio")
    assert (m["sample_rate"], m["n_channels"], m["n_frames"]) \
        == (44100, 2, 2304)


def test_decode_stats_reports_mp3_rows(spark):
    from star_schema_etl_airflow_spark.sources.multimodal import decode_stats

    stream = b"".join(mp3_frame(3, 128, 44100) for _ in range(4))
    media = spark.createDataFrame(
        [(1, "audio", bytearray(stream))],
        "media_id long, media_type string, payload binary",
    )
    row = decode_stats(media).collect()[0]
    assert row.decoded and row.sample_rate == 44100 \
        and row.n_frames == 4 * 1152 and row.decode_err is None


def test_truncated_final_frame_raises():
    """ADVICE r7: a final frame whose declared length runs past the
    payload end must raise (the docstring's truncation contract), not
    count as a whole frame and overstate duration."""
    ok = mp3_frame(3, 128, 44100)
    with pytest.raises(ValueError, match="truncated final MP3 frame"):
        mp3_probe(ok + ok[:-10])
    # a lone truncated frame likewise
    with pytest.raises(ValueError, match="truncated final MP3 frame"):
        mp3_probe(ok[:-1])


def test_reserved_and_forbidden_header_fields_raise():
    """VERDICT r7 task 6: every reserved/forbidden header field value
    maps to the documented contract error."""
    f = bytearray(mp3_frame(3, 128, 44100))
    # layer bits 00 (reserved): byte 1 bits 2-1
    f[1] = (f[1] & ~0x06)
    with pytest.raises(ValueError, match="reserved MPEG layer"):
        mp3_probe(bytes(f))
    # bitrate index 15 (forbidden): byte 2 high nibble
    f = bytearray(mp3_frame(3, 128, 44100))
    f[2] |= 0xF0
    with pytest.raises(ValueError, match="forbidden MPEG bitrate"):
        mp3_probe(bytes(f))
    # sample-rate index 3 (reserved): byte 2 bits 3-2
    f = bytearray(mp3_frame(3, 128, 44100))
    f[2] |= 0x0C
    with pytest.raises(ValueError, match="reserved MPEG sample-rate"):
        mp3_probe(bytes(f))


def test_id3v2_lying_size_fields():
    """A truncated ID3v2 header, and a syncsafe size pointing past the
    payload end, both raise — never IndexError from the frame walk."""
    with pytest.raises(ValueError, match="truncated ID3v2"):
        mp3_probe(b"ID3\x04\x00")
    frames = mp3_frame(3, 128, 44100)
    # size claims 1 MB of tag data; only one frame follows
    lying = b"ID3\x04\x00\x00" + bytes([0, 0x40, 0, 0]) + frames
    with pytest.raises(ValueError, match="no MPEG frames"):
        mp3_probe(lying)
    # size that lands the walker mid-frame: sync lost, no frames seen
    inside = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 3]) + b"abc" + frames[:50]
    with pytest.raises(ValueError, match="sync lost|truncated"):
        mp3_probe(inside[:40])


def test_mid_stream_sync_corruption_stops_cleanly():
    """Corrupting the second frame's sync word after a valid first frame
    stops the walk (trailing-junk rule) with the valid prefix counted."""
    a, b = mp3_frame(3, 128, 44100), bytearray(mp3_frame(3, 128, 44100))
    b[0] = 0x00
    m = mp3_probe(bytes(a) + bytes(b))
    assert m["frame_count"] == 1


def test_header_field_sweep_never_leaks():
    """All 65536 values of header bytes 1-2 (version/layer/CRC/bitrate/
    rate/padding) on a synced frame: probe returns or raises the
    contract errors — never IndexError/KeyError/struct.error."""
    body = bytes(600)
    for b1 in range(256):
        for b2 in range(256):
            payload = bytes([0xFF, 0xE0 | (b1 & 0x1F), b2, 0xC4]) + body
            try:
                mp3_probe(payload)
            except (ValueError, NotImplementedError):
                pass
            except Exception as exc:  # noqa: BLE001 — the assertion
                raise AssertionError(
                    f"b1={b1:#x} b2={b2:#x}: "
                    f"{type(exc).__name__}: {exc}") from exc
