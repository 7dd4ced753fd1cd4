"""FLAC subset codec (sources/flac.py): LOSSLESS round-trips (exact
equality, the PNG/GIF discipline), CRC integrity, multi-frame streams,
and explicit subset boundaries."""

from __future__ import annotations

import math
import struct

import pytest

from star_schema_etl_airflow_spark.sources.flac import (
    flac_decode,
    flac_encode,
)


def _sine(n, freq=440.0, rate=8000, amp=12000):
    return [int(amp * math.sin(2 * math.pi * freq * i / rate))
            for i in range(n)]


def test_roundtrip_exact_sine_multiframe():
    samples = _sine(10000)  # spans 3 frames of 4096
    payload = flac_encode(samples, 8000)
    dec = flac_decode(payload)
    assert dec["sample_rate"] == 8000
    assert dec["samples"] == samples          # LOSSLESS: exact equality
    # and it actually compresses a smooth signal
    assert len(payload) < 2 * len(samples) * 0.8


def test_roundtrip_exact_hard_signals():
    cases = [
        [0] * 1000,                            # silence (order-0/constant)
        [32767, -32768] * 500,                 # full-scale alternation
        list(range(-2048, 2048)),              # perfect ramp (order-2 zeros)
        [((i * 2654435761) % 65536) - 32768    # white-ish noise
         for i in range(5000)],
        [7],                                   # single sample
    ]
    for samples in cases:
        assert flac_decode(flac_encode(samples, 44100))["samples"] == samples


def test_frame_crc_detects_corruption():
    payload = bytearray(flac_encode(_sine(1000), 8000))
    payload[-10] ^= 0x01                       # flip a bit in frame data
    with pytest.raises(ValueError, match="CRC"):
        flac_decode(bytes(payload))


def test_subset_boundaries_are_explicit():
    with pytest.raises(NotImplementedError, match="fLaC"):
        flac_decode(b"RIFFxxxxWAVE")
    # claim 4 channels in STREAMINFO → explicit rejection (stereo is
    # decoded since round 7; >2 channels stays an explicit boundary).
    # Layout: the 3-bit channels-1 field sits in STREAMINFO byte 12
    # (after 16+16+24+24+20 = 100 bits), occupying bits 4..6 of that
    # byte; the metadata block payload starts at file offset 8, so the
    # field is MSB-first mask 0b00001110 of byte 8+12.
    payload = bytearray(flac_encode(_sine(100), 8000))
    payload[8 + 12] |= 0b00000110  # channels-1: 0 → 3 (4 channels)
    with pytest.raises(NotImplementedError, match="mono/stereo"):
        flac_decode(bytes(payload))


def test_decode_media_routes_flac():
    from star_schema_etl_airflow_spark.sources.multimodal import decode_media

    samples = _sine(64)
    m = decode_media(flac_encode(samples, 8000), "audio")
    assert (m["sample_rate"], m["n_channels"], m["n_frames"]) == (8000, 1, 64)
    got = [struct.unpack("<h", m["frames"][2 * i:2 * i + 2])[0]
           for i in range(64)]
    assert got == samples


def _lpc_frame(samples, order, precision, shift, coefs, rate=8000):
    """Independent LPC-subframe writer (test-only): computes residuals
    from the given quantized predictor and emits a spec frame — the
    encoder half our production codec deliberately lacks, so the LPC
    decode path is exercised by a separate implementation."""
    from star_schema_etl_airflow_spark.sources.flac import (
        FLAC_MARKER,
        _BitWriter,
        _best_rice_k,
        _crc8,
        _crc16,
        _utf8_frame_number,
        _zigzag,
    )

    res = [
        samples[i]
        - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
        for i in range(order, len(samples))
    ]
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)   # 16-bit blocksize at end
    hdr.write(0, 4)        # rate from STREAMINFO
    hdr.write(0, 4)        # mono
    hdr.write(0b100, 3)    # 16-bit
    hdr.write(0, 1)
    head = hdr.bytes() + _utf8_frame_number(0) \
        + struct.pack(">H", len(samples) - 1)
    head += bytes([_crc8(head)])

    body = _BitWriter()
    body.write(0, 1)
    body.write(0b100000 | (order - 1), 6)   # LPC subframe
    body.write(0, 1)                        # no wasted bits
    for s in samples[:order]:
        body.write(s & 0xFFFF, 16)
    body.write(precision - 1, 4)
    body.write(shift, 5)
    for c in coefs:
        body.write(c & ((1 << precision) - 1), precision)
    k = _best_rice_k(res)
    body.write(0b00, 2)
    body.write(0, 4)
    body.write(k, 4)
    for r in res:
        u = _zigzag(r)
        body.write_unary(u >> k)
        if k:
            body.write(u & ((1 << k) - 1), k)
    body.align()
    frame = head + body.bytes()
    frame += struct.pack(">H", _crc16(frame))

    si = _BitWriter()
    si.write(4096, 16); si.write(4096, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(0, 3); si.write(15, 5)
    si.write(len(samples), 36)
    info = si.bytes() + b"\x00" * 16
    return (FLAC_MARKER + bytes([0x80]) + len(info).to_bytes(3, "big")
            + info + frame)


def test_lpc_subframe_decodes_exactly():
    samples = _sine(600, freq=200.0, amp=9000)
    # a plausible quantized order-2 predictor (2·cosω pole pair-ish)
    payload = _lpc_frame(samples, order=2, precision=12, shift=9,
                         coefs=[1013, -498])
    dec = flac_decode(payload)
    assert dec["samples"] == samples


def test_lpc_high_order_and_rice_partitions():
    samples = [((i * 40503) % 32768) - 16384 for i in range(512)]
    payload = _lpc_frame(samples, order=8, precision=10, shift=6,
                         coefs=[63, -21, 14, -9, 5, -3, 2, -1])
    assert flac_decode(payload)["samples"] == samples


def test_truncated_payload_is_valueerror_not_indexerror():
    """The decode_err row contract (ADVICE r6): corrupt/truncated
    payloads must surface as ValueError — decode_stats only catches
    (NotImplementedError, ValueError), so a bare IndexError would fail
    the whole 100 TB job instead of becoming an error row."""
    good = flac_encode(_sine(5000), 8000)
    # truncate mid-frame (well past STREAMINFO, inside frame 0's body)
    for cut in (60, len(good) // 2, len(good) - 3):
        with pytest.raises((ValueError, NotImplementedError)):
            flac_decode(good[:cut])
    # truncated metadata header (payload ends inside the block walk)
    with pytest.raises((ValueError, NotImplementedError)):
        flac_decode(b"fLaC\x80")


def _stereo_signal(n, amp=11000):
    """Interleaved L R with genuinely different channels (L a sine, R a
    phase-shifted lower sine plus noise) so decorrelation is exercised
    with non-trivial side values."""
    out = []
    for i in range(n):
        l = int(amp * math.sin(2 * math.pi * 440.0 * i / 8000))
        r = int(0.6 * amp * math.sin(2 * math.pi * 330.0 * i / 8000 + 0.7)
                + (((i * 2654435761) % 97) - 48))
        out += [l, r]
    return out


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_roundtrip_exact_all_layouts(mode):
    """Stereo encode→decode is LOSSLESS in every channel layout —
    the three decorrelated modes are exactly invertible in integers
    (side = L−R at 17 bits; mid's floored low bit recovered from
    side's parity)."""
    samples = _stereo_signal(5000)   # spans 2 frames of 4096
    payload = flac_encode(samples, 8000, channels=2, stereo_mode=mode)
    dec = flac_decode(payload)
    assert dec["n_channels"] == 2
    assert dec["n_frames"] == 5000
    assert dec["samples"] == samples


@pytest.mark.parametrize(
    "mode", ["left_side", "right_side", "mid_side"])
def test_stereo_extreme_values_roundtrip(mode):
    """Full-scale anti-correlated channels: side = L−R spans the full
    17-bit range (±65535) — the widened side-channel width must hold."""
    samples = []
    for i in range(1000):
        v = 32767 if i % 2 == 0 else -32768
        samples += [v, -v if v != -32768 else 32767]
    payload = flac_encode(samples, 44100, channels=2, stereo_mode=mode)
    assert flac_decode(payload)["samples"] == samples


def test_stereo_decode_media_contract():
    """decode_media surfaces stereo FLAC with the WAV interleaving
    convention: n_channels=2, n_frames per-channel, frames little-
    endian int16 interleaved L R."""
    from star_schema_etl_airflow_spark.sources.multimodal import decode_media

    samples = _stereo_signal(64)
    m = decode_media(
        flac_encode(samples, 8000, channels=2, stereo_mode="mid_side"),
        "audio")
    assert (m["sample_rate"], m["n_channels"], m["n_frames"]) == (8000, 2, 64)
    got = [struct.unpack("<h", m["frames"][2 * i:2 * i + 2])[0]
           for i in range(128)]
    assert got == samples


def test_stereo_compresses_correlated_signal():
    """A mostly-mono signal (R ≈ L) must compress better in a
    decorrelated layout than as independent channels — the reason the
    stereo modes exist."""
    samples = []
    for i in range(4000):
        l = int(12000 * math.sin(2 * math.pi * 440.0 * i / 8000))
        samples += [l, l + (i % 3) - 1]    # R = L ± 1
    ind = flac_encode(samples, 8000, channels=2,
                      stereo_mode="independent")
    ls = flac_encode(samples, 8000, channels=2, stereo_mode="left_side")
    assert len(ls) < len(ind)
    assert flac_decode(ls)["samples"] == samples
    assert flac_decode(ind)["samples"] == samples


def test_frame_channel_layout_must_match_streaminfo():
    """ADVICE r7: a mono frame inside a stereo-declared stream (header
    splice below) silently miscounted n_frames/interleaving before —
    the decoder now cross-checks each frame's channel assignment
    against STREAMINFO and raises."""
    mono = flac_encode([i % 100 for i in range(256)], 44100, channels=1)
    stereo = flac_encode([i % 100 for i in range(512)], 44100, channels=2)
    # fLaC magic (4) + metadata block header (4) + STREAMINFO (34) = 42:
    # stereo-declared header over the mono stream's frames
    spliced = stereo[:42] + mono[42:]
    with pytest.raises(ValueError, match="STREAMINFO declares 2"):
        flac_decode(spliced)
    # and the reverse: mono-declared header over stereo frames
    spliced = mono[:42] + stereo[42:]
    with pytest.raises(ValueError, match="STREAMINFO declares 1"):
        flac_decode(spliced)


def test_order_selection_diff_chain_matches_residuals():
    """The encoder's incremental diff chain (r16) must yield exactly
    ``_residuals(chan, o)`` for every fixed order — the invariant the
    successive-difference order selection in ``_write_subframe`` rests
    on (fixed-predictor coefficients are binomial rows)."""
    import random

    from star_schema_etl_airflow_spark.sources.flac import (
        _MAX_ORDER,
        _residuals,
    )

    rng = random.Random(20260818)
    for _ in range(50):
        n = rng.randint(1, 200)
        chan = [rng.randint(-32768, 32767) for _ in range(n)]
        diffs = [chan]
        for _ in range(min(_MAX_ORDER, n - 1)):
            prev = diffs[-1]
            diffs.append(
                [prev[i] - prev[i - 1] for i in range(1, len(prev))]
            )
        for o in range(min(_MAX_ORDER, n - 1) + 1):
            assert diffs[o] == _residuals(chan, o)
