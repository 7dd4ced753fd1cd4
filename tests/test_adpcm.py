"""IMA ADPCM codec (sources/adpcm.py): round-trip fidelity, block
independence, container routing, and explicit unsupported paths."""

from __future__ import annotations

import math
import struct

import pytest

from star_schema_etl_airflow_spark.sources.adpcm import (
    ima_adpcm_decode,
    ima_adpcm_encode,
)


def _sine(n: int, freq: float = 440.0, rate: int = 8000,
          amp: int = 12000) -> list[int]:
    return [int(amp * math.sin(2 * math.pi * freq * i / rate))
            for i in range(n)]


def test_roundtrip_sine_snr():
    samples = _sine(4000)
    dec = ima_adpcm_decode(ima_adpcm_encode(samples, 8000))
    assert dec["sample_rate"] == 8000
    assert dec["n_frames"] == len(samples)
    sig = sum(s * s for s in samples)
    err = sum((a - b) ** 2 for a, b in zip(samples, dec["samples"]))
    snr_db = 10 * math.log10(sig / err)
    # 4-bit ADPCM on a smooth tone comfortably exceeds 20 dB
    assert snr_db > 20, f"SNR {snr_db:.1f} dB"


def test_first_sample_per_block_is_exact():
    samples = _sine(1011)  # spans three blocks (505/block)
    dec = ima_adpcm_decode(ima_adpcm_encode(samples, 8000))
    for start in (0, 505, 1010):
        assert dec["samples"][start] == samples[start]


def test_silence_and_step_extremes():
    silent = [0] * 600
    assert ima_adpcm_decode(ima_adpcm_encode(silent, 8000))["samples"] \
        == silent
    # full-scale square wave: clamping must not overflow int16
    square = ([32767] * 50 + [-32768] * 50) * 6
    out = ima_adpcm_decode(ima_adpcm_encode(square, 8000))["samples"]
    assert max(out) <= 32767 and min(out) >= -32768


def test_decode_media_routes_adpcm():
    from star_schema_etl_airflow_spark.sources.multimodal import decode_media

    payload = ima_adpcm_encode(_sine(1200), 16000)
    m = decode_media(payload, "audio")
    assert (m["sample_rate"], m["n_channels"], m["n_frames"]) == \
        (16000, 1, 1200)
    assert len(m["frames"]) == 2 * 1200
    (first,) = struct.unpack("<h", m["frames"][:2])
    assert first == 0  # sine starts at 0, block header is verbatim


def test_unsupported_stays_explicit():
    with pytest.raises(ValueError, match="not a RIFF"):
        ima_adpcm_decode(b"junkjunkjunk")
    payload = bytearray(ima_adpcm_encode(_sine(600), 8000))
    i = payload.index(b"fmt ") + 8
    payload[i:i + 2] = struct.pack("<H", 0x0055)  # claim MP3
    with pytest.raises(NotImplementedError, match="not IMA ADPCM"):
        ima_adpcm_decode(bytes(payload))
    with pytest.raises(ValueError, match="multiple of 8"):
        ima_adpcm_encode(_sine(100), 8000, samples_per_block=10)


def test_truncated_payload_is_valueerror_not_structerror():
    """ADVICE r6: corrupt ADPCM payloads must raise ValueError (the
    decode_err row contract), never a bare struct.error/IndexError."""
    import math
    import pytest

    from star_schema_etl_airflow_spark.sources.adpcm import (
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    samples = [int(8000 * math.sin(i / 10)) for i in range(1000)]
    good = ima_adpcm_encode(samples, 8000)
    # cut inside the fmt chunk: struct.unpack of fmt[:16] underflows
    with pytest.raises((ValueError, NotImplementedError)):
        ima_adpcm_decode(good[:24])
    with pytest.raises((ValueError, NotImplementedError)):
        ima_adpcm_decode(good[:40])


def test_wav_route_truncated_header_is_contract_error():
    """A WAV truncated mid-header makes stdlib wave raise bare EOFError;
    _wav_decode must convert it to the NotImplementedError/ValueError
    contract so decode_stats records an error row."""
    import struct

    import pytest

    from star_schema_etl_airflow_spark.sources.multimodal import decode_media

    truncated = b"RIFF" + struct.pack("<I", 100) + b"WAVE" + b"fmt "
    with pytest.raises((NotImplementedError, ValueError)):
        decode_media(truncated, "audio")
