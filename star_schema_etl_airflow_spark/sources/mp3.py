"""MPEG-1 audio (MP3/MP2/MP1) frame walker — container metadata
without PCM synthesis, per the public ISO/IEC 11172-3 framing rules.

What this gives a 100 TB pipeline: sample rate, channel mode, layer,
frame/sample counts, exact integer duration, and average bitrate for
every MP3 payload in a crawl — the fields ``decode_stats`` reports —
by walking frame headers only (4 bytes read per ~400-byte frame, VBR
handled naturally because every frame declares its own length).

Why PCM synthesis is NOT here (permanent disposition, `SCALE.md`):
the MPEG-1 subband synthesis window D[512] is a table of committee
constants in the standard (Annex B, Table B.3) — not derivable from a
closed form the way FLAC's fixed predictors, Rice codes and CRCs are.
A from-scratch implementation would mean transcribing 512 opaque
numbers with no independent way to test them here; production swaps
in ffmpeg at the ``decode_media`` routing point instead.  Everything
in THIS module is closed-form framing arithmetic (bitrate/rate
tables, frame-length formulas) and is therefore fully testable.

Framing facts used (ISO/IEC 11172-3 §2.4.1.3, 2.4.2.3):
- 32-bit header: 11 sync bits, 2 version, 2 layer, 1 CRC-absent,
  4 bitrate index, 2 sample-rate index, 1 padding, 1 private,
  2 channel mode, 2 mode ext, 1 copyright, 1 original, 2 emphasis.
- MPEG-1 sample rates: 44100 / 48000 / 32000 Hz.
- Frame length: Layer I  = (12·bitrate/rate + pad)·4 bytes;
  Layers II/III = 144·bitrate/rate + pad bytes (integer division).
- Samples per frame: Layer I 384; Layers II/III 1152.

Scale shape: one payload per cell inside Arrow-batched
``mapInPandas`` (see ``decode_stats``) — no shuffle, per-payload cost
proportional to frame COUNT, not byte count.
"""

from __future__ import annotations

import struct

# bitrate tables (kbps) per layer, MPEG-1, bitrate index 1..14
# (index 0 = free format, 15 = forbidden — both rejected explicitly)
_BITRATE_KBPS = {
    1: [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_RATE_HZ = [44100, 48000, 32000]
_SAMPLES_PER_FRAME = {1: 384, 2: 1152, 3: 1152}


def is_mp3(payload: bytes) -> bool:
    """Cheap container sniff: an ID3v2 tag or an MPEG frame sync."""
    if payload[:3] == b"ID3":
        return True
    return (len(payload) >= 2 and payload[0] == 0xFF
            and (payload[1] & 0xE0) == 0xE0)


def _syncsafe(b: bytes) -> int:
    # ID3v2 sizes store 7 bits per byte (high bit always 0)
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def mp3_probe(payload: bytes) -> dict:
    """MPEG-1 audio → ``{"kind": "audio", "sample_rate", "n_channels",
    "n_frames", "frame_count", "layer", "duration_micros",
    "bitrate_kbps_avg"}`` by walking frame headers (no PCM).

    ``n_frames`` counts PCM samples per channel (the ``decode_stats``
    convention); ``duration_micros`` is the exact integer
    ``n_frames·1e6 div rate``.  Truncated or corrupt payloads raise
    ``ValueError``; MPEG-2/2.5 and free-format raise
    ``NotImplementedError`` (explicit subset boundary)."""
    try:
        return _probe(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt MP3 payload: {exc}") from exc


def _probe(payload: bytes) -> dict:
    pos = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        pos = 10 + _syncsafe(payload[6:10])

    frames = 0
    layer = rate = mode = None
    kbps_sum = 0
    while pos + 4 <= len(payload):
        h = int.from_bytes(payload[pos:pos + 4], "big")
        if (h >> 21) != 0x7FF:
            if frames:
                break          # trailing junk / ID3v1 "TAG" after stream
            raise ValueError(f"MP3 frame sync lost at byte {pos}")
        version = (h >> 19) & 3
        if version != 3:
            raise NotImplementedError(
                "MPEG-1 frames only (MPEG-2/2.5 need the lower-rate "
                "tables; swap in ffmpeg at deployment)")
        layer_code = (h >> 17) & 3
        if layer_code == 0:
            raise ValueError("reserved MPEG layer code 00")
        f_layer = 4 - layer_code              # 11→I, 10→II, 01→III
        bidx = (h >> 12) & 0xF
        if bidx == 0:
            raise NotImplementedError(
                "free-format MPEG bitrate (frame length not derivable "
                "from the header)")
        if bidx == 15:
            raise ValueError("forbidden MPEG bitrate index 15")
        sridx = (h >> 10) & 3
        if sridx == 3:
            raise ValueError("reserved MPEG sample-rate index 3")
        pad = (h >> 9) & 1
        f_mode = (h >> 6) & 3
        kbps = _BITRATE_KBPS[f_layer][bidx - 1]
        hz = _RATE_HZ[sridx]
        # a legal stream keeps layer/rate/mode constant; bitrate may
        # vary per frame (VBR) — the walk reads each frame's own length
        if frames == 0:
            layer, rate, mode = f_layer, hz, f_mode
        elif (f_layer, hz, f_mode) != (layer, rate, mode):
            raise ValueError(
                f"inconsistent MPEG stream at frame {frames}: "
                f"layer/rate/mode changed mid-stream")
        if f_layer == 1:
            flen = (12 * kbps * 1000 // hz + pad) * 4
        else:
            flen = 144 * kbps * 1000 // hz + pad
        if pos + flen > len(payload):
            # header present but the declared frame body runs past the
            # payload end — the docstring's truncation contract
            raise ValueError(
                f"truncated final MP3 frame at byte {pos}: declared "
                f"{flen} bytes, {len(payload) - pos} remain")
        kbps_sum += kbps
        frames += 1
        pos += flen
    if frames == 0:
        raise ValueError("no MPEG frames in payload")

    n = frames * _SAMPLES_PER_FRAME[layer]
    return {
        "kind": "audio",
        "container": "mp3",
        "layer": layer,
        "sample_rate": rate,
        "n_channels": 1 if mode == 3 else 2,
        "n_frames": n,
        "frame_count": frames,
        "duration_micros": n * 1_000_000 // rate,
        "bitrate_kbps_avg": kbps_sum // frames,
    }


def mp3_frame(layer: int, bitrate_kbps: int, rate_hz: int,
              mono: bool = False, pad: int = 0,
              fill: int = 0xA5) -> bytes:
    """One syntactically valid MPEG-1 frame (header + filler payload) —
    the independent test-stream writer, mirroring the codec-test
    discipline of ``tests/test_flac.py``'s ``_lpc_frame``."""
    bidx = _BITRATE_KBPS[layer].index(bitrate_kbps) + 1
    sridx = _RATE_HZ.index(rate_hz)
    h = 0x7FF << 21
    h |= 3 << 19                       # MPEG-1
    h |= (4 - layer) << 17
    h |= 1 << 16                       # no CRC
    h |= bidx << 12
    h |= sridx << 10
    h |= pad << 9
    h |= (3 if mono else 0) << 6       # single_channel / stereo
    if layer == 1:
        flen = (12 * bitrate_kbps * 1000 // rate_hz + pad) * 4
    else:
        flen = 144 * bitrate_kbps * 1000 // rate_hz + pad
    return h.to_bytes(4, "big") + bytes([fill]) * (flen - 4)
