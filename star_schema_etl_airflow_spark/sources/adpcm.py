"""Pure-Python IMA ADPCM (DVI4) codec in a RIFF/WAVE container.

The 4-bit adaptive-delta codec of the IMA Digital Audio Focus Group
(the tables below are the published spec constants, identical to those
in RFC 3551 §4.5.1 for DVI4): ~4:1 compression of 16-bit PCM with a
step-size table walk.  WAV format tag 0x0011; each block carries a
(predictor, step-index) header per the Microsoft WAVE spec, so blocks
decode independently — the property that matters for seeking and for
splitting long recordings across Arrow batches.

The stdlib ``wave`` reader handles only PCM, so the container walk
here is manual (same RIFF discipline as ``sources/avi.py``).  Encoder
and decoder share only the spec tables; the quantize and reconstruct
paths are written separately, so a round-trip failure localizes.
MP3/Vorbis stay ffmpeg swap-in stubs (``sources/multimodal.py``).
"""

from __future__ import annotations

import struct

# IMA spec tables
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]

WAVE_FORMAT_IMA_ADPCM = 0x0011


def _clamp16(v: int) -> int:
    return max(-32768, min(32767, v))


def _encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One 4-bit code; returns (code, new_pred, new_index)."""
    step = STEP_TABLE[index]
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    return code, _decode_sample(code, pred, index)[0], \
        max(0, min(88, index + INDEX_TABLE[code]))


def _decode_sample(code: int, pred: int, index: int) -> tuple[int, int]:
    """Reconstruct one sample; returns (new_pred, new_index)."""
    step = STEP_TABLE[index]
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    if code & 8:
        diff = -diff
    return _clamp16(pred + diff), max(0, min(88, index + INDEX_TABLE[code]))


def ima_adpcm_encode(samples: list[int], rate: int,
                     samples_per_block: int = 505) -> bytes:
    """16-bit mono PCM → IMA-ADPCM WAV.  Each block: 4-byte state
    header (the first sample verbatim + step index) then 4-bit codes
    for the remaining ``samples_per_block - 1`` samples, two per byte,
    low nibble first.  The last block zero-pads (decode trims via the
    fact chunk's sample count)."""
    if (samples_per_block - 1) % 8 != 0:
        raise ValueError("samples_per_block must be 1 + multiple of 8")
    block_align = 4 + (samples_per_block - 1) // 2
    index = 0
    blocks = bytearray()
    for start in range(0, len(samples), samples_per_block):
        chunk = samples[start:start + samples_per_block]
        pred = chunk[0]
        blocks += struct.pack("<hBB", pred, index, 0)
        codes = []
        for s in chunk[1:]:
            code, pred, index = _encode_sample(s, pred, index)
            codes.append(code)
        codes += [0] * ((samples_per_block - 1) - len(codes))
        for i in range(0, len(codes), 2):
            blocks.append(codes[i] | (codes[i + 1] << 4))
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM, 1, rate,
        rate * block_align // samples_per_block,  # avg bytes/sec
        block_align, 4,                           # block align, bits/sample
        2, samples_per_block,                     # cbSize, samples/block
    )
    fact = struct.pack("<I", len(samples))
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def ima_adpcm_decode(payload: bytes) -> dict:
    """IMA-ADPCM WAV → ``{"kind": "audio", "sample_rate", "n_channels",
    "n_frames", "samples": [int16, ...]}`` (mono only — the synthesized
    pipeline shape; stereo interleaving raises explicitly).  Truncated
    or corrupt payloads raise ``ValueError``, never a bare
    ``struct.error``/``IndexError`` (the decode_err row contract)."""
    try:
        return _ima_adpcm_decode(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(
            f"truncated or corrupt ADPCM payload: {exc}") from exc


def _ima_adpcm_decode(payload: bytes) -> dict:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    fmt = data = None
    n_samples = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            (n_samples,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    tag, channels, rate, _bps, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16])
    if tag != WAVE_FORMAT_IMA_ADPCM:
        raise NotImplementedError(
            f"WAVE format tag {tag:#x} is not IMA ADPCM (PCM goes through "
            "the stdlib reader; others need ffmpeg)")
    if channels != 1 or bits != 4:
        raise NotImplementedError(
            f"IMA ADPCM decoder supports 4-bit mono only "
            f"(channels={channels}, bits={bits})")
    (samples_per_block,) = struct.unpack("<H", fmt[18:20])
    out: list[int] = []
    for bstart in range(0, len(data), block_align):
        block = data[bstart:bstart + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block header")
        pred, index, _r = struct.unpack("<hBB", block[:4])
        index = max(0, min(88, index))
        out.append(pred)
        for byte in block[4:]:
            for code in (byte & 0x0F, byte >> 4):
                pred, index = _decode_sample(code, pred, index)
                out.append(pred)
    if n_samples is not None:
        out = out[:n_samples]
    return {
        "kind": "audio",
        "sample_rate": rate,
        "n_channels": channels,
        "n_frames": len(out),
        "samples": out,
    }
