"""Pure-Python FLAC subset codec (lossless audio), per the public FLAC
format specification (RFC 9639): fLaC marker + STREAMINFO, frames of
CONSTANT / VERBATIM / FIXED-predictor subframes with Rice-coded
residuals, CRC-8 frame headers and CRC-16 frames.

Why FLAC here: unlike MPEG audio (whose filterbank windows are 512
tabulated committee constants — not reproducible from closed form, so
MP3/MP2 stay honest ffmpeg stubs), FLAC's entire math is closed-form:
fixed polynomial predictors (the order-k difference operators), Rice
(Golomb power-of-two) coding, and CRCs with published generators.
That makes a spec-faithful subset implementable AND losslessly
round-trippable — decode(encode(x)) == x exactly, the same test
discipline as the PNG/GIF codecs.

Subset bounds (explicit, never silent): 16-bit mono/stereo, one Rice
partition per subframe and fixed predictors only on ENCODE (stereo in
any of the four channel layouts — independent, left/side, right/side,
mid/side — all exactly invertible in integers); DECODE accepts the
full mono/stereo 16-bit frame surface — CONSTANT, VERBATIM, FIXED
0-4, and quantized-LPC subframes (any order/precision/shift) with
multi-partition Rice residuals, side channels at 17 bits — and raises
``NotImplementedError`` for other bit depths and channel counts.

Scale shape: one payload per cell, decoded inside Arrow-batched
``mapInPandas`` like every other codec (see ``decode_stats``) — no
shuffle, per-payload cost.
"""

from __future__ import annotations

import struct

FLAC_MARKER = b"fLaC"
_BLOCK = 4096
_MAX_ORDER = 4

# fixed-predictor residual: r[i] = sum of binomial-signed history taps
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc_table(poly: int, width: int) -> list[int]:
    """Byte-indexed CRC table for a left-shifting CRC of ``width`` bits
    — the standard table form of the bit-loop it replaces (r16 per-task
    speedup; identical values by construction)."""
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top \
                else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC frame
    header CRC."""
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the FLAC
    whole-frame CRC."""
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = (t[(crc >> 8) ^ b] ^ (crc << 8)) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        # word-wise: slice the covering bytes once and shift, instead of
        # one loop iteration per bit (r16 per-task speedup; identical
        # big-endian bit order)
        start = (self.byte << 3) + self.bit
        end = start + bits
        last = (end + 7) >> 3
        if last > len(self.data):
            # fail fast on truncated payloads, like the pre-r16 per-bit
            # loop did (r16 ADVICE): the slice below would silently
            # zero-extend, leaving truncation detection to downstream
            # CRC/sync checks.  decode_err converts this to ValueError.
            raise IndexError("bit read past end of data")
        window = int.from_bytes(self.data[self.byte:last], "big")
        v = (window >> ((last << 3) - end)) & ((1 << bits) - 1)
        self.byte = end >> 3
        self.bit = end & 7
        return v

    def read_unary(self) -> int:
        # byte-at-a-time zero scan: bit_length() finds the first set bit
        # of the unconsumed remainder of the current byte (r16; same
        # MSB-first semantics as the former per-bit loop)
        q = 0
        while True:
            rem = 8 - self.bit
            cur = self.data[self.byte] & ((1 << rem) - 1)
            if cur == 0:
                q += rem
                self.byte += 1
                self.bit = 0
                continue
            zeros = rem - cur.bit_length()
            q += zeros
            self.bit += zeros + 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _residuals(samples: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    return [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]


def _best_rice_k(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res) + 1e-9
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


# --- encoder ----------------------------------------------------------------


# frame-header channel-assignment codes (RFC 9639 §9.1.3): in stereo
# decorrelation modes the SIDE channel (the L−R difference) carries one
# extra bit; in right/side the side channel is stored FIRST.
_STEREO_CODES = {
    "independent": 0b0001,
    "left_side": 0b1000,
    "right_side": 0b1001,
    "mid_side": 0b1010,
}


def flac_encode(samples: list[int], rate: int, channels: int = 1,
                stereo_mode: str = "left_side") -> bytes:
    """16-bit PCM → FLAC (subset: fixed predictors, one Rice partition,
    blocksize 4096).  ``channels=2`` takes interleaved L R L R samples
    and encodes every frame in ``stereo_mode`` — one of "independent",
    "left_side", "right_side", "mid_side" (RFC 9639 §9.1.3); the three
    decorrelated modes are exactly invertible in integers, so stereo
    round-trips stay lossless."""
    if channels not in (1, 2):
        raise ValueError(f"flac_encode supports 1 or 2 channels, "
                         f"got {channels}")
    if channels == 2 and stereo_mode not in _STEREO_CODES:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if len(samples) % channels:
        raise ValueError("interleaved sample count not divisible by "
                         "channel count")
    n = len(samples) // channels
    out = bytearray(FLAC_MARKER)
    # STREAMINFO (34 bytes), marked last metadata block
    si = _BitWriter()
    si.write(_BLOCK, 16)            # min blocksize
    si.write(_BLOCK, 16)            # max blocksize
    si.write(0, 24)                 # min framesize (unknown)
    si.write(0, 24)                 # max framesize (unknown)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)                 # bits per sample - 1 (16)
    si.write(n, 36)                 # inter-channel sample count
    info = si.bytes() + b"\x00" * 16  # null MD5 (unset, legal)
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    for fi, start in enumerate(range(0, n, _BLOCK)):
        block = samples[start * channels:(start + _BLOCK) * channels]
        out += _encode_frame(block, fi, rate, channels, stereo_mode)
    return bytes(out)


def _utf8_frame_number(fi: int) -> bytes:
    # FLAC reuses UTF-8 coding for frame numbers
    if fi < 0x80:
        return bytes([fi])
    if fi < 0x800:
        return bytes([0xC0 | (fi >> 6), 0x80 | (fi & 0x3F)])
    return bytes([0xE0 | (fi >> 12), 0x80 | ((fi >> 6) & 0x3F),
                  0x80 | (fi & 0x3F)])


def _stored_channels(block: list[int], channels: int,
                     stereo_mode: str) -> list[tuple[list[int], int]]:
    """The (samples, bits-per-sample) per stored subframe.  Stereo
    decorrelation per RFC 9639 §9.1.3: side = L − R needs 17 bits;
    mid = (L + R) >> 1 floors, and the lost low bit is recovered from
    side's parity on decode (L + R and L − R share parity)."""
    if channels == 1:
        return [(block, 16)]
    left, right = block[0::2], block[1::2]
    if stereo_mode == "independent":
        return [(left, 16), (right, 16)]
    side = [l - r for l, r in zip(left, right)]
    if stereo_mode == "left_side":
        return [(left, 16), (side, 17)]
    if stereo_mode == "right_side":
        return [(side, 17), (right, 16)]   # side channel stored first
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    return [(mid, 16), (side, 17)]


def _write_subframe(body: "_BitWriter", chan: list[int], bps: int) -> None:
    # pick the cheapest fixed order by total absolute residual.  The
    # order-o fixed-predictor residual is exactly the o-th successive
    # difference of the signal (the _FIXED_COEFS rows are the binomial
    # coefficients), so one incremental diff chain yields every
    # candidate's residuals in O(n) per order instead of re-deriving
    # each from scratch through the coefficient fold (r16 per-task
    # speedup; equality with _residuals is pinned in tests/test_flac.py)
    maxo = min(_MAX_ORDER, len(chan) - 1)
    diffs = [chan]
    for _ in range(maxo):
        prev = diffs[-1]
        diffs.append([prev[i] - prev[i - 1] for i in range(1, len(prev))])
    costs = [sum(map(abs, d)) for d in diffs]
    order = costs.index(min(costs))
    res = diffs[order]
    mask = (1 << bps) - 1
    body.write(0, 1)                       # subframe: zero pad bit
    body.write(0b001000 | order, 6)        # FIXED, order
    body.write(0, 1)                       # no wasted bits
    for s in chan[:order]:                 # warm-up samples, verbatim
        body.write(s & mask, bps)
    k = _best_rice_k(res)
    body.write(0b00, 2)                    # residual method: RICE (4-bit k)
    body.write(0, 4)                       # partition order 0
    body.write(k, 4)
    for r in res:
        u = _zigzag(r)
        body.write_unary(u >> k)
        if k:
            body.write(u & ((1 << k) - 1), k)


def _encode_frame(block: list[int], fi: int, rate: int,
                  channels: int = 1,
                  stereo_mode: str = "left_side") -> bytes:
    blocksize = len(block) // channels
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)  # sync
    hdr.write(0, 1)                  # reserved
    hdr.write(0, 1)                  # fixed-blocksize stream
    hdr.write(0b0111, 4)             # blocksize: 16-bit at end of header
    hdr.write(0b0000, 4)             # sample rate: from STREAMINFO
    hdr.write(0 if channels == 1 else _STEREO_CODES[stereo_mode], 4)
    hdr.write(0b100, 3)              # sample size: 16
    hdr.write(0, 1)                  # reserved
    head = hdr.bytes() + _utf8_frame_number(fi) \
        + struct.pack(">H", blocksize - 1)
    head += bytes([_crc8(head)])

    body = _BitWriter()
    for chan, bps in _stored_channels(block, channels, stereo_mode):
        _write_subframe(body, chan, bps)
    body.align()
    frame = head + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


# --- decoder ----------------------------------------------------------------


def flac_decode(payload: bytes) -> dict:
    """FLAC → ``{"kind": "audio", "sample_rate", "n_channels",
    "n_frames", "samples"}`` (stereo interleaved L R L R, n_frames
    per-channel).  Subset decoder: 16-bit mono/stereo — CONSTANT,
    VERBATIM, FIXED 0-4, and quantized-LPC subframes (any
    order/precision/shift) with multi-partition Rice residuals, and
    the four stereo layouts (independent, left/side, right/side,
    mid/side, RFC 9639 §9.1.3).  Other bit depths / channel counts
    raise ``NotImplementedError``; truncated or corrupt payloads raise
    ``ValueError`` (the decode_err row contract — a low-level
    ``IndexError``/``struct.error`` must never escape into a job)."""
    try:
        return _flac_decode(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt FLAC payload: {exc}") from exc


def _flac_decode(payload: bytes) -> dict:
    if payload[:4] != FLAC_MARKER:
        raise NotImplementedError("not a FLAC payload (missing fLaC)")
    pos = 4
    rate = n_total = None
    while True:
        hdr = payload[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        size = int.from_bytes(payload[pos + 1:pos + 4], "big")
        if btype == 0:  # STREAMINFO
            r = _BitReader(payload, pos + 4)
            r.read(16); r.read(16); r.read(24); r.read(24)
            rate = r.read(20)
            channels = r.read(3) + 1
            bps = r.read(5) + 1
            n_total = r.read(36)
            if channels not in (1, 2) or bps != 16:
                raise NotImplementedError(
                    f"FLAC subset decoder: 16-bit mono/stereo only "
                    f"(channels={channels}, bps={bps})")
        pos += 4 + size
        if last:
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")

    # interleaved output (L R L R for stereo — the WAV convention the
    # decode_media frames contract already uses); n_total counts
    # inter-channel samples
    samples: list[int] = []
    while pos < len(payload) and len(samples) < n_total * channels:
        block, pos = _decode_frame(payload, pos, channels)
        samples.extend(block)
    samples = samples[:n_total * channels]
    return {
        "kind": "audio",
        "sample_rate": rate,
        "n_channels": channels,
        "n_frames": len(samples) // channels,
        "samples": samples,
    }


def _decode_frame(payload: bytes, pos: int,
                  si_channels: int | None = None) -> tuple[list[int], int]:
    r = _BitReader(payload, pos)
    if r.read(14) != 0b11111111111110:
        raise ValueError(f"FLAC frame sync lost at byte {pos}")
    r.read(1)                       # reserved
    r.read(1)                       # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    bps_code = r.read(3)
    r.read(1)
    # channel assignment → stored-subframe bit widths (the side channel
    # of a decorrelated pair carries one extra bit, RFC 9639 §9.1.3)
    if ch_code == 0b0000:
        layout, widths = "mono", (16,)
    elif ch_code == 0b0001:
        layout, widths = "independent", (16, 16)
    elif ch_code == 0b1000:
        layout, widths = "left_side", (16, 17)
    elif ch_code == 0b1001:
        layout, widths = "right_side", (17, 16)
    elif ch_code == 0b1010:
        layout, widths = "mid_side", (16, 17)
    else:
        raise NotImplementedError(
            f"FLAC subset decoder: mono/stereo frames only "
            f"(channel code {ch_code:#06b})")
    if si_channels is not None and len(widths) != si_channels:
        # a mono frame inside a stereo-declared stream (or vice versa)
        # would silently miscount n_frames and break the interleaving
        raise ValueError(
            f"FLAC frame at byte {pos} has {len(widths)} channel(s) "
            f"({layout}) but STREAMINFO declares {si_channels}")
    if bps_code not in (0b100, 0b000):
        raise NotImplementedError("FLAC subset decoder: 16-bit only")
    # frame number: UTF-8 coded
    first = r.read(8)
    extra = 0
    if first >= 0xF0:
        extra = 3
    elif first >= 0xE0:
        extra = 2
    elif first >= 0xC0:
        extra = 1
    for _ in range(extra):
        r.read(8)
    if bs_code == 0b0110:
        blocksize = r.read(8) + 1
    elif bs_code == 0b0111:
        blocksize = r.read(16) + 1
    elif bs_code == 0b0001:
        blocksize = 192
    elif 0b0010 <= bs_code <= 0b0101:
        blocksize = 576 << (bs_code - 2)
    elif bs_code >= 0b1000:
        blocksize = 256 << (bs_code - 8)
    else:
        raise ValueError(f"reserved blocksize code {bs_code}")
    if sr_code == 0b1100:
        r.read(8)
    elif sr_code in (0b1101, 0b1110):
        r.read(16)
    r.read(8)                       # header CRC-8 (verified below)
    hdr_len = r.byte - pos
    if _crc8(payload[pos:pos + hdr_len - 1]) != payload[pos + hdr_len - 1]:
        raise ValueError("FLAC frame header CRC-8 mismatch")

    chans = [_decode_subframe(r, blocksize, w) for w in widths]

    r.align()
    frame_end = r.byte
    (crc,) = struct.unpack(">H", payload[frame_end:frame_end + 2])
    if _crc16(payload[pos:frame_end]) != crc:
        raise ValueError("FLAC frame CRC-16 mismatch")

    # undo inter-channel decorrelation and interleave (RFC 9639 §9.1.3)
    if layout == "mono":
        block = chans[0]
    else:
        if layout == "independent":
            left, right = chans
        elif layout == "left_side":
            left = chans[0]
            right = [l - s for l, s in zip(chans[0], chans[1])]
        elif layout == "right_side":
            right = chans[1]
            left = [r_ + s for s, r_ in zip(chans[0], chans[1])]
        else:  # mid_side: mid floored (L+R)>>1; parity restored from
            # side, since L+R and L−R are congruent mod 2
            left, right = [], []
            for m, s in zip(chans[0], chans[1]):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
        block = [v for pair in zip(left, right) for v in pair]
    return block, frame_end + 2


def _decode_subframe(r: "_BitReader", blocksize: int,
                     base_bps: int) -> list[int]:
    if r.read(1) != 0:
        raise ValueError("FLAC subframe pad bit set")
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    bps = base_bps - wasted
    if sf_type == 0b000000:                         # CONSTANT
        v = _sign_extend(r.read(bps), bps) << wasted
        block = [v] * blocksize
    elif sf_type == 0b000001:                       # VERBATIM
        block = [(_sign_extend(r.read(bps), bps)) << wasted
                 for _ in range(blocksize)]
    elif 0b001000 <= sf_type <= 0b001100:           # FIXED 0..4
        order = sf_type & 0x07
        warm = [_sign_extend(r.read(bps), bps) for _ in range(order)]
        res = _read_rice_residual(r, blocksize, order)
        block = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = sum(c * block[i - 1 - j] for j, c in enumerate(coefs))
            block.append(pred + res[i - order])
        if wasted:
            block = [s << wasted for s in block]
    elif sf_type >= 0b100000:                       # LPC, order 1..32
        order = (sf_type & 0x1F) + 1
        warm = [_sign_extend(r.read(bps), bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC coefficient precision code 1111")
        shift = _sign_extend(r.read(5), 5)
        if shift < 0:
            raise ValueError("negative LPC shift is forbidden")
        coefs = [_sign_extend(r.read(precision), precision)
                 for _ in range(order)]
        res = _read_rice_residual(r, blocksize, order)
        block = list(warm)
        for i in range(order, blocksize):
            pred = sum(c * block[i - 1 - j]
                       for j, c in enumerate(coefs)) >> shift
            block.append(pred + res[i - order])
        if wasted:
            block = [s << wasted for s in block]
    else:
        raise ValueError(f"reserved subframe type {sf_type:#08b}")
    return block


def _read_rice_residual(r: _BitReader, blocksize: int,
                        order: int) -> list[int]:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual method {method}")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    part_order = r.read(4)
    nparts = 1 << part_order
    out: list[int] = []
    for p in range(nparts):
        count = (blocksize >> part_order) - (order if p == 0 else 0)
        k = r.read(kbits)
        if k == escape:
            bits = r.read(5)
            out.extend(_sign_extend(r.read(bits), bits) if bits else 0
                       for _ in range(count))
        else:
            for _ in range(count):
                u = (r.read_unary() << k) | (r.read(k) if k else 0)
                out.append(_unzigzag(u))
    return out


def _sign_extend(v: int, bits: int) -> int:
    if bits and v & (1 << (bits - 1)):
        return v - (1 << bits)
    return v
