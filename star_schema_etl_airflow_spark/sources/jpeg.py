"""Pure-Python baseline JPEG codec (stdlib + numpy).

Closes the documented codec gap in ``sources/multimodal.py``: the
sandbox has no native image libraries, so JPEG support is implemented
from the ITU-T T.81 spec directly —

- **decoder** (:func:`jpeg_decode`): baseline sequential DCT
  (SOF0/SOF1), Huffman entropy coding, 8-bit samples, grayscale and
  YCbCr with any of the common sampling factors (4:4:4, 4:2:2, 4:2:0,
  4:4:0), DRI/RSTn restart markers, FF00 byte unstuffing, Annex-A
  dequantize → zigzag → separable IDCT → level shift → chroma upsample
  → YCbCr→RGB.  Progressive (SOF2), arithmetic coding, 12-bit, and
  hierarchical modes raise ``NotImplementedError`` — explicit, never
  silent.
- **encoder** (:func:`jpeg_encode`): baseline sequential, Annex-K
  quantization tables scaled by the libjpeg quality formula, Annex-K
  Huffman tables, 4:4:4 or grayscale (and 4:2:0 via ``subsample``),
  used by the round-trip tests and by the differential fixtures that
  feed the decoder payloads built by an *independent* writer.

Everything is deterministic: the DCT is float64 with a fixed separable
basis, quantization is ``round half away from zero`` per the spec, and
the entropy coder is canonical Huffman — byte-identical output across
runs and platforms.

Used by ``decode_media``/``decode_stats``/``resize_image`` inside
Arrow-batched ``mapInPandas`` kernels; per-image Python cost is the
same class as the PNG unfilter loop and is the swap-in point for
libjpeg-turbo at deployment.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants --------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)

# ITU-T T.81 Annex K.1 — luminance / chrominance quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
     0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
     0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
     0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
     0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
     0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
     0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
     0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
     0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])

# separable DCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
# spatial = A.T @ coeff @ A   and   coeff = A @ spatial @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = (_c / 2) * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


# --- Huffman ----------------------------------------------------------------


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman: map (length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman: map symbol -> (code, length)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over an entropy-coded segment with FF00
    unstuffing; stops at any marker (FFxx, xx != 00) and records it."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("read past marker in entropy-coded segment")
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                raise ValueError("marker inside entropy-coded segment")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker (restart interval)."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        got = self.data[self.pos + 1]
        if got != 0xD0 + (n % 8):
            raise ValueError(f"restart marker mismatch: {got:#x}")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map magnitude bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder ----------------------------------------------------------------


def jpeg_decode(payload: bytes) -> dict:
    """Decode a baseline JPEG to 8-bit pixels.

    Returns ``{"kind": "image", "width", "height", "channels", "pixels"}``
    with ``pixels`` row-major interleaved bytes (grayscale or RGB) —
    the same contract as ``multimodal._png_decode``.  Malformed or
    truncated streams raise ``ValueError`` (the decode_stats error
    contract); unsupported-but-valid JPEG modes raise
    ``NotImplementedError``."""
    try:
        return _jpeg_decode(payload)
    except (IndexError, struct.error, KeyError, OverflowError,
            StopIteration, ZeroDivisionError) as exc:
        # found by fuzzing valid streams with random corruption: a
        # flipped table id leaks KeyError, a corrupted length field
        # leaks OverflowError, an exhausted entropy segment leaks
        # StopIteration — all must become the ValueError row contract
        raise ValueError(
            f"malformed JPEG stream: {type(exc).__name__}: {exc}"
        ) from exc


def _jpeg_decode(payload: bytes) -> dict:
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7):
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:                       # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[o:o + 64], dtype=np.uint8)
                    o += 64
                else:
                    tbl = np.frombuffer(seg[o:o + 128], dtype=">u2")
                    o += 128
                qt[tq] = tbl.astype(np.int32)
        elif marker == 0xC4:                     # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1:o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17:o + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _build_decode_table(bits, vals)
                o += 17 + nv
        elif marker in (0xC0, 0xC1):             # SOF0/SOF1 baseline
            precision, height, width, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise NotImplementedError(
                    f"JPEG precision {precision} unsupported (8-bit only)")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"width": width, "height": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker {marker:#x} unsupported "
                "(baseline sequential Huffman only)")
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                     # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not huff_dc and not huff_ac:
                # MJPEG frames may omit DHT (OpenDML convention):
                # install the Annex K.3 typical tables as players do
                huff_dc[0] = _build_decode_table(*HT_DC_LUMA)
                huff_dc[1] = _build_decode_table(*HT_DC_CHROMA)
                huff_ac[0] = _build_decode_table(*HT_AC_LUMA)
                huff_ac[1] = _build_decode_table(*HT_AC_CHROMA)
            ns = seg[0]
            if ns < len(frame["comps"]):
                # legal per T.81 (one SOS per component) but this decoder
                # handles a single interleaved scan only — fail loudly
                # rather than return the first component as grayscale
                raise NotImplementedError(
                    "non-interleaved multi-scan JPEG unsupported "
                    f"(scan has {ns} of {len(frame['comps'])} components)")
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tt >> 4, "ta": tt & 0x0F})
            data_pos = pos + 2 + seglen
            return _decode_scan(payload, data_pos, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += 2 + seglen
    raise ValueError("JPEG missing SOS scan")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval) -> dict:
    width, height = frame["width"], frame["height"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = []
    for c in scan:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(data, pos)
    pred = [0] * len(scan)
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_idx = my * mcux + mx
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                reader.align_and_expect_rst(n_rst)
                n_rst += 1
                pred = [0] * len(scan)
            for ci, c in enumerate(scan):
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        t = reader.decode_huff(huff_dc[c["td"]])
                        diff = _extend(reader.receive(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(huff_ac[c["ta"]])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16            # ZRL
                                    continue
                                break                  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coeffs[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coeffs * q
                        spatial = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
    out_planes = []
    for ci, c in enumerate(scan):
        p = np.clip(np.round(planes[ci]), 0, 255)
        # upsample to full resolution by sample replication
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        out_planes.append(p[:height, :width])
    if len(out_planes) == 1:
        pix = out_planes[0].astype(np.uint8)
        return {"kind": "image", "width": width, "height": height,
                "channels": 1, "pixels": pix.tobytes()}
    if len(out_planes) != 3:
        raise NotImplementedError(
            f"{len(out_planes)}-component JPEG unsupported (1 or 3 only)")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)
    return {"kind": "image", "width": width, "height": height,
            "channels": 3, "pixels": rgb.astype(np.uint8).tobytes()}


# --- encoder ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)          # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)    # 1-pad to byte boundary


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of an Annex-K table."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q * s + 50) // 100
    return np.clip(t, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude bits) per T.81 F.1.2.1."""
    t = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def _encode_block(w: _BitWriter, coeffs: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    dc = int(coeffs[0])
    t, bits = _magnitude(dc - pred)
    code, length = dc_tab[t]
    w.write(code, length)
    if t:
        w.write(bits, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coeffs[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]        # ZRL
            w.write(code, length)
            run -= 16
        s, bits = _magnitude(v)
        code, length = ac_tab[(run << 4) | s]
        w.write(code, length)
        w.write(bits, s)
        run = 0
    if last_nz != 63:
        code, length = ac_tab[0x00]            # EOB
        w.write(code, length)
    return dc


def jpeg_encode(pixels: bytes, width: int, height: int,
                channels: int = 3, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode 8-bit pixels (grayscale or interleaved RGB) as baseline
    JPEG.  ``subsample=True`` emits 4:2:0 chroma (2×2 box-filtered);
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (the error-resilience feature real encoders use for
    parallel decode)."""
    if channels not in (1, 3):
        raise NotImplementedError("grayscale or RGB input only")
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    arr = arr.reshape(height, width, channels)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    else:
        comps = [arr[..., 0]]
        subsample = False

    qy = _quality_scale(QT_LUMA, quality)
    qc = _quality_scale(QT_CHROMA, quality)
    samp = [(2, 2), (1, 1), (1, 1)] if subsample else \
        [(1, 1)] * len(comps)
    hmax = max(h for h, _ in samp[:len(comps)])
    vmax = max(v for _, v in samp[:len(comps)])
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    # per-component padded planes at their own resolution
    planes = []
    for ci, comp in enumerate(comps):
        h, v = samp[ci]
        if (h, v) != (hmax, vmax):
            fy, fx = vmax // v, hmax // h
            ph, pw = comp.shape
            ty, tx = -(-ph // fy) * fy, -(-pw // fx) * fx
            padded = np.pad(comp, ((0, ty - ph), (0, tx - pw)),
                            mode="edge")
            comp = padded.reshape(ty // fy, fy, tx // fx, fx).mean(
                axis=(1, 3))
        pw_t, ph_t = mcux * 8 * h, mcuy * 8 * v
        ch, cw = comp.shape
        planes.append(np.pad(comp, ((0, ph_t - ch), (0, pw_t - cw)),
                             mode="edge"))

    dc_y = _build_encode_table(*HT_DC_LUMA)
    ac_y = _build_encode_table(*HT_AC_LUMA)
    dc_c = _build_encode_table(*HT_DC_CHROMA)
    ac_c = _build_encode_table(*HT_AC_CHROMA)

    w = _BitWriter()
    pred = [0] * len(comps)
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_idx = my * mcux + mx
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
                n_rst += 1
                pred = [0] * len(comps)
            for ci in range(len(comps)):
                h, v = samp[ci]
                q = qy if ci == 0 else qc
                dct, act = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
                for by in range(v):
                    for bx in range(h):
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        block = planes[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                        coeff = _fdct2(block)
                        # round half away from zero, spec-style
                        zq = coeff.reshape(64)[ZIGZAG] / q[ZIGZAG]
                        zz = np.sign(zq) * np.floor(np.abs(zq) + 0.5)
                        pred[ci] = _encode_block(
                            w, zz.astype(np.int64), pred[ci], dct, act)
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(int(tbl[z]) for z in ZIGZAG))

    def dht(tc: int, th: int, tab: tuple) -> bytes:
        bits, vals = tab
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))

    ncomp = len(comps)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        h, v = samp[ci]
        tq = 0 if ci == 0 else 1
        sof += bytes([ci + 1, (h << 4) | v, tq])
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])                   # Ss, Se, Ah/Al (baseline)

    out = bytearray(b"\xff\xd8")               # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qy)
    if ncomp == 3:
        out += dqt(1, qc)
    out += seg(0xC0, sof)
    out += dht(0, 0, HT_DC_LUMA)
    out += dht(1, 0, HT_AC_LUMA)
    if ncomp == 3:
        out += dht(0, 1, HT_DC_CHROMA)
        out += dht(1, 1, HT_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, sos)
    out += w.out
    out += b"\xff\xd9"                         # EOI
    return bytes(out)
