"""Pure-Python GIF decoder (stdlib only).

Companion to ``sources/jpeg.py``: GIF87a/GIF89a static images decoded
from the spec directly — logical screen descriptor, global/local color
tables, extension-block skipping, variable-width LZW decompression
(clear/EOI codes, table growth to 12 bits), interlace reordering, and
palette expansion to interleaved RGB.  Animated GIFs decode as their
first frame (the standard training-pipeline normalization).  Malformed
streams raise ``ValueError``; genuinely unsupported shapes raise
``NotImplementedError``.

The test/oracle side synthesizes payloads with an independent minimal
writer that emits the classic "uncompressed" LZW stream (every pixel as
its own code with CLEAR resets before table overflow) — decoder and
writer share nothing but the spec.

Used by ``multimodal.decode_media`` inside Arrow-batched
``mapInPandas``; per-image cost is the LZW loop, the deployment
swap-in point for PIL, plan-invisible like the other codecs.
"""

from __future__ import annotations

import struct

GIF_SIGS = (b"GIF87a", b"GIF89a")


def _color_table(data: bytes, pos: int, flag: int, size_bits: int):
    if not flag:
        return None, pos
    n = 2 << size_bits                     # 2^(size_bits+1) entries
    table = data[pos:pos + 3 * n]
    if len(table) != 3 * n:
        raise ValueError("truncated GIF color table")
    return table, pos + 3 * n


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos:pos + n]
        if pos + n > len(data):
            raise ValueError("truncated GIF sub-block")
        pos += n


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """Variable-width LZW per the GIF spec (LSB-first bit packing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = nbits = pos = 0

    def init_table():
        return {i: bytes([i]) for i in range(clear)}

    table = init_table()
    code_size = min_code_size + 1
    next_code = eoi + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                # streams may simply end after the last pixel
                return out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = init_table()
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("GIF LZW: first code not in table")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW: code out of sequence")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(payload: bytes) -> dict:
    """Decode a GIF to interleaved 8-bit RGB pixels (first frame).

    Same return contract as the PNG/JPEG decoders:
    ``{"kind": "image", "width", "height", "channels": 3, "pixels"}``."""
    if payload[:6] not in GIF_SIGS:
        raise NotImplementedError("not a GIF payload")
    try:
        return _gif_decode(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed GIF stream: {exc}") from exc


def _gif_decode(payload: bytes) -> dict:
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct, pos = _color_table(payload, pos, packed >> 7, packed & 0x07)
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x21:                              # extension: skip
            pos += 1                               # label
            _, pos = _sub_blocks(payload, pos)
        elif b == 0x2C:                            # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload,
                                                          pos)
            pos += 9
            lct, pos = _color_table(payload, pos, ipacked >> 7,
                                    ipacked & 0x07)
            palette = lct or gct
            if palette is None:
                raise ValueError("GIF image without a color table")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError(f"GIF LZW min code size {min_code}")
            stream, pos = _sub_blocks(payload, pos)
            idx = _lzw_decode(min_code, stream, w * h)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data underrun")
            if (ipacked >> 6) & 1:                 # interlaced
                ordered = bytearray(w * h)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, h, step):
                        ordered[y * w:(y + 1) * w] = idx[src:src + w]
                        src += w
                idx = ordered
            npal = len(palette) // 3
            out = bytearray(w * h * 3)
            for i in range(w * h):
                c = idx[i]
                if c >= npal:
                    raise ValueError("GIF pixel index outside palette")
                out[3 * i:3 * i + 3] = palette[3 * c:3 * c + 3]
            # first frame only; frame offsets are irrelevant for a
            # single full-frame image, the normal static-GIF case
            return {"kind": "image", "width": w, "height": h,
                    "channels": 3, "pixels": bytes(out)}
        elif b == 0x3B:                            # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block {b:#x}")
    raise ValueError("GIF missing image descriptor")


def gif_encode_indexed(indices: bytes, width: int, height: int,
                       palette: bytes, interlace: bool = False) -> bytes:
    """Minimal independent GIF89a writer: palette + per-pixel codes in
    the 'uncompressed' LZW form (CLEAR before the code table could
    outgrow the initial width, so code size never changes).  Test/oracle
    fixture generator — deliberately NOT the inverse of the decoder's
    LZW table logic."""
    npal = len(palette) // 3
    size_bits = 0
    while (2 << size_bits) < npal:
        size_bits += 1
    n_entries = 2 << size_bits
    pal = palette + b"\x00" * (3 * (n_entries - npal))
    min_code = max(2, size_bits + 1)
    clear = 1 << min_code
    code_size = min_code + 1

    acc = nbits = 0
    body = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            for y in range(start, height, step):
                rows.append(indices[y * width:(y + 1) * width])
        indices = b"".join(rows)

    emit(clear)
    # after CLEAR the decoder allocates codes from eoi+1; emitting
    # (2^code_size − eoi − 2) literals keeps every code inside the
    # initial width — reset just before growth
    budget = (1 << code_size) - clear - 2
    used = 0
    for px in indices:
        if used == budget:
            emit(clear)
            used = 0
        emit(px)
        used += 1
    emit(clear + 1)                                # EOI
    if nbits:
        body.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (size_bits & 0x07), 0, 0)
    out += pal
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height,
                                 0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(body), 255):
        chunk = body[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
