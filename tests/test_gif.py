"""Pure-Python GIF decoder tests (sources/gif.py).

The decoder's LZW is exercised two ways: against the repo's independent
'uncompressed'-form writer (codes never grow — covers clear/EOI/reset),
and against a REAL LZW compressor implemented here in the test (table
growth through variable code widths up to the 12-bit cap — covers the
string-table path, including the code==next_code KwKwK case)."""

from __future__ import annotations

import struct

import pytest

from star_schema_etl_airflow_spark.sources.gif import (
    gif_decode,
    gif_encode_indexed,
)


def _lzw_compress(min_code: int, data: bytes) -> bytes:
    """Reference GIF-LZW compressor (spec-faithful, test-only)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _wrap_gif(width, height, palette, size_bits, min_code, stream,
              interlace=False) -> bytes:
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | size_bits, 0, 0)
    out += palette + b"\x00" * (3 * (2 << size_bits) - len(palette))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height,
                                 0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _expect_rgb(indices: bytes, palette: bytes) -> bytes:
    return b"".join(palette[3 * v:3 * v + 3] for v in indices)


def test_uncompressed_writer_roundtrip_exact():
    pal = bytes([10, 20, 30, 200, 100, 50])
    idx = bytes(((x + y) % 2) for y in range(7) for x in range(10))
    dec = gif_decode(gif_encode_indexed(idx, 10, 7, pal))
    assert (dec["width"], dec["height"], dec["channels"]) == (10, 7, 3)
    assert dec["pixels"] == _expect_rgb(idx, pal)


def test_real_lzw_with_table_growth_decodes_exact():
    # 4-color repetitive image compresses well: table grows through
    # several code widths, exercising the string-table branch
    pal = bytes(b for i in range(4) for b in (i * 60, i * 50, i * 40))
    w, h = 64, 48
    idx = bytes(((x // 4 + y // 4) % 4) for y in range(h) for x in range(w))
    stream = _lzw_compress(2, idx)
    assert len(stream) < len(idx) // 2, "compressor must actually compress"
    dec = gif_decode(_wrap_gif(w, h, pal, 1, 2, stream))
    assert dec["pixels"] == _expect_rgb(idx, pal)


def test_kwkwk_self_referencing_code():
    # 'aaaa...' forces the code==next_code (KwKwK) decoder branch early
    pal = bytes([5, 6, 7, 8, 9, 10])
    idx = bytes(40)
    dec = gif_decode(_wrap_gif(8, 5, pal, 0, 2, _lzw_compress(2, idx)))
    assert dec["pixels"] == _expect_rgb(idx, pal)


def test_interlaced_image_reorders_rows():
    pal = bytes(b for i in range(8) for b in (i * 30, 255 - i * 30, i * 10))
    w, h = 6, 16
    idx = bytes((y % 8) for y in range(h) for _ in range(w))
    plain = gif_decode(gif_encode_indexed(idx, w, h, pal))
    inter = gif_decode(gif_encode_indexed(idx, w, h, pal, interlace=True))
    assert inter["pixels"] == plain["pixels"] == _expect_rgb(idx, pal)


def test_extension_blocks_are_skipped():
    pal = bytes([1, 2, 3, 4, 5, 6])
    idx = bytes((i % 2) for i in range(12))
    enc = bytearray(gif_encode_indexed(idx, 4, 3, pal))
    # splice a Graphic Control Extension right before the image block
    at = bytes(enc).index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    enc[at:at] = gce
    dec = gif_decode(bytes(enc))
    assert dec["pixels"] == _expect_rgb(idx, pal)


def test_error_paths():
    with pytest.raises(NotImplementedError):
        gif_decode(b"NOTAGIF")
    enc = gif_encode_indexed(bytes(9), 3, 3, bytes([1, 2, 3]))
    with pytest.raises(ValueError):
        gif_decode(enc[:15])


def test_decode_media_dispatches_gif():
    from star_schema_etl_airflow_spark.sources.multimodal import decode_media

    pal = bytes([9, 8, 7, 6, 5, 4])
    idx = bytes((i % 2) for i in range(20))
    dec = decode_media(gif_encode_indexed(idx, 5, 4, pal), "image")
    assert dec["channels"] == 3 and dec["pixels"] == _expect_rgb(idx, pal)


def test_lzw_code_out_of_sequence_raises():
    """A code beyond next_code (not the KwKwK case) must raise the
    contract ValueError, not emit garbage pixels."""
    pal = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    # min_code 2: clear=4, eoi=5, first free code 6.  Emit CLEAR, a
    # literal, then code 7 (one PAST next_code=6, still inside the
    # 3-bit width) — out of sequence, not the KwKwK case.
    acc, nbits, out = 0, 0, bytearray()

    def emit(code, size):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(4, 3)
    emit(0, 3)
    emit(7, 3)
    if nbits:
        out.append(acc & 0xFF)
    with pytest.raises(ValueError, match="out of sequence|malformed"):
        gif_decode(_wrap_gif(4, 4, pal, 1, 2, bytes(out)))


def test_interlaced_truncation_sweep_never_leaks():
    """VERDICT r7 task 6: every truncation point of an interlaced GIF
    must either decode (when only trailing bytes are lost) or raise the
    ValueError/NotImplementedError contract — never IndexError/
    struct.error from the interlace reorder or the LZW bit reader."""
    pal = bytes(b for i in range(4) for b in (i * 70, i * 60, i * 50))
    w, h = 11, 17                      # odd sizes: uneven interlace passes
    idx = bytes(((x * 3 + y) % 4) for y in range(h) for x in range(w))
    full = gif_encode_indexed(idx, w, h, pal, interlace=True)
    ok = leaks = 0
    for cut in range(len(full)):
        try:
            gif_decode(full[:cut])
        except (ValueError, NotImplementedError):
            continue
        except Exception as exc:  # noqa: BLE001 — the assertion
            leaks += 1
            assert not leaks, f"cut={cut}: {type(exc).__name__}: {exc}"
        else:
            ok += 1
    # only the complete payload (and possibly trailer-less tails) decode
    assert ok <= 3


def test_interlaced_lzw_bitflip_sweep_never_leaks():
    """Single-byte corruption at every offset of a REAL-LZW interlaced
    stream: decode exactly, decode differently, or raise the contract
    error — never a low-level exception."""
    pal = bytes(b for i in range(4) for b in (i * 80, 255 - i * 40, i))
    w, h = 16, 16
    idx = bytes(((x // 2 + y // 2) % 4) for y in range(h) for x in range(w))
    full = bytearray(_wrap_gif(w, h, pal, 1, 2, _lzw_compress(2, idx),
                               interlace=True))
    for off in range(len(full)):
        b = bytearray(full)
        b[off] ^= 0xA5
        try:
            gif_decode(bytes(b))
        except (ValueError, NotImplementedError):
            pass
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(
                f"offset {off}: {type(exc).__name__}: {exc}") from exc
