"""Pure-Python AVI (RIFF) container codec for MJPEG video.

Closes the "video decode" gap for the one video format that needs no
native codec library: Motion-JPEG in an AVI container (every frame is
a baseline JPEG, decoded by ``sources/jpeg.py``).  The container walk
is a straight implementation of the public RIFF/AVI layout (Microsoft
multimedia file formats documentation / OpenDML AVI spec):

    RIFF('AVI '
        LIST('hdrl'
            avih(<MainAVIHeader>)
            LIST('strl' strh(<AVIStreamHeader>) strf(<BITMAPINFOHEADER>)))
        LIST('movi' {'00dc'(<JPEG frame>)}*)
        ['idx1'(<index>)])

Like the WAV/PNG/JPEG/GIF codecs, encoder and decoder are independent
implementations (the encoder writes structs directly; the decoder
walks chunks), so a round-trip failure localizes a real bug.  MP3 and
non-MJPEG video remain explicit ``NotImplementedError`` swap-in points
for ffmpeg at deployment — see ``sources/multimodal.py``.

MJPEG per the OpenDML convention may omit Huffman tables from each
frame (players supply the Annex K.3 typical tables); ``jpeg_decode``
installs those defaults when a scan starts with no DHT seen
(``sources/jpeg.py``), so both table-carrying and table-less MJPEG
frames decode.

Scale shape: an AVI payload is one opaque ``binary`` cell; all decode
work runs inside Arrow-batched ``mapInPandas`` kernels
(``plans/video_queries.py``) — per-payload cost, no shuffle, identical
to the image/audio decode path.
"""

from __future__ import annotations

import struct

from star_schema_etl_airflow_spark.sources.jpeg import jpeg_decode, jpeg_encode

AVI_SIG_RIFF = b"RIFF"
AVI_SIG_TYPE = b"AVI "

_USEC = 1_000_000


def is_avi(payload: bytes) -> bool:
    return payload[:4] == AVI_SIG_RIFF and payload[8:12] == AVI_SIG_TYPE


# --- encoder ----------------------------------------------------------------


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def avi_encode_mjpeg(
    frames_rgb: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
    quality: int = 90,
) -> bytes:
    """RGB frames → MJPEG AVI.  Each frame is independently encoded by
    ``jpeg_encode`` (with its own tables — self-contained frames), then
    wrapped in the minimal spec-complete RIFF structure including the
    ``idx1`` index most tools expect."""
    if not frames_rgb:
        raise ValueError("AVI needs at least one frame")
    jpegs = [jpeg_encode(f, width, height, 3, quality=quality)
             for f in frames_rgb]
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        _USEC // fps,            # dwMicroSecPerFrame
        max_size * fps,          # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(jpegs),              # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_size,                # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<10I",
            0, 0, 0,             # dwFlags, wPriority|wLanguage, dwInitialFrames
            1,                   # dwScale
            fps,                 # dwRate (rate/scale = fps)
            0,                   # dwStart
            len(jpegs),          # dwLength (frames)
            max_size,            # dwSuggestedBufferSize
            0xFFFFFFFF,          # dwQuality (default)
            0,                   # dwSampleSize (0 = varying)
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40,                      # biSize
        width, height,
        1, 24,                   # biPlanes, biBitCount
        0x47504A4D,              # biCompression = 'MJPG'
        width * height * 3,      # biSizeImage (uncompressed bound)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = [_chunk(b"00dc", j) for j in jpegs]
    movi = _list(b"movi", b"".join(movi_chunks))
    # idx1: one entry per chunk; offsets are relative to the start of
    # the 'movi' list type fourcc (the common convention)
    idx_entries, off = [], 4
    for j in jpegs:
        idx_entries.append(
            b"00dc" + struct.pack("<3I", 0x10, off, len(j))  # AVIIF_KEYFRAME
        )
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = AVI_SIG_TYPE + hdrl + movi + idx1
    return AVI_SIG_RIFF + struct.pack("<I", len(body)) + body


# --- decoder ----------------------------------------------------------------


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, list_type|None, payload_start, payload_len)."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if fourcc == b"LIST":
            yield fourcc, data[pos + 8:pos + 12], pos + 12, size - 4
        else:
            yield fourcc, None, pos + 8, size
        pos += 8 + size + (size % 2)


def avi_decode(payload: bytes, frame_indices: list[int] | None = None) -> dict:
    """MJPEG AVI → ``{"kind": "video", width, height, n_frames, fps,
    frames: [{"frame_idx", "width", "height", "channels", "pixels"}]}``.

    ``frame_indices=None`` decodes every frame; pass a list to decode a
    subset (the frame-sampling path — undecoded frames cost only the
    container walk, the point at 100 TB where most frames are skipped).
    Raises ``ValueError`` on malformed containers and
    ``NotImplementedError`` for non-MJPEG codecs — decode errors become
    rows, never task failures (see ``decode_stats``)."""
    try:
        return _avi_decode(payload, frame_indices)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed AVI stream: {exc}") from exc


def _avi_decode(payload: bytes, frame_indices: list[int] | None) -> dict:
    if not is_avi(payload):
        raise NotImplementedError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(len(payload), 8 + riff_size)

    width = height = None
    fps = None
    handler = None
    frame_chunks: list[tuple[int, int]] = []

    for fourcc, ltype, start, size in _walk(payload, 12, end):
        if fourcc == b"LIST" and ltype == b"hdrl":
            for f2, l2, s2, z2 in _walk(payload, start, start + size):
                if f2 == b"avih":
                    hdr = struct.unpack("<14I", payload[s2:s2 + 56])
                    if hdr[0]:
                        fps = _USEC // hdr[0]
                    width, height = hdr[8], hdr[9]
                elif f2 == b"LIST" and l2 == b"strl":
                    for f3, _l3, s3, z3 in _walk(payload, s2, s2 + z2):
                        if f3 == b"strh":
                            if payload[s3:s3 + 4] == b"vids":
                                handler = payload[s3 + 4:s3 + 8]
                                scale, rate = struct.unpack(
                                    "<2I", payload[s3 + 20:s3 + 28])
                                if scale:
                                    fps = rate // scale
        elif fourcc == b"LIST" and ltype == b"movi":
            for f2, _l2, s2, z2 in _walk(payload, start, start + size):
                # '##dc' compressed / '##db' uncompressed video chunk
                if f2[2:4] in (b"dc", b"db"):
                    frame_chunks.append((s2, z2))

    if width is None:
        raise ValueError("AVI missing hdrl/avih header")
    if handler not in (b"MJPG", b"mjpg", b"dmb1"):
        raise NotImplementedError(
            f"AVI codec {handler!r} unsupported (MJPEG only; "
            "swap in ffmpeg at deployment)")
    if not frame_chunks:
        raise ValueError("AVI has no video frames in movi list")

    n = len(frame_chunks)
    want = range(n) if frame_indices is None else frame_indices
    frames = []
    for i in want:
        if not 0 <= i < n:
            raise ValueError(f"frame index {i} out of range [0, {n})")
        s, z = frame_chunks[i]
        img = jpeg_decode(payload[s:s + z])
        frames.append({
            "frame_idx": i,
            "width": img["width"],
            "height": img["height"],
            "channels": img["channels"],
            "pixels": img["pixels"],
        })
    return {
        "kind": "video",
        "width": width,
        "height": height,
        "n_frames": n,
        "fps": fps,
        "frames": frames,
    }


def avi_frame_bytes(payload: bytes, frame_idx: int) -> bytes:
    """The raw (still-compressed) JPEG bytes of one frame — the cheap
    sampling path: container walk only, no entropy decode."""
    if not is_avi(payload):
        raise NotImplementedError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(len(payload), 8 + riff_size)
    k = 0
    for fourcc, ltype, start, size in _walk(payload, 12, end):
        if fourcc == b"LIST" and ltype == b"movi":
            for f2, _l2, s2, z2 in _walk(payload, start, start + size):
                if f2[2:4] in (b"dc", b"db"):
                    if k == frame_idx:
                        return payload[s2:s2 + z2]
                    k += 1
    raise ValueError(f"frame index {frame_idx} out of range [0, {k})")
