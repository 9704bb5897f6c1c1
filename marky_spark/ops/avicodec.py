"""Minimal real AVI (RIFF) container codec for MJPEG video — pure stdlib.

The reference never decodes media (it base64s embedded bytes verbatim,
docx.go:196-198), so video support is part of this repo's training-data
pipeline surface: frame sampling over a 100 TB multimodal corpus needs
real container parsing, not byte slices. AVI is RIFF — the same chunk
grammar as WAV (ops/wavcodec) with nested LIST chunks — and MJPEG stores
each frame as a standalone baseline JPEG, which ops/jpegcodec already
decodes for real. Composing the two gives a real video path end-to-end:
container walk -> per-frame JPEG entropy decode.

Same contract as the other codecs: hostile input raises :class:`AviError`
(poison-pill — callers isolate it into error rows / fall back per blob),
and allocations are bounded before they happen. Scope: 'vids'/'MJPG'
streams; frame chunks are ``##dc``/``##db`` members of the ``movi`` LIST.
"""
from __future__ import annotations

import struct

MAX_FRAMES = 1 << 16
MAX_FRAME_BYTES = 1 << 26
MAX_DIM = 1 << 16


class AviError(ValueError):
    """Malformed / hostile AVI input (the poison-pill contract)."""


def looks_like_avi(data: bytes) -> bool:
    """Signature sniff: RIFF container carrying an 'AVI ' form."""
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _riff_chunks(data: bytes, pos: int, end: int):
    """Walk one level of a RIFF chunk stream yielding ``(id, body)`` —
    bodies validated against the declared size, word alignment honored
    (odd-sized chunks carry a pad byte)."""
    while pos + 8 <= end:
        cid, csz = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8:pos + 8 + csz]
        if len(body) < csz or pos + 8 + csz > end:
            raise AviError(
                f"chunk {cid!r} declares {csz} bytes, "
                f"{min(len(body), end - pos - 8)} present")
        yield cid, body
        pos += 8 + csz + (csz & 1)


def avi_decode_frames(data: bytes):
    """AVI bytes → ``(width, height, [jpeg_frame_bytes, ...])``.

    Walks the top-level RIFF stream for the ``hdrl`` LIST (whose ``avih``
    chunk carries the frame dimensions) and the ``movi`` LIST (whose
    ``##dc``/``##db`` members are the MJPEG frames, returned as standalone
    JPEG payloads for ops/jpegcodec to decode). Unknown chunks — ``idx1``,
    ``JUNK``, extra streams — are skipped, as a real demuxer must."""
    if not looks_like_avi(data):
        raise AviError("not an AVI (no RIFF/AVI signature)")
    width = height = None
    frames: list[bytes] | None = None
    for cid, body in _riff_chunks(data, 12, len(data)):
        if cid != b"LIST" or len(body) < 4:
            continue
        kind = body[:4]
        if kind == b"hdrl" and width is None:
            for sid, sbody in _riff_chunks(body, 4, len(body)):
                if sid == b"avih":
                    if len(sbody) < 40:
                        raise AviError(
                            f"avih chunk is {len(sbody)} bytes, want >= 40")
                    width, height = struct.unpack_from("<II", sbody, 32)
                    break
        elif kind == b"movi" and frames is None:
            frames = []
            for sid, sbody in _riff_chunks(body, 4, len(body)):
                if len(sid) == 4 and sid[2:4] in (b"dc", b"db") \
                        and sid[:2].isdigit():
                    if len(sbody) > MAX_FRAME_BYTES:
                        raise AviError(
                            f"frame of {len(sbody)} bytes exceeds cap")
                    if len(frames) >= MAX_FRAMES:
                        raise AviError(f"more than {MAX_FRAMES} frames")
                    frames.append(sbody)
    if width is None:
        raise AviError("no hdrl/avih header")
    if frames is None:
        raise AviError("no movi LIST")
    if not (1 <= width <= MAX_DIM and 1 <= height <= MAX_DIM):
        raise AviError(f"bad dimensions {width}x{height}")
    return width, height, frames


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def avi_encode(frames: list[bytes], width: int, height: int,
               fps: int = 10) -> bytes:
    """MJPEG frame payloads → a structurally valid minimal AVI: RIFF
    ('AVI ') with a ``hdrl`` LIST (``avih`` + a ``vids``/``MJPG`` ``strl``)
    and a ``movi`` LIST of ``00dc`` members. The fixture inverse of
    :func:`avi_decode_frames`."""
    if not frames:
        raise AviError("need at least one frame")
    if len(frames) > MAX_FRAMES:
        raise AviError(f"more than {MAX_FRAMES} frames")
    if not (1 <= width <= MAX_DIM and 1 <= height <= MAX_DIM):
        raise AviError(f"bad dimensions {width}x{height}")
    if not (1 <= fps <= 1000):
        raise AviError(f"bad fps {fps}")
    max_bytes = max(len(f) for f in frames)
    if max_bytes > MAX_FRAME_BYTES:
        raise AviError(f"frame of {max_bytes} bytes exceeds cap")
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,       # dwMicroSecPerFrame
        max_bytes * fps,        # dwMaxBytesPerSec
        0, 0,                   # dwPaddingGranularity, dwFlags
        len(frames),            # dwTotalFrames
        0, 1,                   # dwInitialFrames, dwStreams
        max_bytes,              # dwSuggestedBufferSize
        width, height,          # dwWidth, dwHeight
        0, 0, 0, 0)             # dwReserved[4]
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0,
        1, fps,                 # dwScale, dwRate
        0, len(frames), max_bytes, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height))
    strf = struct.pack(            # BITMAPINFOHEADER
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)
    hdrl = b"hdrl" + _chunk(b"avih", avih) + _chunk(
        b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf))
    movi = b"movi" + b"".join(_chunk(b"00dc", f) for f in frames)
    body = b"AVI " + _chunk(b"LIST", hdrl) + _chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body
