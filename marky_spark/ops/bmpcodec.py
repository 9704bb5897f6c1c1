"""Pure-stdlib BMP decoder — the second real image codec behind
ops/multimodal (after ops/pngcodec).

Uncompressed Windows BMP (BITMAPINFOHEADER or the V4/V5 extensions) needs
only ``struct`` + numpy row slicing: 24-bit BGR and 32-bit BGRX/BGRA,
bottom-up or top-down, 4-byte-aligned rows. That covers what office
documents actually embed (reference parity: docx.go:196-198 /
pptx.go:342-343 carry embedded images through as data URIs regardless of
format; BMP is the other format that appears there uncompressed).

``looks_like_bmp`` is deliberately strict — header size, plane count,
bit depth, compression and dimensions must all be plausible — because
:func:`marky_spark.ops.multimodal.auto_decode` sniffs arbitrary binary
payloads (including document text bytes that may happen to start with
"BM") and must never reroute a non-BMP blob away from the deterministic
fake path.
"""

from __future__ import annotations

import struct

from .pngcodec import MAX_PIXELS

_HEADER_SIZES = frozenset({40, 52, 56, 108, 124})  # BITMAPINFO/V2/V3/V4/V5


class BmpError(ValueError):
    """Malformed or unsupported BMP payload."""


def _parse_header(data: bytes) -> tuple[int, int, bool, int, int]:
    """→ (width, height, top_down, bytes_per_pixel, pixel_offset)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpError("not a BMP (bad signature)")
    px_offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size not in _HEADER_SIZES:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    w, h, planes, bpp, comp = struct.unpack_from("<iiHHI", data, 18)
    if planes != 1:
        raise BmpError(f"plane count {planes}, want 1")
    if comp != 0:  # BI_RGB only — no RLE/bitfields
        raise BmpError(f"unsupported compression {comp}")
    if bpp not in (24, 32):
        raise BmpError(f"unsupported bit depth {bpp} (24/32 only)")
    top_down = h < 0
    height = -h if top_down else h
    if w <= 0 or height <= 0:
        raise BmpError(f"bad dimensions {w}x{h}")
    if w * height > MAX_PIXELS:
        raise BmpError(
            f"image {w}x{height} exceeds the {MAX_PIXELS}-pixel cap")
    return w, height, top_down, bpp // 8, px_offset


def looks_like_bmp(data: bytes) -> bool:
    """Strict structural sniff (see module docstring)."""
    try:
        _parse_header(data)
        return True
    except BmpError:
        return False


def bmp_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """BMP bytes → (width, height, channels, raw interleaved 8-bit RGB(A)
    samples, rows top-down) — the same contract as ``png_decode``."""
    import numpy as np

    width, height, top_down, ch, px_offset = _parse_header(data)
    row_size = (width * ch + 3) & ~3  # rows pad to 4-byte boundaries
    need = px_offset + row_size * height
    if px_offset < 54 or len(data) < need:
        raise BmpError(
            f"truncated pixel data: {len(data)} bytes, want {need}")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_size * height, offset=px_offset
    ).reshape(height, row_size)[:, :width * ch].reshape(height, width, ch)
    if not top_down:
        rows = rows[::-1]
    # stored byte order is BGR / BGRA → emit RGB / RGBA
    rows = rows[:, :, ::-1] if ch == 3 else rows[:, :, [2, 1, 0, 3]]
    return width, height, ch, np.ascontiguousarray(rows).tobytes()


def bmp_encode(pixels: bytes, width: int, height: int,
               channels: int = 3) -> bytes:
    """Raw interleaved RGB(A) samples (rows top-down) → bottom-up BI_RGB
    BMP — the test-fixture inverse of :func:`bmp_decode`."""
    import numpy as np

    if channels not in (3, 4):
        raise BmpError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise BmpError(
            f"pixel buffer is {len(pixels)} bytes, "
            f"want {width * height * channels}")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels)
    arr = arr[:, :, ::-1] if channels == 3 else arr[:, :, [2, 1, 0, 3]]
    row_size = (width * channels + 3) & ~3
    padded = np.zeros((height, row_size), dtype=np.uint8)
    padded[:, :width * channels] = arr.reshape(height, width * channels)
    body = padded[::-1].tobytes()  # bottom-up
    return (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, channels * 8,
                      0, len(body), 2835, 2835, 0, 0)
        + body
    )
