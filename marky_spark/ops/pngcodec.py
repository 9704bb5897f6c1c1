"""Pure-stdlib PNG codec (RFC 2083 / W3C PNG spec) — the real image codec
behind ops/multimodal.

The sandbox has no PIL/ffmpeg, but PNG needs only ``zlib`` + ``struct``:
chunk framing with CRC-32, IHDR/PLTE/IDAT/IEND, DEFLATE-compressed
scanlines, and the five per-row filters (None/Sub/Up/Average/Paeth).
This module implements both directions:

- :func:`png_decode` — signature + chunk walk (CRC-verified), concatenated
  IDAT inflate, filter reconstruction, palette expansion. Supports bit
  depth 8, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA), non-interlaced — the overwhelming majority of real-world PNGs
  (reference parity: docx.go:196-198 / pptx.go:342-343 embed exactly such
  image payloads as data URIs).
- :func:`png_encode` — the inverse, used by fixtures and the resize path;
  per-row filter types cycle 0..4 so a decoder must implement every filter
  to round-trip (a filter bug cannot hide behind an all-None encoder).
- :func:`png_resize_nearest` — decode → nearest-neighbor resample
  (vectorized numpy index select) → re-encode.

Scale note: these run per-blob inside Arrow-batched ``mapInPandas``
stages (ops/multimodal) — zlib is C-speed, and the per-row filter math is
numpy-vectorized across each scanline.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_COLOR_TYPE_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


class PngError(ValueError):
    """Malformed or unsupported PNG payload."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_encode(pixels: bytes, width: int, height: int,
               channels: int = 3) -> bytes:
    """Raw interleaved 8-bit samples → PNG bytes.

    Filter types cycle ``row % 5`` (None, Sub, Up, Average, Paeth): every
    decoder filter path is exercised by any image ≥ 5 rows, so an encoder/
    decoder pair cannot round-trip unless the filters are implemented
    correctly in both directions.
    """
    if channels not in _COLOR_TYPE_FOR_CHANNELS:
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError(
            f"pixel buffer is {len(pixels)} bytes, want {stride * height}")
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)
    zero = np.zeros(stride, dtype=np.uint8)
    out = bytearray()
    prev = zero
    for y in range(height):
        row = arr[y]
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub: left neighbor (same-pixel offset = channels)
            left = np.concatenate([zero[:channels], row[:-channels]])
            filt = (row.astype(np.int16) - left) % 256
        elif ft == 2:  # Up
            filt = (row.astype(np.int16) - prev) % 256
        elif ft == 3:  # Average
            left = np.concatenate([zero[:channels], row[:-channels]])
            filt = (row.astype(np.int16)
                    - (left.astype(np.int16) + prev.astype(np.int16)) // 2) % 256
        else:  # Paeth — scalar loop only here; rows are short
            left = np.concatenate([zero[:channels], row[:-channels]])
            upleft = np.concatenate([zero[:channels], prev[:-channels]])
            filt = np.empty(stride, dtype=np.int16)
            for i in range(stride):
                filt[i] = (int(row[i])
                           - _paeth(int(left[i]), int(prev[i]),
                                    int(upleft[i]))) % 256
        out.append(ft)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8,
                       _COLOR_TYPE_FOR_CHANNELS[channels], 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, width: int, height: int, bpp: int,
              stride: int) -> bytes:
    """Reverse the per-row filters. numpy-vectorized where the recurrence
    allows (None/Up fully; Sub/Average/Paeth carry a left-to-right
    dependency, walked per-sample on short rows)."""
    import numpy as np

    if len(raw) != (stride + 1) * height:
        raise PngError(
            f"decompressed stream is {len(raw)} bytes, want "
            f"{(stride + 1) * height}")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=pos + 1).astype(np.int16)
        pos += stride + 1
        if ft == 0:
            rec = row
        elif ft == 2:  # Up
            rec = (row + prev) % 256
        elif ft in (1, 3, 4):
            rec = row.copy()
            if ft == 1:  # Sub
                for i in range(bpp, stride):
                    rec[i] = (rec[i] + rec[i - bpp]) % 256
            elif ft == 3:  # Average
                for i in range(stride):
                    left = rec[i - bpp] if i >= bpp else 0
                    rec[i] = (rec[i] + (int(left) + int(prev[i])) // 2) % 256
            else:  # Paeth
                for i in range(stride):
                    left = int(rec[i - bpp]) if i >= bpp else 0
                    upleft = int(prev[i - bpp]) if i >= bpp else 0
                    rec[i] = (rec[i]
                              + _paeth(left, int(prev[i]), upleft)) % 256
        else:
            raise PngError(f"unknown filter type {ft} on row {y}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.tobytes()


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → (width, height, channels, raw interleaved 8-bit samples).

    Palette images (color type 3) are expanded to RGB, so ``channels``
    reports the *decoded* sample layout. CRCs are verified; truncated or
    corrupt streams raise :class:`PngError` (the multimodal operators turn
    that into a per-blob error row — poison-pill isolation, never a task
    failure).
    """
    if not data.startswith(PNG_SIGNATURE):
        raise PngError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    ihdr = None
    palette = b""
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise PngError(f"bad CRC on {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = body
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise PngError("missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if width <= 0 or height <= 0:
        raise PngError(f"bad dimensions {width}x{height}")
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace != 0:
        raise PngError("Adam7 interlace not supported")
    if depth != 8:
        raise PngError(f"bit depth {depth} not supported (8 only)")
    if color_type not in _CHANNELS:
        raise PngError(f"unknown color type {color_type}")
    channels = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise PngError(f"IDAT inflate failed: {exc}") from exc
    stride = width * channels
    pixels = _unfilter(raw, width, height, channels, stride)
    if color_type == 3:
        if not palette:
            raise PngError("palette image without PLTE")
        import numpy as np

        pal = np.frombuffer(palette, dtype=np.uint8)
        if len(pal) % 3:
            raise PngError("PLTE length not a multiple of 3")
        pal = pal.reshape(-1, 3)
        idx = np.frombuffer(pixels, dtype=np.uint8)
        if idx.max(initial=0) >= len(pal):
            raise PngError("palette index out of range")
        return width, height, 3, pal[idx].tobytes()
    return width, height, channels, pixels


def png_resize_nearest(data: bytes, out_w: int, out_h: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode.

    Source pixel for output (x, y) is (x*in_w//out_w, y*in_h//out_h) —
    integer arithmetic, so the mapping is reproducible bit-for-bit in the
    ANSI-SQL driver oracle.
    """
    import numpy as np

    in_w, in_h, channels, pixels = png_decode(data)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(in_h, in_w, channels)
    ys = np.arange(out_h) * in_h // out_h
    xs = np.arange(out_w) * in_w // out_w
    out = arr[ys][:, xs]
    return png_encode(out.tobytes(), out_w, out_h, channels)
