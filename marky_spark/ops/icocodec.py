"""Windows ICO container (favicons) — pure stdlib + the in-repo codecs.

Favicons are among the most common image payloads in a web crawl; ICO is
a tiny directory over embedded images, each either a PNG stream (the
modern form) or a headerless BMP DIB whose height field covers the XOR
image plus the legacy 1-bit AND mask. Written from the public ICONDIR /
ICONDIRENTRY layout:

- 6-byte header: reserved 0, type 1 (icons; type 2 cursors are typed
  unsupported), count
- 16-byte entries: w, h (0 encodes 256), planes, bpp, payload size +
  offset

``ico_decode`` picks the LARGEST embedded image (what a pipeline wants
as the representative) and delegates: PNG payloads to ops/pngcodec,
uncompressed 24/32-bpp DIBs to ops/bmpcodec (with a synthesized
BITMAPFILEHEADER and the doubled height halved; the AND mask rows that
follow the XOR rows are ignored, as every modern renderer does for
32-bpp icons). Palettized or RLE DIBs raise
:class:`IcoUnsupportedError`; anything malformed raises
:class:`IcoError` (the poison-pill contract).

The writer is the fixture inverse: wraps PNG and/or DIB entries so
round-trip tests and mutation fuzz pin the directory walk.
"""
from __future__ import annotations

import struct

MAX_ENTRIES = 64


class IcoError(ValueError):
    """Malformed / hostile ICO input."""


class IcoUnsupportedError(NotImplementedError):
    """Recognized ICO whose payload shape this codec does not implement
    (cursors, palettized/RLE DIBs)."""


def looks_like_ico(data: bytes) -> bool:
    """The magic (00 00 01 00) is weak — ordinary binaries can open with
    it — so the WHOLE directory must validate before a payload takes the
    real path."""
    if len(data) < 22 or data[:4] != b"\x00\x00\x01\x00":
        return False
    (count,) = struct.unpack_from("<H", data, 4)
    if not 1 <= count <= MAX_ENTRIES or len(data) < 6 + 16 * count:
        return False
    for k in range(count):
        size, off = struct.unpack_from("<II", data, 6 + 16 * k + 8)
        if size < 8 or off < 6 + 16 * count or off + size > len(data):
            return False
    return True


def _entries(data: bytes) -> list[tuple[int, int, int, int]]:
    if len(data) < 6:
        raise IcoError("ICO shorter than its header")
    res, typ, count = struct.unpack_from("<HHH", data, 0)
    if res != 0 or typ not in (1, 2):
        raise IcoError("not an ICO (bad ICONDIR)")
    if typ == 2:
        raise IcoUnsupportedError("CUR cursor files not implemented")
    if not 1 <= count <= MAX_ENTRIES:
        raise IcoError(f"ICO with {count} entries")
    out = []
    for k in range(count):
        at = 6 + 16 * k
        if at + 16 > len(data):
            raise IcoError("ICONDIR entries overrun the file")
        w, h = data[at], data[at + 1]
        size, off = struct.unpack_from("<II", data, at + 8)
        if off + size > len(data) or size < 8:
            raise IcoError(f"entry {k} outside the file")
        out.append((w or 256, h or 256, size, off))
    return out


def ico_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """ICO bytes → the LARGEST embedded image as
    ``(width, height, channels, 8-bit samples)``."""
    from .bmpcodec import bmp_decode
    from .pngcodec import PNG_SIGNATURE, PngError, png_decode

    entries = _entries(data)
    w, h, size, off = max(entries, key=lambda e: e[0] * e[1])
    payload = data[off:off + size]
    if payload.startswith(PNG_SIGNATURE):
        try:
            return png_decode(payload)
        except PngError as exc:
            raise IcoError(f"bad embedded PNG: {exc}") from None
    # headerless DIB: BITMAPINFOHEADER with height = XOR + AND mask
    if len(payload) < 40:
        raise IcoError("DIB entry shorter than BITMAPINFOHEADER")
    hdr_size, biw, bih = struct.unpack_from("<Iii", payload, 0)
    planes, bpp = struct.unpack_from("<HH", payload, 12)
    (compression,) = struct.unpack_from("<I", payload, 16)
    if hdr_size != 40:
        raise IcoUnsupportedError(f"DIB header size {hdr_size}")
    if compression != 0:
        raise IcoUnsupportedError(f"compressed DIB ({compression})")
    if bpp not in (24, 32):
        raise IcoUnsupportedError(f"{bpp}-bpp palettized DIB")
    if bih % 2 or bih // 2 < 1:
        raise IcoError(f"DIB height {bih} is not XOR+mask doubled")
    xor_h = bih // 2
    # synthesize the file header bmp_decode expects; halve the height
    dib = bytearray(payload)
    struct.pack_into("<i", dib, 8, xor_h)
    fake = (b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0, 14 + hdr_size)
            + bytes(dib))
    try:
        return bmp_decode(fake)
    except ValueError as exc:
        raise IcoError(f"bad embedded DIB: {exc}") from None


def ico_encode(images: list[tuple[bytes, int, int, int, str]]) -> bytes:
    """Fixture inverse: ``[(pixels, w, h, channels, 'png'|'dib')]`` →
    ICO. DIB entries are written 32-bpp BGRA with an all-zero AND mask
    (alpha carries transparency, the modern convention)."""
    from .bmpcodec import bmp_encode
    from .pngcodec import png_encode

    if not 1 <= len(images) <= MAX_ENTRIES:
        raise IcoError("ICO needs 1..64 images")
    payloads = []
    for px, w, h, ch, kind in images:
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise IcoError(f"icon dimensions {w}x{h} out of range")
        if kind == "png":
            payloads.append((w, h, 32, png_encode(px, w, h, ch)))
        elif kind == "dib":
            bmp = bmp_encode(px, w, h, ch)
            dib = bytearray(bmp[14:])
            struct.pack_into("<i", dib, 8, 2 * h)  # XOR + AND height
            mask_row = (w + 31) // 32 * 4
            body = bytes(dib) + b"\x00" * (mask_row * h)
            payloads.append((w, h, 8 * (4 if ch == 4 else 3), body))
        else:
            raise IcoError(f"unknown entry kind {kind!r}")
    out = bytearray(struct.pack("<HHH", 0, 1, len(payloads)))
    off = 6 + 16 * len(payloads)
    for w, h, bpp, body in payloads:
        out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, bpp,
                           len(body), off)
        off += len(body)
    for _, _, _, body in payloads:
        out += body
    return bytes(out)
