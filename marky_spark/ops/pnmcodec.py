"""Real Netpbm codec (binary PBM/PGM/PPM — P4/P5/P6) — pure stdlib.

The reference never decodes media (docx.go:196-198 base64s bytes
verbatim); Netpbm is part of this repo's training-data pipeline surface:
it is the classic interchange format OCR and scanned-page tooling emits
(pgm/ppm dumps), and its one-screenful spec makes it the cheapest real
codec in the set — header ``P4|P5|P6`` + whitespace/comment-separated
width/height(/maxval), then raw samples (P4: row-padded 1-bit packed,
P5: 8-bit gray, P6: 8-bit RGB).

Scope: all six variants — binary P4/P5/P6 and ASCII P1/P2/P3 — at any
spec-legal maxval (1..65535; above 255 the binary rasters carry 2-byte
big-endian samples per the spec, ASCII samples just grow digits).
Samples rescale to the full 8-bit lattice (round-half-up, maxval =
full intensity), keeping the cross-codec convention that two encodings
of the same image embed identically. Anything malformed raises
:class:`PnmError` (the poison-pill contract). Allocation bounds are
checked before the pixel read.
"""
from __future__ import annotations

MAX_PIXELS = 1 << 26

PNM_BINARY = (b"P4", b"P5", b"P6")
PNM_ASCII = (b"P1", b"P2", b"P3")


class PnmError(ValueError):
    """Malformed / hostile Netpbm input."""


class PnmUnsupportedError(NotImplementedError):
    """Recognized Netpbm shape this codec does not implement."""


def looks_like_pnm(data: bytes) -> bool:
    """Structure sniff: the magic alone is two ASCII characters, which
    ordinary text can open with ("P5 is..."), so the WHOLE header must
    parse — magic, whitespace/comments, decimal dims (and maxval), and
    the terminating whitespace — before a payload takes the real path
    (both binary and ASCII variants decode for real when header-valid)."""
    if len(data) < 3 or data[:2] not in PNM_BINARY + PNM_ASCII \
            or data[2:3] not in b" \t\r\n#":
        return False
    try:
        _header_ints(data, 2, 2 if data[:2] in (b"P1", b"P4") else 3)
    except PnmError:
        return False
    return True


def _header_ints(data: bytes, start: int, count: int) -> tuple[list[int], int]:
    """Read `count` whitespace/comment-separated decimal fields."""
    vals: list[int] = []
    i = start
    n = len(data)
    while len(vals) < count:
        while i < n and data[i:i + 1] in b" \t\r\n":
            i += 1
        if i < n and data[i] == 0x23:  # '#' comment to end of line
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and 0x30 <= data[j] <= 0x39:
            j += 1
        if j == i:
            raise PnmError("bad Netpbm header field")
        if j - i > 9:
            raise PnmError("Netpbm header field absurdly long")
        vals.append(int(data[i:j]))
        i = j
    if i >= n or data[i:i + 1] not in b" \t\r\n":
        raise PnmError("Netpbm header not terminated by whitespace")
    return vals, i + 1  # single whitespace separates header from raster


def _decode_ascii(data: bytes, magic: bytes) -> tuple[int, int, int, bytes]:
    """P1/P2/P3 (ASCII) decode: whitespace/comment-separated decimal
    samples. P1 uses the same white-is-zero convention as P4 (and its
    digits may be unseparated, per the spec)."""
    if magic == b"P1":
        (w, h), at = _header_ints(data, 2, 2)
        maxval, channels = 1, 1
    else:
        (w, h, maxval), at = _header_ints(data, 2, 3)
        channels = 1 if magic == b"P2" else 3
        if not 1 <= maxval <= 65535:
            raise PnmError(f"bad maxval {maxval}")
    if w < 1 or h < 1 or w * h * channels > MAX_PIXELS:
        raise PnmError(f"bad dimensions {w}x{h}")
    need = w * h * channels
    # a plain int list: 16-bit maxvals put samples beyond a bytearray
    out = [0] * need
    got = 0
    i = at - 1  # the header terminator is ordinary whitespace here
    n = len(data)
    while got < need:
        while i < n and data[i:i + 1] in b" \t\r\n":
            i += 1
        if i < n and data[i] == 0x23:
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        if i >= n:
            raise PnmError(f"ASCII raster has {got} samples, want {need}")
        if magic == b"P1":
            c = data[i]
            if c not in (0x30, 0x31):
                raise PnmError(f"bad P1 digit {chr(c)!r}")
            out[got] = 255 if c == 0x30 else 0  # white-is-zero
            got += 1
            i += 1
            continue
        j = i
        while j < n and 0x30 <= data[j] <= 0x39:
            j += 1
        if j == i or j - i > (5 if maxval > 255 else 3):
            raise PnmError("bad ASCII sample")
        v = int(data[i:j])
        if v > maxval:
            raise PnmError(f"sample {v} exceeds maxval {maxval}")
        out[got] = v
        got += 1
        i = j
    if magic != b"P1" and maxval != 255:
        return w, h, channels, _rescale(out, maxval)
    return w, h, channels, bytes(bytearray(out))


def _rescale(samples, maxval: int) -> bytes:
    """Samples on a [0, maxval] lattice → full 8-bit scale, the spec's
    'maxval is full intensity' semantics (round-half-up so maxval maps to
    exactly 255 and 0 to 0) — keeps the cross-codec convention that two
    encodings of the same image embed identically. ``samples`` is any
    int sequence / numpy array (bytes for the 8-bit binary path)."""
    import numpy as np

    arr = np.frombuffer(samples, dtype=np.uint8).astype(np.uint32) \
        if isinstance(samples, (bytes, bytearray)) \
        else np.asarray(samples, dtype=np.uint32)
    return ((arr * 255 + maxval // 2) // maxval).astype(np.uint8).tobytes()


def pnm_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """PNM bytes → ``(width, height, channels, pixels)`` — 8-bit chunky
    samples, P4 bits expanded to 0/255 gray (white-is-zero per spec)."""
    if not looks_like_pnm(data):
        raise PnmError("not a Netpbm file (no P4/P5/P6 magic)")
    magic = data[:2]
    if magic in PNM_ASCII:
        return _decode_ascii(data, magic)
    if magic == b"P4":
        (w, h), at = _header_ints(data, 2, 2)
        maxval, channels = 1, 1
    else:
        (w, h, maxval), at = _header_ints(data, 2, 3)
        channels = 1 if magic == b"P5" else 3
        if not 1 <= maxval <= 65535:
            raise PnmError(f"bad maxval {maxval}")
    if w < 1 or h < 1 or w * h * channels > MAX_PIXELS:
        raise PnmError(f"bad dimensions {w}x{h}")
    if magic == b"P4":
        row_bytes = (w + 7) // 8
        need = row_bytes * h
        raster = data[at:at + need]
        if len(raster) != need:
            raise PnmError(f"raster is {len(raster)} bytes, want {need}")
        import numpy as np

        bits = np.unpackbits(
            np.frombuffer(raster, dtype=np.uint8).reshape(h, row_bytes),
            axis=1)[:, :w]
        # 1 bit = black per spec → 0; 0 bit = white → 255
        return w, h, 1, ((1 - bits) * np.uint8(255)).astype(
            np.uint8).tobytes()
    sample_bytes = 2 if maxval > 255 else 1
    need = w * h * channels * sample_bytes
    raster = data[at:at + need]
    if len(raster) != need:
        raise PnmError(f"raster is {len(raster)} bytes, want {need}")
    if maxval == 255:
        return w, h, channels, raster
    import numpy as np

    # spec: 2-byte samples are big-endian ("most significant byte first")
    arr = np.frombuffer(raster, dtype=">u2" if sample_bytes == 2
                        else np.uint8)
    if int(arr.max(initial=0)) > maxval:
        raise PnmError(
            f"binary sample {int(arr.max())} exceeds maxval {maxval}")
    return w, h, channels, _rescale(arr, maxval)


def pnm_encode(pixels: bytes, width: int, height: int,
               channels: int = 3, maxval: int = 255) -> bytes:
    """8-bit chunky samples → binary PGM (1 channel) / PPM (3 channels).

    ``maxval`` other than 255 spreads each 8-bit sample onto the wider
    lattice (round-half-up v*maxval/255 — the exact inverse of decode's
    rescale for every maxval >= 255, so 16-bit round trips are lossless);
    above 255 the raster is written as 2-byte big-endian per the spec."""
    if channels not in (1, 3):
        raise PnmError(f"unsupported channel count {channels}")
    if not 1 <= maxval <= 65535:
        raise PnmError(f"bad maxval {maxval}")
    if width < 1 or height < 1 or width * height * channels > MAX_PIXELS:
        raise PnmError(f"bad dimensions {width}x{height}")
    if len(pixels) != width * height * channels:
        raise PnmError(
            f"pixel buffer is {len(pixels)} bytes, "
            f"want {width * height * channels}")
    magic = b"P5" if channels == 1 else b"P6"
    head = magic + f"\n{width} {height}\n{maxval}\n".encode("ascii")
    if maxval == 255:
        return head + pixels
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.uint32)
    wide = (arr * maxval + 127) // 255
    dtype = ">u2" if maxval > 255 else np.uint8
    return head + wide.astype(dtype).tobytes()
