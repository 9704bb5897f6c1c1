"""Real baseline-TIFF codec — pure stdlib + numpy, no imaging library.

The reference never decodes media (it base64s embedded bytes verbatim,
docx.go:196-198), so TIFF support is part of this repo's training-data
pipeline surface: scanned-document corpora — the core extraction
workload — ship as TIFF more than any other container. Implemented from
the public TIFF 6.0 layout:

- decode: II/MM byte order, IFD entry walk (inline vs offset values),
  8-bit AND 16-bit grayscale / RGB / RGBA (16-bit reduces to high bytes,
  the exact ``>> 8`` — scanner output is commonly 16-bit gray), chunky
  AND separate (planar = 2, strips plane-major) configurations, strip
  organization (RowsPerStrip + StripOffsets/StripByteCounts),
  compressions 1 (none), 32773 (PackBits) and 5 (TIFF LZW: MSB-first
  codes, 9→12-bit widths with the spec's early code-width change,
  CLEAR/EOI), horizontal predictor (tag 317 = 2, per-sample within each
  plane), strict bounds before any allocation.
- encode (fixture inverse): little-endian writer for the same pixel
  shapes with the same three compressions + optional predictor,
  multi-strip, 16-bit, and planar layouts — lossless both ways, which is
  what lets the driver oracle pin the decoder on SQL-reconstructible
  pixel streams exactly like PNG (ops/pngcodec) and FLAC (ops/flaccodec).

Same poison-pill contract as every other codec: hostile input raises
:class:`TiffError`, recognized-but-unimplemented shapes raise
:class:`TiffUnsupportedError` (a ``NotImplementedError`` →
``codec_unavailable`` rows).
"""
from __future__ import annotations

import struct

MAX_PIXELS = 1 << 26  # total samples (w*h*channels) a decode may allocate

TIFF_LITTLE = b"II*\x00"
TIFF_BIG = b"MM\x00*"


class TiffError(ValueError):
    """Malformed / hostile TIFF input (the poison-pill contract)."""


class TiffUnsupportedError(NotImplementedError):
    """Recognized TIFF whose shape this codec does not implement (16-bit,
    tiles, JPEG-in-TIFF, planar=2…) — surfaces as ``codec_unavailable``."""


def looks_like_tiff(data: bytes) -> bool:
    """Signature sniff: the classic II*\\0 / MM\\0* header."""
    return len(data) >= 8 and data[:4] in (TIFF_LITTLE, TIFF_BIG)


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}  # BYTE, ASCII, SHORT, LONG


def _read_ifd(data: bytes, order: str):
    """First IFD → {tag: [values...]} (BYTE/SHORT/LONG only; other entry
    types are skipped — none of the baseline tags use them)."""
    (ifd_off,) = struct.unpack_from(order + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise TiffError("IFD offset outside stream")
    (n_entries,) = struct.unpack_from(order + "H", data, ifd_off)
    if n_entries == 0:
        raise TiffError("empty IFD")
    if ifd_off + 2 + 12 * n_entries > len(data):
        raise TiffError("IFD overruns stream")
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack_from(order + "HHI", data, off)
        if typ not in _TYPE_SIZE or count == 0:
            continue
        size = _TYPE_SIZE[typ] * count
        if size > 4:
            (voff,) = struct.unpack_from(order + "I", data, off + 8)
            if voff + size > len(data):
                raise TiffError(f"tag {tag} values outside stream")
            raw = data[voff:voff + size]
        else:
            raw = data[off + 8:off + 8 + size]
        if typ in (1, 2):
            tags[tag] = list(raw)
        elif typ == 3:
            tags[tag] = list(struct.unpack(order + "H" * count, raw))
        else:
            tags[tag] = list(struct.unpack(order + "I" * count, raw))
    return tags


def _packbits_decode(src: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expect:
        n = src[i]
        i += 1
        if n < 128:      # literal run of n+1
            if i + n + 1 > len(src):
                raise TiffError("PackBits literal run overruns strip")
            out += src[i:i + n + 1]
            i += n + 1
        elif n > 128:    # repeat next byte 257-n times
            if i >= len(src):
                raise TiffError("PackBits repeat run overruns strip")
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) != expect:
        raise TiffError(
            f"PackBits strip decoded {len(out)} bytes, want {expect}")
    return bytes(out)


def _packbits_encode(src: bytes) -> bytes:
    """Simple spec-valid PackBits: runs of >= 3 equal bytes become repeat
    packets, everything else literal packets (max 128 each)."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        run = 1
        while i + run < n and run < 128 and src[i + run] == src[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, src[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 2 < n and src[i] == src[i + 1] == src[i + 2])):
            i += 1
        out += bytes([i - lit - 1]) + src[lit:i]
    return bytes(out)


class _MsbReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.pos >= len(self.data):
                raise TiffError("LZW strip ran out of bits")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(src: bytes, expect: int) -> bytes:
    """TIFF-variant LZW: MSB-first code packing, 9→12-bit widths with the
    spec's EARLY code-width change (the width bumps when the next free
    slot is (1<<width)-1, one code sooner than GIF)."""
    br = _MsbReader(src)
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expect:
        code = br.read(width)
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            reset()
            continue
        if prev is None:
            if code >= 256:
                raise TiffError("LZW first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise TiffError(f"LZW code {code} beyond table")
        out += entry
        if len(out) > expect:
            raise TiffError("LZW strip exceeds declared size")
        if prev is not None:
            table.append(prev + entry[:1])
            # early change, one code EARLIER than the writer's own bump:
            # the writer has already assigned the entry for the code the
            # reader is about to process, so its count runs one ahead
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
        prev = entry
    if len(out) != expect:
        raise TiffError(f"LZW strip decoded {len(out)} bytes, want {expect}")
    return bytes(out)


def _lzw_encode(src: bytes) -> bytes:
    """TIFF-variant LZW writer (the fixture inverse of :func:`_lzw_decode`)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(_LZW_CLEAR, width)
    run = b""
    for b in src:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1  # early change, mirrored in the decoder
        if nxt == 4094:
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(_LZW_EOI, width)
    if nbits:
        emit(0, 8 - nbits)
    return bytes(out)


def tiff_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """TIFF bytes → ``(width, height, channels, pixels)`` with pixels the
    raw 8-bit chunky sample stream — the same convention as png_decode."""
    import numpy as np

    if not looks_like_tiff(data):
        raise TiffError("not a TIFF (no II*/MM* header)")
    order = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, order)
    try:
        width = tags[256][0]
        height = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as exc:
        raise TiffError(f"missing required TIFF tag {exc}") from None
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * spp)
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    rows_per_strip = tags.get(278, [height])[0] or height
    planar = tags.get(284, [1])[0]
    predictor = tags.get(317, [1])[0]

    if compression == 6 or compression == 7:
        raise TiffUnsupportedError("JPEG-in-TIFF not implemented")
    if compression not in (1, 5, 32773):
        raise TiffError(f"unknown TIFF compression {compression}")
    if 322 in tags or 324 in tags:
        raise TiffUnsupportedError("tiled TIFF not implemented")
    if planar not in (1, 2):
        raise TiffError(f"unknown planar config {planar}")
    if spp not in (1, 3, 4):
        raise TiffUnsupportedError(f"{spp} samples/pixel not implemented")
    if len(bits) < spp:
        raise TiffError(f"BitsPerSample has {len(bits)} entries for "
                        f"{spp} samples/pixel")
    if all(b == 8 for b in bits[:spp]):
        bps = 1
    elif all(b == 16 for b in bits[:spp]):
        bps = 2  # scanned-document scanners commonly emit 16-bit gray
    else:
        raise TiffUnsupportedError(f"bit depths {bits} not implemented")
    if photometric not in (1, 2):
        raise TiffUnsupportedError(
            f"photometric {photometric} not implemented")
    if predictor not in (1, 2):
        raise TiffError(f"unknown predictor {predictor}")
    if width < 1 or height < 1:
        raise TiffError(f"bad dimensions {width}x{height}")
    if width * height * spp > MAX_PIXELS:
        raise TiffError(f"{width}x{height}x{spp} exceeds pixel cap")
    if len(offsets) != len(counts):
        raise TiffError("StripOffsets/StripByteCounts length mismatch")
    strips_per_plane = -(-height // rows_per_strip)
    n_strips = strips_per_plane * (spp if planar == 2 else 1)
    if len(offsets) != n_strips:
        raise TiffError(
            f"{len(offsets)} strips for {height} rows at {rows_per_strip} "
            f"rows/strip (want {n_strips})")

    # planar=2: one sample per pixel per plane, strips grouped plane-major
    row_bytes = width * (1 if planar == 2 else spp) * bps
    out = bytearray()
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data) or cnt < 0:
            raise TiffError(f"strip {s} outside stream")
        s_in = s % strips_per_plane
        rows = min(rows_per_strip, height - s_in * rows_per_strip)
        expect = rows * row_bytes
        raw = data[off:off + cnt]
        if compression == 1:
            if len(raw) != expect:
                raise TiffError(
                    f"strip {s} is {len(raw)} bytes, want {expect}")
            strip = raw
        elif compression == 32773:
            strip = _packbits_decode(raw, expect)
        else:
            strip = _lzw_decode(raw, expect)
        out += strip
    arr = np.frombuffer(bytes(out),
                        dtype=np.uint8 if bps == 1 else order + "u2")
    mask = (1 << (8 * bps)) - 1
    if planar == 2:
        grid = arr.reshape(spp, height, width).astype(np.int64)
        if predictor == 2:
            # horizontal differencing runs per SAMPLE within each plane
            grid = np.cumsum(grid, axis=2) & mask
        grid = np.transpose(grid, (1, 2, 0))
    else:
        grid = arr.reshape(height, width, spp).astype(np.int64)
        if predictor == 2:
            grid = np.cumsum(grid, axis=1) & mask
    if bps == 2:
        grid = grid >> 8  # the exact 16→8 reduction, same as png_decode
    return width, height, spp, grid.astype(np.uint8).tobytes()


def tiff_encode(pixels: bytes, width: int, height: int, channels: int = 3,
                compression: str = "lzw", predictor: int = 1,
                rows_per_strip: int | None = None, bits: int = 8,
                planar: int = 1) -> bytes:
    """Chunky samples → little-endian TIFF. Lossless for all three
    compressions ("none", "packbits", "lzw"), optional horizontal
    predictor, multi-strip when ``rows_per_strip`` < height; ``bits=16``
    takes little-endian u16 samples; ``planar=2`` writes separate sample
    planes (strips plane-major) — the decoder's adversarial inverse."""
    import numpy as np

    if channels not in (1, 3, 4):
        raise TiffError(f"unsupported channel count {channels}")
    if bits not in (8, 16):
        raise TiffError(f"unsupported encode bit depth {bits}")
    if planar not in (1, 2):
        raise TiffError(f"unknown planar config {planar}")
    bps = bits // 8
    if width < 1 or height < 1 or width * height * channels > MAX_PIXELS:
        raise TiffError(f"bad dimensions {width}x{height}")
    if len(pixels) != width * height * channels * bps:
        raise TiffError(
            f"pixel buffer is {len(pixels)} bytes, "
            f"want {width * height * channels * bps}")
    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_tag is None:
        raise TiffError(f"unknown compression {compression!r}")
    if predictor not in (1, 2):
        raise TiffError(f"unknown predictor {predictor}")
    rows_per_strip = rows_per_strip or height
    if not (1 <= rows_per_strip):
        raise TiffError("rows_per_strip must be positive")

    mask = (1 << bits) - 1
    sdtype = np.uint8 if bps == 1 else "<u2"
    grid = np.frombuffer(pixels, dtype=sdtype).reshape(
        height, width, channels).astype(np.int64)
    strips = []

    def compress_rows(plane_bytes: bytes) -> None:
        if comp_tag == 1:
            strips.append(plane_bytes)
        elif comp_tag == 32773:
            strips.append(_packbits_encode(plane_bytes))
        else:
            strips.append(_lzw_encode(plane_bytes))

    if planar == 2:
        planes = np.transpose(grid, (2, 0, 1))  # (ch, h, w)
        if predictor == 2:
            planes = planes.copy()
            planes[:, :, 1:] = (planes[:, :, 1:] - planes[:, :, :-1]) & mask
        for c in range(channels):
            plane = planes[c].astype(sdtype)
            for top in range(0, height, rows_per_strip):
                rows = min(rows_per_strip, height - top)
                compress_rows(plane[top:top + rows].tobytes())
    else:
        if predictor == 2:
            grid = grid.copy()
            grid[:, 1:, :] = (grid[:, 1:, :] - grid[:, :-1, :]) & mask
        flat = grid.astype(sdtype).reshape(height, width * channels)
        for top in range(0, height, rows_per_strip):
            rows = min(rows_per_strip, height - top)
            compress_rows(flat[top:top + rows].tobytes())

    entries = [
        (256, 4, [width]),
        (257, 4, [height]),
        (258, 3, [bits] * channels),
        (259, 3, [comp_tag]),
        (262, 3, [1 if channels == 1 else 2]),
        (273, 4, [0] * len(strips)),   # patched below
        (277, 3, [channels]),
        (278, 4, [rows_per_strip]),
        (279, 4, [len(s) for s in strips]),
    ]
    if predictor == 2:
        entries.append((317, 3, [predictor]))
    if planar == 2:
        entries.append((284, 3, [planar]))
    entries.sort(key=lambda e: e[0])

    header = b"II" + struct.pack("<HI", 42, 8)
    ifd_size = 2 + 12 * len(entries) + 4
    # layout: header(8) | IFD | overflow values | strips
    overflow = bytearray()
    overflow_base = 8 + ifd_size
    fixed = []
    for tag, typ, values in entries:
        size = _TYPE_SIZE[typ] * len(values)
        fixed.append([tag, typ, values, size])
    # first pass to size the overflow region so strip offsets are known
    ov = 0
    for tag, typ, values, size in fixed:
        if size > 4:
            ov += size
    strips_base = overflow_base + ov
    strip_offsets = []
    at = strips_base
    for s in strips:
        strip_offsets.append(at)
        at += len(s)
    for row in fixed:
        if row[0] == 273:
            row[2] = strip_offsets
    ifd = bytearray(struct.pack("<H", len(fixed)))
    for tag, typ, values, size in fixed:
        ifd += struct.pack("<HHI", tag, typ, len(values))
        pack = {1: "B", 3: "H", 4: "I"}[typ]
        if size > 4:
            ifd += struct.pack("<I", overflow_base + len(overflow))
            for v in values:
                overflow += struct.pack("<" + pack, v)
        else:
            cell = b"".join(struct.pack("<" + pack, v) for v in values)
            ifd += cell + b"\x00" * (4 - len(cell))
    ifd += struct.pack("<I", 0)  # no next IFD
    return header + bytes(ifd) + bytes(overflow) + b"".join(strips)
