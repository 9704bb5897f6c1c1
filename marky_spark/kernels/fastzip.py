"""Minimal zip-member reader for OOXML/EPUB containers.

The four container kernels (docx/xlsx/pptx/epub) each open a zip per
document; stdlib ``zipfile.ZipFile.__init__`` parses the central directory in
pure Python (~100 µs/doc) and each ``read()`` re-walks a file-like object.
At corpus scale that overhead is a double-digit share of the kernel time, so
this module reads the central directory with ``struct`` directly and
decompresses members with raw ``zlib``.

Scope is deliberately conservative: stored (0) and deflate (8) members of a
non-zip64, non-encrypted, single-disk archive — exactly what OOXML/EPUB
writers produce. Anything else (zip64 magic, encryption flag, other
compression methods, missing EOCD) falls back to ``zipfile.ZipFile``, so
behavior on unusual archives is unchanged.
"""

from __future__ import annotations

import io
import struct
import zipfile
import zlib

_EOCD_SIG = b"PK\x05\x06"
_CDIR_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"

_EOCD = struct.Struct("<4s4H2LH")
_CDIR = struct.Struct("<4s6H3L5H2L")
_LOCAL = struct.Struct("<4s5H3L2H")


class BadZip(Exception):
    pass


class _StdlibZip:
    """zipfile-backed fallback with the same minimal API."""

    __slots__ = ("_zf",)

    def __init__(self, data: bytes):
        try:
            self._zf = zipfile.ZipFile(io.BytesIO(data))
        except zipfile.BadZipFile as exc:  # pragma: no cover - caller maps it
            raise BadZip(str(exc)) from exc

    @property
    def names(self):
        return self._zf.NameToInfo

    def namelist(self) -> list[str]:
        return self._zf.namelist()

    def read(self, name: str) -> bytes:
        try:
            return self._zf.read(name)
        except KeyError as exc:
            raise KeyError(name) from exc

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class FastZip:
    """Central-directory index over an in-memory zip; lazy member reads."""

    __slots__ = ("_data", "_entries")

    def __init__(self, data: bytes,
                 entries: dict[str, tuple[int, int, int, int]]):
        self._data = data
        # name -> (local header offset, method, compressed size, crc32)
        self._entries = entries

    @property
    def names(self):
        return self._entries

    def namelist(self) -> list[str]:
        # central-directory order, matching zipfile.ZipFile.namelist()
        return list(self._entries)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def read(self, name: str) -> bytes:
        header_off, method, csize, crc = self._entries[name]
        data = self._data
        if not data.startswith(_LOCAL_SIG, header_off):
            raise BadZip(f"bad local header for {name!r}")
        (_, _, flags, _, _, _, _, _, _, name_len, extra_len) = _LOCAL.unpack_from(
            data, header_off
        )
        if flags & 0x1:
            raise BadZip("encrypted member")
        start = header_off + _LOCAL.size + name_len + extra_len
        raw = data[start:start + csize]
        if method == 0:
            out = raw
        elif method == 8:
            try:
                out = zlib.decompressobj(-15).decompress(raw)
            except zlib.error as exc:
                raise BadZip(f"deflate failed for {name!r}: {exc}") from exc
        else:
            raise BadZip(f"unsupported compression method {method}")
        # corruption must surface as an error, matching zipfile/Go archive/zip
        if zlib.crc32(out) != crc:
            raise BadZip(f"bad CRC-32 for {name!r}")
        return out


def open_zip(data: bytes) -> FastZip | _StdlibZip:
    """Open an in-memory zip; fast path or transparent zipfile fallback.

    Raises :class:`BadZip` when the payload is not a zip at all (both paths).
    """
    try:
        return _fast_open(data)
    except BadZip:
        raise
    except _Fallback:
        return _StdlibZip(data)


class _Fallback(Exception):
    """Archive is (or may be) valid but outside the fast path's scope."""


def _fast_open(data: bytes) -> FastZip:
    # EOCD lives in the last 22..22+65535 bytes; search the tail
    tail_start = max(0, len(data) - 22 - 0xFFFF)
    eocd_off = data.rfind(_EOCD_SIG, tail_start)
    if eocd_off < 0:
        if data.startswith(_LOCAL_SIG):
            raise _Fallback  # truncated or streamed zip — let zipfile decide
        raise BadZip("not a zip archive")
    try:
        (_, disk_no, cd_disk, _, total_entries, cd_size, cd_off, _) = (
            _EOCD.unpack_from(data, eocd_off)
        )
    except struct.error:
        raise _Fallback from None
    if disk_no or cd_disk:
        raise _Fallback  # multi-disk
    if total_entries == 0xFFFF or cd_off == 0xFFFFFFFF or cd_size == 0xFFFFFFFF:
        raise _Fallback  # zip64
    entries: dict[str, tuple[int, int, int, int]] = {}
    pos = cd_off
    end = cd_off + cd_size
    if end > len(data):
        raise _Fallback
    for _ in range(total_entries):
        if not data.startswith(_CDIR_SIG, pos):
            raise _Fallback
        try:
            (_, _, _, flags, method, _, _, crc, csize, usize, name_len,
             extra_len, comment_len, _, _, _, local_off) = _CDIR.unpack_from(
                data, pos
            )
        except struct.error:
            raise _Fallback from None
        if flags & 0x1:
            raise _Fallback  # encrypted — let zipfile produce its error
        if method not in (0, 8):
            raise _Fallback
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF or local_off == 0xFFFFFFFF:
            raise _Fallback  # zip64 member
        name_start = pos + _CDIR.size
        raw_name = data[name_start:name_start + name_len]
        if flags & 0x800:  # language-encoding flag: name is UTF-8
            try:
                name = raw_name.decode("utf-8")
            except UnicodeDecodeError:
                raise _Fallback from None
        else:  # zipfile parity: unflagged names are cp437
            name = raw_name.decode("cp437")
        entries[name] = (local_off, method, csize, crc)
        pos = name_start + name_len + extra_len + comment_len
    if pos != end:
        # EOCD entry count disagrees with the directory extent (seen from
        # naive zip-concat/repair tools). zipfile walks the whole cd region
        # by size, so defer to it rather than silently dropping members.
        raise _Fallback
    return FastZip(data, entries)
