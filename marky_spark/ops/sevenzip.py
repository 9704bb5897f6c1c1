"""7-Zip container walk (reader + fixture-inverse writer) — pure stdlib.

7z is a staple of web-crawl attachments and software mirrors, and the one
mainstream archive container the explode operator lacked (zip/gzip/bz2/
xz/tar are stdlib one-liners; 7z's property-tree header is not). The
reference never opens archives (it converts single documents); this is
part of the repo's ingest front door (ops/archive).

Written from the public ``7zFormat.txt`` spec shipped with 7-Zip/p7zip:

- signature header (32 bytes): magic, version, CRC-guarded locator of the
  "next header" at the archive tail
- the NUMBER variable-length integer (leading-ones byte count)
- property tree: kHeader / kEncodedHeader, kMainStreamsInfo (kPackInfo,
  kUnPackInfo with per-folder coder graphs, kSubStreamsInfo), kFilesInfo
  (kEmptyStream / kEmptyFile bit vectors, UTF-16-LE kName)

Scope (honest subset): folders whose coders stdlib can decompress —
Copy (00), LZMA (03 01 01, replayed through a synthesized
``FORMAT_ALONE`` header so no private lzma APIs are touched), LZMA2 (21,
``FORMAT_RAW`` with the dict-size property byte decoded per spec) and
BZip2 (04 02 02) — plus encoded (compressed) headers built from the same
folder machinery, and the common two-coder [LZMA/LZMA2 → BCJ-x86|delta]
filter chains (decoded in one pass through liblzma's raw filter-chain
support). Longer chains, AES, and exotic filters raise
:class:`SevenZipUnsupportedError`; anything malformed raises
:class:`SevenZipError` (the poison-pill contract). Both header CRCs are
verified; folder output is size-capped BEFORE decompression (bomb guard)
and decompressors are driven with ``max_length`` so a lying stream cannot
overshoot its declared size.

The writer is the decoder's adversarial inverse (one folder per
non-empty member, rotating coders, optional LZMA-compressed header,
empty-file bit vectors), which is what lets round-trip tests and
mutation fuzz pin the real header walk.
"""
from __future__ import annotations

import struct
import zlib

MAGIC = b"7z\xbc\xaf\x27\x1c"
MAX_FOLDER_BYTES = 1 << 28    # 256 MiB decompressed per folder (solid cap)
MAX_TOTAL_BYTES = 1 << 30     # 1 GiB declared output across all folders
MAX_HEADER_BYTES = 1 << 24    # 16 MiB decoded kEncodedHeader (real ones are KiB)
MAX_HEADER_FOLDERS = 4        # 7z writes ONE header folder; tolerate a few
MAX_ENTRIES = 1 << 16

_K_END = 0x00
_K_HEADER = 0x01
_K_ARCHIVE_PROPS = 0x02
_K_ADDITIONAL = 0x03
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_OUT_SIZES = 0x0C
_K_NUM_UNPACK = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17

_CODER_COPY = b"\x00"
_CODER_LZMA = b"\x03\x01\x01"
_CODER_LZMA2 = b"\x21"
_CODER_BZIP2 = b"\x04\x02\x02"


class SevenZipError(ValueError):
    """Malformed / hostile 7z input."""


class SevenZipUnsupportedError(NotImplementedError):
    """Recognized 7z feature outside the supported subset (filter-chain
    folders, AES, external streams)."""


def looks_like_7z(data: bytes) -> bool:
    return data[:6] == MAGIC


class _Reader:
    """Byte cursor over a header blob with the 7z primitives."""
    __slots__ = ("d", "p")

    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def byte(self) -> int:
        if self.p >= len(self.d):
            raise SevenZipError("7z header truncated")
        self.p += 1
        return self.d[self.p - 1]

    def take(self, n: int) -> bytes:
        if n < 0 or self.p + n > len(self.d):
            raise SevenZipError("7z header truncated")
        self.p += n
        return self.d[self.p - n:self.p]

    def number(self) -> int:
        """The 7z NUMBER: leading ones of the first byte give the count
        of little-endian low bytes; its remaining bits are the high part."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if not first & mask:
                return value | (first & (mask - 1)) << (8 * i)
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitvector(self, n: int) -> list[bool]:
        if n > MAX_ENTRIES:
            raise SevenZipError(f"bit vector of {n} entries")
        raw = self.take((n + 7) // 8)
        return [bool(raw[i >> 3] & (0x80 >> (i & 7))) for i in range(n)]

    def optional_bitvector(self, n: int) -> list[bool]:
        """AllAreDefined byte, then an explicit vector only when 0."""
        return [True] * n if self.byte() else self.bitvector(n)


def _skip_crcs(r: _Reader, n: int) -> None:
    defined = r.optional_bitvector(n)
    r.take(4 * sum(defined))


def _parse_folder(r: _Reader) -> dict:
    n_coders = r.number()
    if not 1 <= n_coders <= 64:
        raise SevenZipError(f"folder with {n_coders} coders")
    coders = []
    total_in = total_out = 0
    for _ in range(n_coders):
        flag = r.byte()
        if flag & 0xC0:
            raise SevenZipError("reserved coder flag bits")
        cid = r.take(flag & 0x0F)
        n_in = n_out = 1
        if flag & 0x10:
            n_in, n_out = r.number(), r.number()
        props = b""
        if flag & 0x20:
            props = r.take(r.number())
        coders.append((cid, n_in, n_out, props))
        total_in += n_in
        total_out += n_out
        if total_in > 256 or total_out > 256:
            # a lying NUMBER here would otherwise drive huge list loops
            raise SevenZipError("coder stream counts out of range")
    n_bind = total_out - 1
    bind = [(r.number(), r.number()) for _ in range(n_bind)]
    n_packed = total_in - n_bind
    packed_idx = ([r.number() for _ in range(n_packed)]
                  if n_packed != 1 else None)
    return {"coders": coders, "bind": bind, "n_packed": n_packed,
            "packed_idx": packed_idx, "total_out": total_out}


def _parse_streams_info(r: _Reader) -> dict:
    pack_pos = 0
    pack_sizes: list[int] = []
    folders: list[dict] = []
    pid = r.number()
    if pid == _K_PACK_INFO:
        pack_pos = r.number()
        n_pack = r.number()
        if n_pack > MAX_ENTRIES:
            raise SevenZipError(f"{n_pack} pack streams")
        while True:
            t = r.number()
            if t == _K_SIZE:
                pack_sizes = [r.number() for _ in range(n_pack)]
            elif t == _K_CRC:
                _skip_crcs(r, n_pack)
            elif t == _K_END:
                break
            else:
                raise SevenZipError(f"unknown PackInfo property {t:#x}")
        pid = r.number()
    if pid == _K_UNPACK_INFO:
        if r.number() != _K_FOLDER:
            raise SevenZipError("UnPackInfo without kFolder")
        n_folders = r.number()
        if n_folders > MAX_ENTRIES:
            raise SevenZipError(f"{n_folders} folders")
        if r.byte():
            raise SevenZipUnsupportedError("external folder data")
        folders = [_parse_folder(r) for _ in range(n_folders)]
        if r.number() != _K_OUT_SIZES:
            raise SevenZipError("UnPackInfo without kCodersUnPackSize")
        for f in folders:
            f["out_sizes"] = [r.number() for _ in range(f["total_out"])]
            f["crc_defined"] = False
        while True:
            t = r.number()
            if t == _K_CRC:
                defined = r.optional_bitvector(n_folders)
                r.take(4 * sum(defined))
                for f, dfn in zip(folders, defined):
                    f["crc_defined"] = dfn
            elif t == _K_END:
                break
            else:
                raise SevenZipError(f"unknown UnPackInfo property {t:#x}")
        pid = r.number()
    nums = [1] * len(folders)
    sub_sizes: list[list[int]] | None = None
    if pid == _K_SUBSTREAMS:
        t = r.number()
        if t == _K_NUM_UNPACK:
            nums = [r.number() for _ in folders]
            if sum(nums) > MAX_ENTRIES:
                raise SevenZipError("substream count cap")
            t = r.number()
        sub_sizes = []
        for fi, f in enumerate(folders):
            total = _folder_out_size(f)
            if nums[fi] == 0:
                sub_sizes.append([])
                continue
            if t == _K_SIZE and nums[fi] > 1:
                head = [r.number() for _ in range(nums[fi] - 1)]
            else:
                head = []
            tail = total - sum(head)
            if tail < 0:
                raise SevenZipError("substream sizes exceed folder")
            sub_sizes.append(head + [tail])
        if t == _K_SIZE:
            t = r.number()
        while t != _K_END:
            if t == _K_CRC:
                unknown = sum(nums) - sum(
                    1 for fi, f in enumerate(folders)
                    if nums[fi] == 1 and f["crc_defined"])
                defined = r.optional_bitvector(unknown)
                r.take(4 * sum(defined))
            else:
                raise SevenZipError(f"unknown SubStreams property {t:#x}")
            t = r.number()
        pid = r.number()
    if pid != _K_END:
        raise SevenZipError(f"unterminated StreamsInfo ({pid:#x})")
    return {"pack_pos": pack_pos, "pack_sizes": pack_sizes,
            "folders": folders, "nums": nums, "sub_sizes": sub_sizes}


def _folder_out_size(folder: dict) -> int:
    """The folder's final output size: the out-stream no bind pair
    consumes (single-coder folders: the only one)."""
    bound = {out for _, out in folder["bind"]}
    for k, size in enumerate(folder["out_sizes"]):
        if k not in bound:
            return size
    raise SevenZipError("folder with no final output stream")


_FILTER_X86 = b"\x03\x03\x01\x03"
_FILTER_DELTA = b"\x03"


def _filter_spec(cid: bytes, props: bytes) -> dict:
    """Outer-filter coder → liblzma raw-chain filter entry."""
    import lzma

    if cid == _FILTER_X86:
        if props:
            raise SevenZipUnsupportedError("BCJ x86 with a start offset")
        return {"id": lzma.FILTER_X86}
    if cid == _FILTER_DELTA:
        if len(props) != 1:
            raise SevenZipError("delta filter without its distance byte")
        return {"id": lzma.FILTER_DELTA, "dist": props[0] + 1}
    raise SevenZipUnsupportedError(
        f"filter coder {cid.hex() or '00'} not supported")


def _lzma_chain_spec(cid: bytes, props: bytes, out_size: int) -> dict:
    """Compressor coder → liblzma raw filter entry. The declared
    ``dict_size`` is CLAMPED to the folder's declared output (floor
    4 KiB): liblzma allocates the whole dictionary eagerly, so a tiny
    hostile archive declaring a 4 GiB dict would otherwise force an
    untyped MemoryError — and a valid stream can never reference
    further back than its own output length."""
    import lzma

    cap = max(out_size, 4096)
    if cid == _CODER_LZMA2:
        if len(props) != 1 or props[0] > 40:
            raise SevenZipError("bad LZMA2 dict-size property")
        dict_size = (0xFFFFFFFF if props[0] == 40
                     else (2 | (props[0] & 1)) << (props[0] // 2 + 11))
        return {"id": lzma.FILTER_LZMA2, "dict_size": min(dict_size, cap)}
    if cid == _CODER_LZMA:
        if len(props) != 5:
            raise SevenZipError("LZMA coder without 5-byte properties")
        p = props[0]
        if p >= 225:
            raise SevenZipError("bad LZMA lc/lp/pb byte")
        dict_size = int.from_bytes(props[1:5], "little")
        return {"id": lzma.FILTER_LZMA1, "lc": p % 9, "lp": (p // 9) % 5,
                "pb": p // 45, "dict_size": min(dict_size, cap)}
    raise SevenZipUnsupportedError(
        f"chained compressor {cid.hex() or '00'} not supported")


def _decode_chain_folder(folder: dict, packed: bytes,
                         out_size: int) -> bytes:
    """Two-coder folder [compressor → filter]: the common real-world 7z
    layout for executables (BCJ x86) and structured binary (delta).
    Decoded in one pass through liblzma's raw filter chain."""
    import lzma

    coders = folder["coders"]
    if any((c[1], c[2]) != (1, 1) for c in coders):
        raise SevenZipUnsupportedError("multi-stream coder in chain")
    if len(folder["bind"]) != 1:
        raise SevenZipError("two-coder folder needs exactly one bind pair")
    in_idx, out_idx = folder["bind"][0]
    # global stream indexing: coder k's single in/out stream has index k
    if not (0 <= in_idx <= 1 and 0 <= out_idx <= 1) or in_idx == out_idx:
        raise SevenZipError("bad bind pair indices")
    filt_k, comp_k = in_idx, out_idx
    # the packed stream must feed the compressor (its in-stream is the
    # unbound one); a folder filtered AFTER compression is not a layout
    # any writer produces
    filters = [_filter_spec(*_cp(coders[filt_k])),
               _lzma_chain_spec(*_cp(coders[comp_k]), out_size)]
    try:
        # construction validates the filter specs (e.g. liblzma rejects
        # lc+lp > 4) — keep it inside the typed-error net too
        dec = lzma.LZMADecompressor(lzma.FORMAT_RAW, filters=filters)
        return dec.decompress(packed, max_length=out_size + 1)
    except lzma.LZMAError as exc:
        raise SevenZipError(f"bad filtered stream: {exc}") from None


def _cp(coder) -> tuple[bytes, bytes]:
    return coder[0], coder[3]


def _decode_folder(folder: dict, packed: bytes) -> bytes:
    out_size = _folder_out_size(folder)
    if out_size > MAX_FOLDER_BYTES:
        raise SevenZipError(
            f"folder declares {out_size} bytes (cap {MAX_FOLDER_BYTES})")
    if len(folder["coders"]) == 2:
        out = _decode_chain_folder(folder, packed, out_size)
        if len(out) != out_size:
            raise SevenZipError(
                f"folder decompressed to {len(out)} bytes, "
                f"declared {out_size}")
        return out
    if len(folder["coders"]) != 1 or folder["bind"]:
        kinds = "+".join(c[0].hex() or "00" for c in folder["coders"])
        raise SevenZipUnsupportedError(
            f"multi-coder folder ({kinds}) — only [compressor → filter] "
            f"chains are supported")
    cid, n_in, n_out, props = folder["coders"][0]
    if (n_in, n_out) != (1, 1):
        raise SevenZipUnsupportedError("multi-stream coder")
    if cid == _CODER_COPY:
        out = packed
    elif cid in (_CODER_LZMA, _CODER_LZMA2):
        import lzma

        # same clamped FORMAT_RAW path as the chain decoder (the spec
        # parse validates the props and bounds the dictionary;
        # constructing the decompressor validates them liblzma-side,
        # e.g. lc+lp > 4 → typed error)
        try:
            dec = lzma.LZMADecompressor(lzma.FORMAT_RAW, filters=[
                _lzma_chain_spec(cid, props, out_size)])
            out = dec.decompress(packed, max_length=out_size + 1)
        except lzma.LZMAError as exc:
            raise SevenZipError(f"bad LZMA stream: {exc}") from None
    elif cid == _CODER_BZIP2:
        import bz2

        dec = bz2.BZ2Decompressor()
        try:
            out = dec.decompress(packed, max_length=out_size + 1)
        except OSError as exc:
            raise SevenZipError(f"bad bzip2 stream: {exc}") from None
    else:
        raise SevenZipUnsupportedError(
            f"coder {cid.hex() or '00'} not supported")
    if len(out) != out_size:
        raise SevenZipError(
            f"folder decompressed to {len(out)} bytes, declared {out_size}")
    return out


def _parse_files_info(r: _Reader):
    n_files = r.number()
    if n_files > MAX_ENTRIES:
        raise SevenZipError(f"{n_files} files (cap {MAX_ENTRIES})")
    names: list[str] | None = None
    empty_stream = [False] * n_files
    empty_file: list[bool] | None = None
    # Property order is not fixed by the spec, and kEmptyFile's vector
    # length depends on kEmptyStream — buffer its raw bytes and resolve
    # after the loop, once empty_stream is final.
    empty_file_raw: bytes | None = None
    while True:
        t = r.number()
        if t == _K_END:
            break
        size = r.number()
        end = r.p + size
        if end > len(r.d):
            raise SevenZipError("FilesInfo property overruns header")
        if t == _K_EMPTY_STREAM:
            empty_stream = r.bitvector(n_files)
        elif t == _K_EMPTY_FILE:
            empty_file_raw = r.take(end - r.p)
        elif t == _K_NAME:
            if r.byte():
                raise SevenZipUnsupportedError("external file names")
            raw = r.take(end - r.p)
            try:
                joined = raw.decode("utf-16-le")
            except UnicodeDecodeError as exc:
                raise SevenZipError(f"bad file names: {exc}") from None
            if not joined:
                names = []
            elif not joined.endswith("\x00"):
                raise SevenZipError("file names not NUL-terminated")
            else:
                names = joined[:-1].split("\x00")
        # kAnti / times / attributes: irrelevant to member
        # extraction — skip by declared size
        r.p = end
    if empty_file_raw is not None:
        empty_file = _Reader(empty_file_raw).bitvector(sum(empty_stream))
    if names is None:
        names = [f"member{k}" for k in range(n_files)]
    if len(names) != n_files:
        raise SevenZipError(
            f"{len(names)} names for {n_files} files")
    return n_files, names, empty_stream, empty_file


def sevenzip_members(blob: bytes) -> list[tuple[str, bytes]]:
    """7z bytes → ``[(name, data)]`` in archive order (empty files
    included as empty bytes; directories — empty streams that are not
    empty files — are skipped like the zip walk skips ``name/``)."""
    if not looks_like_7z(blob):
        raise SevenZipError("not a 7z (no signature)")
    if len(blob) < 32:
        raise SevenZipError("7z shorter than its signature header")
    (start_crc,) = struct.unpack_from("<I", blob, 8)
    if zlib.crc32(blob[12:32]) != start_crc:
        raise SevenZipError("start header CRC mismatch")
    nh_off, nh_size, nh_crc = struct.unpack_from("<QQI", blob, 12)
    if nh_size == 0:
        return []  # empty archive
    if nh_off + nh_size > len(blob) - 32 or nh_size > len(blob):
        raise SevenZipError("next header outside the archive")
    hdr = blob[32 + nh_off:32 + nh_off + nh_size]
    if zlib.crc32(hdr) != nh_crc:
        raise SevenZipError("next header CRC mismatch")
    r = _Reader(hdr)
    t = r.number()
    if t == _K_ENCODED_HEADER:
        si = _parse_streams_info(r)
        # Bomb guard BEFORE decompressing: the per-folder 256 MiB cap alone
        # would let a tiny hostile archive declare 65536 × 256 MiB of header
        # folders.  Real encoded headers are one small LZMA folder.
        if len(si["folders"]) > MAX_HEADER_FOLDERS:
            raise SevenZipError(
                f"{len(si['folders'])} encoded-header folders "
                f"(cap {MAX_HEADER_FOLDERS})")
        hdr_declared = sum(_folder_out_size(f) for f in si["folders"])
        if hdr_declared > MAX_HEADER_BYTES:
            raise SevenZipError(
                f"encoded header declares {hdr_declared} bytes "
                f"(cap {MAX_HEADER_BYTES})")
        hdr = b"".join(_folder_blobs(blob, si))
        r = _Reader(hdr)
        t = r.number()
    if t != _K_HEADER:
        raise SevenZipError(f"expected kHeader, got {t:#x}")
    main = None
    files = None
    while True:
        t = r.number()
        if t == _K_END:
            break
        if t == _K_MAIN_STREAMS:
            main = _parse_streams_info(r)
        elif t == _K_FILES_INFO:
            files = _parse_files_info(r)
        elif t in (_K_ARCHIVE_PROPS, _K_ADDITIONAL):
            raise SevenZipUnsupportedError(
                "archive properties / additional streams")
        else:
            raise SevenZipError(f"unknown header property {t:#x}")
    if files is None:
        raise SevenZipError("7z without FilesInfo")
    n_files, names, empty_stream, empty_file = files

    # stream of substream payloads, folder by folder. Every payload is
    # materialized at once (7z's file→substream mapping needs them all),
    # so bound the DECLARED total before decompressing anything — a
    # hostile archive of many max-size folders must be a typed error,
    # not an executor OOM.
    payloads: list[bytes] = []
    if main is not None and main["folders"]:
        declared = sum(_folder_out_size(f) for f in main["folders"])
        if declared > MAX_TOTAL_BYTES:
            raise SevenZipError(
                f"archive declares {declared} decompressed bytes "
                f"(cap {MAX_TOTAL_BYTES})")
        nums = main["nums"]
        sub_sizes = main["sub_sizes"]
        for fi, out in enumerate(_folder_blobs(blob, main)):
            if sub_sizes is None:
                payloads.append(out)
                continue
            at = 0
            for sz in sub_sizes[fi]:
                payloads.append(out[at:at + sz])
                at += sz
        expected = sum(nums) if sub_sizes is not None else len(
            main["folders"])
        if len(payloads) != expected:
            raise SevenZipError("substream bookkeeping mismatch")
    members: list[tuple[str, bytes]] = []
    it = iter(payloads)
    n_consumed = 0
    empty_idx = 0
    for k in range(n_files):
        if empty_stream[k]:
            # kEmptyFile distinguishes empty FILES from directories
            # (no kEmptyFile vector → all empty streams are dirs, the
            # 7-Zip convention); dirs are skipped like the zip walk
            # skips 'name/' entries
            is_file = (empty_file[empty_idx]
                       if empty_file is not None
                       and empty_idx < len(empty_file) else False)
            empty_idx += 1
            if is_file:
                members.append((names[k], b""))
            continue
        try:
            members.append((names[k], next(it)))
        except StopIteration:
            raise SevenZipError("more files than unpacked substreams") \
                from None
        n_consumed += 1
    if n_consumed != len(payloads):
        raise SevenZipError("unpacked substreams left over")
    return members


def _folder_blobs(blob: bytes, si: dict):
    """Decode each folder's output from the packed region."""
    base = 32 + si["pack_pos"]
    sizes = si["pack_sizes"]
    folders = si["folders"]
    if sum(f["n_packed"] for f in folders) != len(sizes):
        raise SevenZipError("pack stream count mismatch")
    at = base
    offs = []
    for sz in sizes:
        offs.append((at, sz))
        at += sz
        if at > len(blob):
            raise SevenZipError("pack streams outside the archive")
    k = 0
    for f in folders:
        if f["n_packed"] != 1:
            raise SevenZipUnsupportedError("multi-stream folder")
        off, sz = offs[k]
        k += 1
        yield _decode_folder(f, blob[off:off + sz])


# --------------------------------------------------------------- writer

def _w_number(v: int) -> bytes:
    if v < 0:
        raise SevenZipError("negative number")
    for n in range(8):
        if v < 1 << (7 + 7 * n):
            lead = (0xFF << (8 - n)) & 0xFF
            return bytes([lead | (v >> (8 * n))]) + (
                v & ((1 << (8 * n)) - 1)).to_bytes(n, "little")
    return b"\xff" + v.to_bytes(8, "little")


def _w_bitvector(bits: list[bool]) -> bytes:
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i >> 3] |= 0x80 >> (i & 7)
    return bytes(out)


def _encode_one(coder: str, data: bytes) -> tuple[bytes, bytes, list[int]]:
    """(packed, serialized_folder, out_sizes) for one member."""
    n = len(data)
    if coder == "copy":
        body, _ = _w_folder(_CODER_COPY, b"")
        return data, body, [n]
    if coder == "lzma":
        import lzma

        alone = lzma.compress(data, format=lzma.FORMAT_ALONE, preset=6)
        body, _ = _w_folder(_CODER_LZMA, alone[:5])
        return alone[13:], body, [n]
    if coder == "lzma2":
        import lzma

        packed = lzma.compress(data, format=lzma.FORMAT_RAW, filters=[
            {"id": lzma.FILTER_LZMA2, "preset": 6}])
        # dict-size property 24 → 16 MiB ≥ preset 6's 8 MiB dictionary
        body, _ = _w_folder(_CODER_LZMA2, b"\x18")
        return packed, body, [n]
    if coder == "bzip2":
        import bz2

        body, _ = _w_folder(_CODER_BZIP2, b"")
        return bz2.compress(data), body, [n]
    if coder in ("lzma2+x86", "lzma2+delta"):
        import lzma

        if coder == "lzma2+x86":
            filt_chain = {"id": lzma.FILTER_X86}
            filt_coder = (_FILTER_X86, b"")
        else:
            filt_chain = {"id": lzma.FILTER_DELTA, "dist": 4}
            filt_coder = (_FILTER_DELTA, b"\x03")   # distance byte = dist-1
        packed = lzma.compress(data, format=lzma.FORMAT_RAW, filters=[
            filt_chain, {"id": lzma.FILTER_LZMA2, "preset": 6}])
        body, _ = _w_chain_folder((_CODER_LZMA2, b"\x18"), filt_coder)
        # both filters are length-preserving: intermediate == final size
        return packed, body, [n, n]
    raise SevenZipError(f"unknown writer coder {coder!r}")


def _w_coder(cid: bytes, props: bytes) -> bytes:
    flag = len(cid) | (0x20 if props else 0)
    out = bytes([flag]) + cid
    if props:
        out += _w_number(len(props)) + props
    return out


def _w_folder(cid: bytes, props: bytes) -> tuple[bytes, int]:
    """Single-coder folder → (serialized folder, n out-streams)."""
    return _w_number(1) + _w_coder(cid, props), 1


def _w_chain_folder(comp: tuple[bytes, bytes],
                    filt: tuple[bytes, bytes]) -> tuple[bytes, int]:
    """[compressor → filter] folder: coder 0 = compressor (fed by the
    packed stream), coder 1 = filter, bind pair (in#1 ← out#0)."""
    body = (_w_number(2) + _w_coder(*comp) + _w_coder(*filt)
            + _w_number(1) + _w_number(0))    # bind pair (1, 0)
    return body, 2


def _w_streams_info(pack_pos: int, pack_sizes: list[int],
                    folder_entries: list[tuple[bytes, list[int]]]) -> bytes:
    """kPackInfo + kUnPackInfo:
    folder_entries = [(serialized_folder, [out_sizes...])]."""
    out = bytearray()
    out += _w_number(_K_PACK_INFO)
    out += _w_number(pack_pos) + _w_number(len(pack_sizes))
    out += _w_number(_K_SIZE)
    for sz in pack_sizes:
        out += _w_number(sz)
    out += _w_number(_K_END)
    out += _w_number(_K_UNPACK_INFO)
    out += _w_number(_K_FOLDER) + _w_number(len(folder_entries)) + b"\x00"
    for body, _ in folder_entries:
        out += body
    out += _w_number(_K_OUT_SIZES)
    for _, sizes in folder_entries:
        for size in sizes:
            out += _w_number(size)
    out += _w_number(_K_END)
    out += _w_number(_K_END)
    return bytes(out)


def sevenzip_write(members: list[tuple[str, bytes]],
                   encoded_header: bool = False,
                   coder_offset: int = 0) -> bytes:
    """``[(name, data)]`` → 7z archive, one folder per non-empty member
    with the coder rotating copy / LZMA / LZMA2 / BZip2 / LZMA2+BCJ-x86
    / LZMA2+delta by position (every decode path, including the
    two-coder filter chains, gets exercised); empty members ride the
    kEmptyStream bit vector. ``encoded_header=True`` wraps the header in
    an LZMA-compressed kEncodedHeader folder — the layout every stock
    7-Zip build writes — so the reader's two-level walk is pinned too.
    ``coder_offset`` shifts the rotation's starting point, so a corpus
    of single-member archives still spreads across every coder."""
    if len(members) > MAX_ENTRIES:
        raise SevenZipError("too many members")
    coders = ("copy", "lzma", "lzma2", "bzip2", "lzma2+x86", "lzma2+delta")
    packed_parts: list[bytes] = []
    folder_entries: list[tuple[bytes, list[int]]] = []
    empty_bits: list[bool] = []
    k = coder_offset
    for name, data in members:
        if not name:
            raise SevenZipError("member with empty name")
        empty_bits.append(not data)
        if not data:
            continue
        packed, fbody, out_sizes = _encode_one(coders[k % len(coders)],
                                               data)
        packed_parts.append(packed)
        folder_entries.append((fbody, out_sizes))
        k += 1

    body = bytearray()
    body += _w_number(_K_HEADER)
    if folder_entries:
        body += _w_number(_K_MAIN_STREAMS)
        body += _w_streams_info(0, [len(p) for p in packed_parts],
                                folder_entries)
    body += _w_number(_K_FILES_INFO)
    body += _w_number(len(members))
    if any(empty_bits):
        vec = _w_bitvector(empty_bits)
        body += _w_number(_K_EMPTY_STREAM) + _w_number(len(vec)) + vec
        # every empty stream here is an empty FILE, not a directory
        nvec = _w_bitvector([True] * sum(empty_bits))
        body += _w_number(_K_EMPTY_FILE) + _w_number(len(nvec)) + nvec
    if members:
        names_raw = b"\x00" + "".join(
            name + "\x00" for name, _ in members).encode("utf-16-le")
        body += _w_number(_K_NAME) + _w_number(len(names_raw)) + names_raw
    body += _w_number(_K_END)
    body += _w_number(_K_END)
    header = bytes(body)

    pack_region = b"".join(packed_parts)
    if encoded_header:
        import lzma

        alone = lzma.compress(header, format=lzma.FORMAT_ALONE, preset=6)
        hdr_packed = alone[13:]
        enc = bytearray()
        enc += _w_number(_K_ENCODED_HEADER)
        enc += _w_streams_info(
            len(pack_region), [len(hdr_packed)],
            [(_w_folder(_CODER_LZMA, alone[:5])[0], [len(header)])])
        pack_region += hdr_packed
        header = bytes(enc)

    nh_off = len(pack_region)
    start = struct.pack("<QQI", nh_off, len(header), zlib.crc32(header))
    return (MAGIC + b"\x00\x04" + struct.pack("<I", zlib.crc32(start))
            + start + pack_region + header)
