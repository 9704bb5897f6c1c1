"""7z container codec: round-trips over every coder (copy/LZMA/LZMA2/
BZip2), encoded headers, empty files, NUMBER edge values, hostile
inputs, CRC-repaired header fuzz, and the archive-walk integration
(explode + the bzip2/LZMA zip-member coverage stdlib gives for free).
"""
from __future__ import annotations

import random
import struct
import zlib

import pytest

from marky_spark.ops.sevenzip import (
    SevenZipError,
    SevenZipUnsupportedError,
    _Reader,
    _w_number,
    looks_like_7z,
    sevenzip_members,
    sevenzip_write,
)

MEMBERS = [
    ("a.txt", b"hello 7z " * 100),
    ("dir/b.bin", bytes(range(256)) * 40),
    ("empty.txt", b""),
    ("c.md", b"# compressed\n" * 77),
    ("d.dat", b"\x00" * 5000),
]


@pytest.mark.parametrize("encoded_header", [False, True])
def test_round_trip(encoded_header):
    blob = sevenzip_write(MEMBERS, encoded_header=encoded_header)
    assert looks_like_7z(blob)
    assert sevenzip_members(blob) == MEMBERS


def test_every_coder_round_trips():
    """The writer rotates copy/LZMA/LZMA2/BZip2 by non-empty position, so
    4+ members exercise every decode path; verify per-member recovery."""
    members = [(f"m{k}.bin", bytes([k]) * (1000 + k)) for k in range(8)]
    assert sevenzip_members(sevenzip_write(members)) == members


def test_empty_archive_and_all_empty_members():
    assert sevenzip_members(sevenzip_write([])) == []
    members = [("x", b""), ("y", b"")]
    assert sevenzip_members(sevenzip_write(members)) == members


def test_number_encoding_edges():
    """NUMBER round-trips at every byte-count boundary (the 7-bits-per-
    leading-one format from 7zFormat.txt)."""
    for v in (0, 1, 127, 128, 255, 256, (1 << 14) - 1, 1 << 14,
              (1 << 21) - 1, 1 << 21, (1 << 28) - 1, 1 << 35,
              (1 << 56) - 1, 1 << 56, (1 << 63) - 1):
        r = _Reader(_w_number(v))
        assert r.number() == v, v
        assert r.p == len(r.d), v


def test_hostile_inputs_raise_typed():
    base = sevenzip_write(MEMBERS)
    with pytest.raises(SevenZipError, match="not a 7z"):
        sevenzip_members(b"PK\x03\x04 nope")
    with pytest.raises(SevenZipError, match="signature header"):
        sevenzip_members(base[:20])
    bad = bytearray(base)
    bad[8] ^= 0xFF
    with pytest.raises(SevenZipError, match="start header CRC"):
        sevenzip_members(bytes(bad))
    with pytest.raises(SevenZipError, match="outside the archive"):
        sevenzip_members(base[:40])
    # excise bytes mid-archive: the tail locator lands off-target
    with pytest.raises(SevenZipError):
        sevenzip_members(base[:40] + base[50:])
    # corrupt an LZMA2-coded folder's packed stream (member index 2 of
    # the coder rotation): the decompressor or the size check objects
    nh_off = struct.unpack_from("<QQI", base, 12)[0]
    bad = bytearray(base)
    for at in range(32, 32 + nh_off):
        bad[at] ^= 0xA5
    with pytest.raises(SevenZipError):
        sevenzip_members(bytes(bad))


def test_header_fuzz_stays_typed():
    """Bit-flip the property tree and RE-SEAL both CRCs so mutations
    reach the parser — every escape must be a typed SevenZip error."""
    rng = random.Random(0x7A11)
    base = sevenzip_write(MEMBERS)
    base_eh = sevenzip_write(MEMBERS, encoded_header=True)
    for t in range(1200):
        src = base if t % 2 else base_eh
        nh_off, nh_size, _ = struct.unpack_from("<QQI", src, 12)
        hstart = 32 + nh_off
        blob = bytearray(src)
        for _ in range(rng.randrange(1, 5)):
            blob[hstart + rng.randrange(nh_size)] ^= 1 << rng.randrange(8)
        struct.pack_into(
            "<I", blob, 28,
            zlib.crc32(bytes(blob[hstart:hstart + nh_size])))
        struct.pack_into("<I", blob, 8, zlib.crc32(bytes(blob[12:32])))
        try:
            out = sevenzip_members(bytes(blob))
            assert all(isinstance(n, str) for n, _ in out)
        except (SevenZipError, SevenZipUnsupportedError):
            pass


def test_archive_walk_explodes_7z(spark):
    """7z flows through the shared archive front door: _iter_members
    sniffs it and explode_archive fans members out."""
    from marky_spark.ops.archive import explode_archive

    blob = sevenzip_write(MEMBERS, encoded_header=True)
    media = spark.createDataFrame(
        [("s1", "application/x-7z-compressed", bytearray(blob))],
        "media_ref string, mime string, payload binary")
    rows = {r["member_name"]: r for r in explode_archive(media).collect()
            if r["ok"] == "ok"}
    assert set(rows) == {n for n, _ in MEMBERS}
    for name, data in MEMBERS:
        assert bytes(rows[name]["payload"] or b"") == data


def test_zip_exotic_methods_explode():
    """stdlib zipfile hands us bzip2 (method 12) and LZMA (method 14)
    members for free — pin that the walk really recovers them."""
    import io
    import zipfile

    from marky_spark.ops.archive import _zip_members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("bz.txt"), b"hello bzip2 " * 50,
                    compress_type=zipfile.ZIP_BZIP2)
        zf.writestr(zipfile.ZipInfo("lz.txt"), b"hello lzma " * 50,
                    compress_type=zipfile.ZIP_LZMA)
    assert _zip_members(buf.getvalue()) == [
        ("bz.txt", b"hello bzip2 " * 50), ("lz.txt", b"hello lzma " * 50)]


def test_filter_chain_folders_round_trip():
    """Two-coder [LZMA2 → BCJ-x86 | delta] folders — the common
    real-world 7z layout for executables/structured binary — decode
    through liblzma's raw filter chains; longer chains stay typed."""
    members = [(f"m{k}.bin",
                bytes([(k * 17 + j) % 251 for j in range(3000 + k)]))
               for k in range(8)]  # rotation covers both chain coders
    for eh in (False, True):
        assert sevenzip_members(
            sevenzip_write(members, encoded_header=eh)) == members
    code = (b"\xe8\x10\x00\x00\x00" + b"\x90" * 20) * 200
    m2 = [("pad%d" % k, b"x" * 100) for k in range(4)] + [("prog.exe", code)]
    assert sevenzip_members(sevenzip_write(m2)) == m2


def test_oversized_7z_is_a_typed_cap():
    """The 7z walk is whole-read by format design (tail header, solid
    folders); files beyond MAX_7Z_BYTES become a typed error row, never
    an executor OOM. Simulated with a reader that claims to be huge."""
    import io

    from marky_spark.ops.archive import MAX_7Z_BYTES, ArchiveError, \
        _Budget, _iter_7z

    class Huge(io.RawIOBase):
        def __init__(self):
            self.left = MAX_7Z_BYTES + 2

        def readable(self):
            return True

        def readinto(self, b):
            n = min(len(b), self.left)
            b[:n] = b"\x00" * n
            self.left -= n
            return n

    with pytest.raises(ArchiveError, match="whole-container cap"):
        list(_iter_7z(io.BufferedReader(Huge(), 1 << 20), _Budget()))


def test_directories_are_skipped_not_emitted():
    """Empty streams without a kEmptyFile mark are directories (the
    7-Zip convention); only marked empty FILES surface as members."""
    import re

    blob = sevenzip_write([("d.txt", b"x" * 50), ("keep.empty", b"")])
    # writer marks its empty member as an empty FILE → it survives
    assert ("keep.empty", b"") in sevenzip_members(blob)
    # strip the kEmptyFile property (0x0F) from the header: the same
    # empty stream now reads as a DIRECTORY and is skipped
    nh_off, nh_size, _ = struct.unpack_from("<QQI", blob, 12)
    hdr = bytearray(blob[32 + nh_off:32 + nh_off + nh_size])
    at = hdr.find(bytes([0x0F, 0x01]))  # kEmptyFile, size 1
    assert at > 0
    del hdr[at:at + 3]
    patched = bytearray(blob[:32 + nh_off]) + hdr
    struct.pack_into("<Q", patched, 20, len(hdr))
    struct.pack_into("<I", patched, 28, zlib.crc32(bytes(hdr)))
    struct.pack_into("<I", patched, 8, zlib.crc32(bytes(patched[12:32])))
    out = sevenzip_members(bytes(patched))
    assert out == [("d.txt", b"x" * 50)]


def test_declared_output_bomb_is_typed():
    """Many folders each under the per-folder cap but huge in total must
    reject from the DECLARED sizes before any decompression (an archive
    a few KB long can otherwise demand terabytes)."""
    import marky_spark.ops.sevenzip as sz

    n = 5
    big = sz.MAX_FOLDER_BYTES  # each folder at the per-folder cap
    body = bytearray()
    body += sz._w_number(0x01)  # kHeader
    body += sz._w_number(0x04)  # kMainStreamsInfo
    body += sz._w_streams_info(
        0, [1] * n, [(sz._w_folder(b"\x00", b"")[0], [big])] * n)
    body += sz._w_number(0x05)  # kFilesInfo
    body += sz._w_number(n)
    names = b"\x00" + "".join(
        f"f{k}\x00" for k in range(n)).encode("utf-16-le")
    body += sz._w_number(0x11) + sz._w_number(len(names)) + names
    body += sz._w_number(0x00) + sz._w_number(0x00)
    header = bytes(body)
    pack = b"\x00" * n
    start = struct.pack("<QQI", len(pack), len(header),
                        zlib.crc32(header))
    blob = (sz.MAGIC + b"\x00\x04" + struct.pack("<I", zlib.crc32(start))
            + start + pack + header)
    with pytest.raises(SevenZipError, match="declares"):
        sevenzip_members(blob)


def test_encoded_header_bomb_is_typed():
    """A kEncodedHeader declaring huge folder output must reject from the
    DECLARED sizes before any decompression — the main-stream bomb guard
    must also cover the header folders (a 4 KB archive can otherwise
    force multi-GiB header decompression)."""
    import marky_spark.ops.sevenzip as sz

    def craft(n_folders, out_each):
        enc = bytearray()
        enc += sz._w_number(0x17)  # kEncodedHeader
        enc += sz._w_streams_info(
            0, [1] * n_folders,
            [(sz._w_folder(b"\x00", b"")[0], [out_each])] * n_folders)
        header = bytes(enc)
        pack = b"\x00" * n_folders
        start = struct.pack("<QQI", len(pack), len(header),
                            zlib.crc32(header))
        return (sz.MAGIC + b"\x00\x04"
                + struct.pack("<I", zlib.crc32(start))
                + start + pack + header)

    # too many header folders (real encoded headers are ONE folder)
    with pytest.raises(SevenZipError, match="encoded-header folders"):
        sevenzip_members(craft(sz.MAX_HEADER_FOLDERS + 1, 10))
    # one folder, but declaring more output than any real header
    with pytest.raises(SevenZipError, match="encoded header declares"):
        sevenzip_members(craft(1, sz.MAX_HEADER_BYTES + 1))
    # a legitimate encoded header still decodes
    blob = sevenzip_write(MEMBERS, encoded_header=True)
    assert sevenzip_members(blob) == MEMBERS


def test_empty_file_before_empty_stream():
    """Property order inside FilesInfo is not fixed by the spec: a header
    that places kEmptyFile BEFORE kEmptyStream must still classify the
    empty-stream entries as files, not silently drop them as dirs."""
    import marky_spark.ops.sevenzip as sz

    data = b"payload-bytes"
    packed, fbody, out_sizes = sz._encode_one("copy", data)
    body = bytearray()
    body += sz._w_number(0x01)  # kHeader
    body += sz._w_number(0x04)  # kMainStreamsInfo
    body += sz._w_streams_info(0, [len(packed)], [(fbody, out_sizes)])
    body += sz._w_number(0x05)  # kFilesInfo
    body += sz._w_number(2)     # two files: one empty, one with data
    efvec = sz._w_bitvector([True])
    body += sz._w_number(0x0F) + sz._w_number(len(efvec)) + efvec
    esvec = sz._w_bitvector([True, False])
    body += sz._w_number(0x0E) + sz._w_number(len(esvec)) + esvec
    names = b"\x00" + "e.txt\x00d.txt\x00".encode("utf-16-le")
    body += sz._w_number(0x11) + sz._w_number(len(names)) + names
    body += sz._w_number(0x00) + sz._w_number(0x00)
    header = bytes(body)
    start = struct.pack("<QQI", len(packed), len(header),
                        zlib.crc32(header))
    blob = (sz.MAGIC + b"\x00\x04" + struct.pack("<I", zlib.crc32(start))
            + start + packed + header)
    assert sevenzip_members(blob) == [("e.txt", b""), ("d.txt", data)]
