"""Archive columns: zip / gzip / tar bundles → per-member document rows.

Real corpora arrive bundled — Common-Crawl-style dumps, book zips,
source tarballs — so the extraction pipeline's first move at 100 TB is
an ARCHIVE EXPLODE: one binary blob fans out to N member rows that then
flow through the same sniff → convert path as loose documents
(marky's CLI converts one file at a time, marky.go:29-41; this operator
is the distributed generalization of "run it over a directory").

Operators:
- ``explode_archive`` — archive payloads → (member_name, member_idx,
  kind, payload, n_bytes) rows via ``mapInPandas`` (same fan-out shape as
  frame_sample: one input row → N output rows, no shuffle, no driver
  collect). Containers: zip (PK\\x03\\x04), gzip single-member
  (\\x1f\\x8b — a ``.tar.gz`` explodes into the tar's members), POSIX
  tar (ustar magic at offset 257). Non-archives pass through as a
  ``not_archive`` row (callers route them to convert directly); hostile
  archives isolate per blob into ``error: ...`` rows.
- ``synth_archive_media`` — deterministic archive corpus over doc ids
  (each doc's text wrapped as zip / gzip / tar rotating by doc_id), the
  fixture the driver oracle pins: extraction must recover EXACTLY the
  member bytes, so payload md5s are SQL-reconstructible.

Bomb hardening: member count, per-member size, and TOTAL decompressed
bytes are capped BEFORE/WHILE extracting (zip reports sizes up front but
they lie in hostile files — the cap is enforced on actual extracted
bytes too); breaches raise :class:`ArchiveError` → per-blob error rows.
"""
from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAX_MEMBERS = 4096
MAX_MEMBER_BYTES = 1 << 26
MAX_TOTAL_BYTES = 1 << 28


class ArchiveError(ValueError):
    """Malformed / hostile archive (the poison-pill contract)."""


def looks_like_zip(data: bytes) -> bool:
    return data[:4] == b"PK\x03\x04"


def looks_like_gzip(data: bytes) -> bool:
    return data[:2] == b"\x1f\x8b"


def looks_like_bzip2(data: bytes) -> bool:
    return data[:3] == b"BZh" and data[3:4].isdigit()


def looks_like_xz(data: bytes) -> bool:
    return data[:6] == b"\xfd7zXZ\x00"


def looks_like_tar(data: bytes) -> bool:
    return len(data) >= 263 and data[257:262] == b"ustar"


MEMBER_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("member_name", StringType()),
    StructField("member_idx", IntegerType()),
    StructField("kind", StringType()),
    StructField("payload", BinaryType()),
    StructField("n_bytes", LongType()),
    StructField("ok", StringType()),
])


def _zip_members(blob: bytes) -> list[tuple[str, bytes]]:
    import zipfile

    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        infos = zf.infolist()
    except Exception as exc:  # zipfile raises a zoo of types on bad input
        raise ArchiveError(f"bad zip: {exc}") from None
    if len(infos) > MAX_MEMBERS:
        raise ArchiveError(f"zip has {len(infos)} members (cap {MAX_MEMBERS})")
    out = []
    total = 0
    for info in infos:
        if not info.filename:
            # stdlib is_dir() IndexErrors on empty names (fuzz-found);
            # an unnamed member is malformed anyway
            raise ArchiveError("zip member with empty name")
        if info.filename.endswith("/"):
            continue
        if info.file_size > MAX_MEMBER_BYTES:
            raise ArchiveError(
                f"member {info.filename!r} declares {info.file_size} bytes")
        try:
            with zf.open(info) as f:
                # +1 so a lying header (actual > declared) is detectable
                data = f.read(MAX_MEMBER_BYTES + 1)
        except Exception as exc:
            raise ArchiveError(
                f"bad zip member {info.filename!r}: {exc}") from None
        if len(data) > MAX_MEMBER_BYTES:
            raise ArchiveError(f"member {info.filename!r} overran its size")
        total += len(data)
        if total > MAX_TOTAL_BYTES:
            raise ArchiveError("zip decompresses past the total cap")
        out.append((info.filename, data))
    return out


def _gzip_members(blob: bytes) -> list[tuple[str, bytes]]:
    import gzip

    try:
        with gzip.GzipFile(fileobj=io.BytesIO(blob)) as f:
            data = f.read(MAX_TOTAL_BYTES + 1)
    except Exception as exc:
        raise ArchiveError(f"bad gzip: {exc}") from None
    if len(data) > MAX_TOTAL_BYTES:
        raise ArchiveError("gzip decompresses past the total cap")
    if looks_like_tar(data):  # .tar.gz: explode the inner tar
        return _tar_members(data)
    name = "member"
    # FLG.FNAME with no FEXTRA → the original filename starts at byte 10
    if len(blob) > 10 and blob[3] & 0x08 and not blob[3] & 0x04:
        end = blob.find(b"\x00", 10)
        if 10 < end < 10 + 4096:
            try:
                name = blob[10:end].decode("latin-1")
            except Exception:  # pragma: no cover — latin-1 can't fail
                pass
    return [(name, data)]


def _stream_members(blob: bytes, opener, what: str) -> list[tuple[str, bytes]]:
    """Shared single-member/.tar.X logic for bzip2 and xz (gzip has its
    own path because of FNAME recovery)."""
    try:
        with opener(io.BytesIO(blob)) as f:
            data = f.read(MAX_TOTAL_BYTES + 1)
    except Exception as exc:
        raise ArchiveError(f"bad {what}: {exc}") from None
    if len(data) > MAX_TOTAL_BYTES:
        raise ArchiveError(f"{what} decompresses past the total cap")
    if looks_like_tar(data):
        return _tar_members(data)
    return [("member", data)]


def _bzip2_members(blob: bytes) -> list[tuple[str, bytes]]:
    import bz2

    return _stream_members(blob, bz2.BZ2File, "bzip2")


def _xz_members(blob: bytes) -> list[tuple[str, bytes]]:
    import lzma

    return _stream_members(blob, lzma.LZMAFile, "xz")


def _tar_members(blob: bytes) -> list[tuple[str, bytes]]:
    import tarfile

    try:
        tf = tarfile.open(fileobj=io.BytesIO(blob), mode="r:")
        members = tf.getmembers()
    except Exception as exc:
        raise ArchiveError(f"bad tar: {exc}") from None
    if len(members) > MAX_MEMBERS:
        raise ArchiveError(
            f"tar has {len(members)} members (cap {MAX_MEMBERS})")
    out = []
    total = 0
    for m in members:
        if not m.isfile():
            continue
        if m.size > MAX_MEMBER_BYTES:
            raise ArchiveError(f"member {m.name!r} declares {m.size} bytes")
        total += m.size
        if total > MAX_TOTAL_BYTES:
            raise ArchiveError("tar exceeds the total cap")
        try:
            f = tf.extractfile(m)
            data = f.read() if f else b""
        except Exception as exc:
            raise ArchiveError(f"bad tar member {m.name!r}: {exc}") from None
        out.append((m.name, data))
    return out


def explode_archive(media: DataFrame) -> DataFrame:
    """Archive payloads → one row per member, with the member's sniffed
    kind (the same content sniff the CLI uses, marky.go:29 parity) so the
    convert pipeline can route each member without trusting names."""
    from ..cli import sniff_kind

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                blob = bytes(payload) if payload is not None else b""
                try:
                    if looks_like_zip(blob):
                        members = _zip_members(blob)
                    elif looks_like_gzip(blob):
                        members = _gzip_members(blob)
                    elif looks_like_bzip2(blob):
                        members = _bzip2_members(blob)
                    elif looks_like_xz(blob):
                        members = _xz_members(blob)
                    elif looks_like_tar(blob):
                        members = _tar_members(blob)
                    else:
                        rows.append((ref, None, None, None, None, None,
                                     "not_archive"))
                        continue
                except ArchiveError as exc:
                    rows.append((ref, None, None, None, None, None,
                                 f"error: {exc}"))
                    continue
                except Exception as exc:  # noqa: BLE001 — poison isolation
                    rows.append((ref, None, None, None, None, None,
                                 f"error: {type(exc).__name__}: {exc}"))
                    continue
                for idx, (name, data) in enumerate(members):
                    kind = sniff_kind(name, data)
                    rows.append((ref, name, idx, kind, data, len(data),
                                 "ok"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEMBER_SCHEMA.fields])

    return media.select("media_ref", "payload").mapInPandas(
        batches, schema=MEMBER_SCHEMA)


_BINARY_KINDS = ("docx", "xlsx", "pptx", "epub", "pdf")


def members_to_docs(members: DataFrame) -> DataFrame:
    """Exploded ``ok`` member rows → the engine's INPUT_SCHEMA shape, so an
    archive corpus flows straight into :func:`marky_spark.convert.convert`:
    doc_id = ``<archive_ref>/<member_name>``, one span whose text is the
    member bytes — UTF-8 for textual kinds, base64 for the zip-container
    binary kinds (the same wire convention the binary kernels decode,
    kernels/base.decode_binary_payload). Entirely JVM-side: no Python, no
    shuffle — explode → convert is one fused stage chain."""
    from pyspark.sql import functions as F

    ok = members.where(F.col("ok") == "ok")
    is_binary = F.col("kind").isin(*_BINARY_KINDS)
    return ok.select(
        F.concat_ws("/", "media_ref", "member_name").alias("doc_id"),
        F.array(F.struct(
            F.coalesce(F.col("kind"), F.lit("unknown")).alias("kind"),
            F.when(is_binary, F.translate(F.base64("payload"), "\r\n", ""))
            .otherwise(F.decode("payload", "UTF-8")).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )).alias("spans"),
    )


def synth_archive_media(docs: DataFrame) -> DataFrame:
    """Deterministic archive corpus over doc ids: doc i's UTF-8 text
    wrapped as (i % 3) → zip (deflate) / gzip / tar, each with one member
    named ``doc<i>.txt``. Extraction must recover EXACTLY the text bytes,
    so the driver oracle pins all three container walks with
    ``md5(text)`` arithmetic and no archive library on the SQL side."""
    import gzip
    import tarfile
    import zipfile

    from .multimodal import MEDIA_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(doc_id)
                data = str(text).encode("utf-8")
                name = f"doc{i}.txt"
                buf = io.BytesIO()
                if i % 3 == 0:
                    with zipfile.ZipFile(buf, "w",
                                         zipfile.ZIP_DEFLATED) as zf:
                        # fixed date_time keeps the corpus deterministic
                        info = zipfile.ZipInfo(name, (2020, 1, 1, 0, 0, 0))
                        info.compress_type = zipfile.ZIP_DEFLATED
                        zf.writestr(info, data)
                    mime = "application/zip"
                elif i % 3 == 1:
                    with gzip.GzipFile(fileobj=buf, mode="wb",
                                       filename=name, mtime=0) as gz:
                        gz.write(data)
                    mime = "application/gzip"
                else:
                    with tarfile.open(fileobj=buf, mode="w") as tf:
                        ti = tarfile.TarInfo(name)
                        ti.size = len(data)
                        ti.mtime = 0
                        tf.addfile(ti, io.BytesIO(data))
                    mime = "application/x-tar"
                rows.append((f"z{i}", mime, buf.getvalue()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return docs.select("doc_id", "text").mapInPandas(
        batches, schema=MEDIA_SCHEMA)
