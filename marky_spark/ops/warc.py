"""WARC columns: Common-Crawl-style web-archive blobs → per-record rows.

WARC (ISO 28500) is THE container web-scale training corpora are
distributed in (Common Crawl ships every crawl as gzipped WARCs), so a
100 TB text pipeline's very first operator is a WARC record walk. The
reference converts one document at a time (marky.go:29-41); this is the
distributed front door that turns crawl archives into those documents.

Implemented from the public WARC 1.0/1.1 grammar:

- ``warc_records`` — WARC payloads → one row per record: version,
  WARC-Type, WARC-Target-URI, Content-Type, the payload bytes, and for
  ``response`` records the HTTP body split off from its status/header
  block (the part a text pipeline actually wants). Gzipped WARCs
  (member-per-record or whole-file, both appear in the wild) are
  inflated first. ``mapInPandas`` fan-out — no shuffle, no driver
  collect, same shape as explode_archive.
- ``synth_warc_media`` — deterministic WARC corpus over doc ids: each
  doc's text becomes the HTTP body of one ``response`` record (plus a
  ``warcinfo`` header record), so the driver oracle pins the record
  walk, header parse, Content-Length math, and HTTP-body split with
  ``md5(text)`` arithmetic and no WARC library on the SQL side.

Hostile input: record count and size caps, strict Content-Length
accounting (a record that overruns its declared length or is missing
its CRLF-CRLF terminator is malformed), typed :class:`WarcError` →
per-blob error rows.
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

MAX_RECORDS = 65536
MAX_RECORD_BYTES = 1 << 26
MAX_TOTAL_BYTES = 1 << 28


class WarcError(ValueError):
    """Malformed / hostile WARC input (the poison-pill contract)."""


def looks_like_warc(data: bytes) -> bool:
    """Prefix sniff; for gzip inputs inflate ONLY the first five bytes
    (DEFLATE literals are not byte-aligned, so searching the compressed
    stream for the magic would be meaningless)."""
    if data[:5] == b"WARC/":
        return True
    if data[:2] == b"\x1f\x8b":
        import gzip

        try:
            with gzip.GzipFile(fileobj=io.BytesIO(data)) as f:
                return f.read(5) == b"WARC/"
        except Exception:  # noqa: BLE001 — sniffing never raises
            return False
    return False


RECORD_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("record_idx", IntegerType()),
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("content_type", StringType()),
    StructField("http_status", IntegerType()),
    StructField("payload", BinaryType()),
    StructField("n_bytes", LongType()),
    StructField("ok", StringType()),
])


def _parse_records(data: bytes) -> list[dict]:
    """Raw (non-gzip) WARC bytes → list of record dicts."""
    records: list[dict] = []
    pos = 0
    n = len(data)
    total = 0
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if len(records) >= MAX_RECORDS:
            raise WarcError(f"more than {MAX_RECORDS} records")
        eol = data.find(b"\r\n", pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            raise WarcError(f"record {len(records)}: missing WARC/ version")
        version = data[pos:eol].decode("ascii", "replace")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise WarcError("truncated record header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line ends the header block
            if b":" not in line:
                raise WarcError(f"bad WARC header line {line[:40]!r}")
            k, v = line.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise WarcError("record lacks a numeric Content-Length") from None
        if length < 0 or length > MAX_RECORD_BYTES:
            raise WarcError(f"record declares {length} bytes")
        total += length
        if total > MAX_TOTAL_BYTES:
            raise WarcError("records exceed the total cap")
        block = data[pos:pos + length]
        if len(block) != length:
            raise WarcError("record block overruns the stream")
        pos += length
        if data[pos:pos + 4] != b"\r\n\r\n":
            raise WarcError("record not terminated by CRLF CRLF")
        pos += 4
        records.append({
            "version": version,
            "type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "block": block,
        })
    if not records:
        raise WarcError("stream has no WARC records")
    return records


def _split_http(block: bytes) -> tuple[int | None, bytes]:
    """An application/http block → (status code, body). Returns
    (None, block) when the block is not an HTTP message."""
    if not block.startswith(b"HTTP/"):
        return None, block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, block
    status_line = block[:block.find(b"\r\n")].split(b" ")
    status = None
    if len(status_line) >= 2 and status_line[1].isdigit():
        status = int(status_line[1])
    return status, block[sep + 4:]


def warc_records(media: DataFrame) -> DataFrame:
    """WARC payloads → one row per record; ``response`` records carry the
    HTTP body as ``payload`` (status split into ``http_status``), other
    record types carry their raw block."""
    import gzip

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                blob = bytes(payload) if payload is not None else b""
                try:
                    if blob[:2] == b"\x1f\x8b":
                        # whole-file OR member-per-record gzip: a multi-
                        # member stream concatenates transparently
                        with gzip.GzipFile(fileobj=io.BytesIO(blob)) as f:
                            blob = f.read(MAX_TOTAL_BYTES + 1)
                        if len(blob) > MAX_TOTAL_BYTES:
                            raise WarcError("gzip exceeds the total cap")
                    if not blob.startswith(b"WARC/"):
                        rows.append((ref, None, None, None, None, None,
                                     None, None, "not_warc"))
                        continue
                    records = _parse_records(blob)
                except WarcError as exc:
                    rows.append((ref, None, None, None, None, None,
                                 None, None, f"error: {exc}"))
                    continue
                except Exception as exc:  # noqa: BLE001 — poison isolation
                    rows.append((ref, None, None, None, None, None, None,
                                 None, f"error: {type(exc).__name__}: {exc}"))
                    continue
                for idx, rec in enumerate(records):
                    body = rec["block"]
                    status = None
                    ctype = rec["content_type"] or ""
                    if rec["type"] in ("response", "request") and \
                            ctype.startswith("application/http"):
                        status, body = _split_http(rec["block"])
                    rows.append((ref, idx, rec["type"], rec["uri"],
                                 ctype or None, status, body, len(body),
                                 "ok"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RECORD_SCHEMA.fields])

    return media.select("media_ref", "payload").mapInPandas(
        batches, schema=RECORD_SCHEMA)


def records_to_docs(records: DataFrame) -> DataFrame:
    """``response`` record rows → the engine's INPUT_SCHEMA shape, so a
    crawl archive flows straight into marky_spark.convert.convert:
    doc_id = the record's target URI (the natural crawl key), one span
    whose kind is sniffed from the HTTP body by the same content sniff
    the CLI uses (never trusting Content-Type headers — crawls lie).
    Arrow-batched mapInPandas for the sniff (it needs the body bytes);
    no shuffle, no driver collect."""
    from ..cli import sniff_kind

    out_schema = StructType([
        StructField("media_ref", StringType()),
        StructField("doc_id", StringType()),
        StructField("kind", StringType()),
        StructField("text", StringType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, uri, payload in zip(pdf["media_ref"],
                                         pdf["target_uri"], pdf["payload"]):
                body = bytes(payload) if payload is not None else b""
                kind = sniff_kind(uri or "", body) or "unknown"
                rows.append((ref, uri or f"{ref}/record",
                             kind, body.decode("utf-8", "replace")))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields])

    from pyspark.sql import functions as F

    ok = records.where((F.col("ok") == "ok")
                       & (F.col("warc_type") == "response"))
    docs = ok.select("media_ref", "target_uri", "payload").mapInPandas(
        batches, schema=out_schema)
    return docs.select(
        "doc_id",
        F.array(F.struct(
            F.col("kind"),
            F.col("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )).alias("spans"),
    )


def synth_warc_media(docs: DataFrame) -> DataFrame:
    """Deterministic WARC corpus over doc ids: per doc, a ``warcinfo``
    record plus one ``response`` record whose HTTP body is the doc's text,
    gzip-wrapped for odd doc ids (both wild shapes). Record ids derive
    from the doc id, so the blobs are byte-deterministic and every field
    the driver oracle checks is doc-id arithmetic."""
    import gzip

    from .multimodal import MEDIA_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(doc_id)
                body = str(text).encode("utf-8")
                info = b"software: marky-spark-synth\r\n"
                rec0 = (b"WARC/1.0\r\n"
                        b"WARC-Type: warcinfo\r\n"
                        + f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n".encode()
                        + f"Content-Length: {len(info)}\r\n\r\n".encode()
                        + info + b"\r\n\r\n")
                http = (b"HTTP/1.1 200 OK\r\n"
                        b"Content-Type: text/plain\r\n\r\n" + body)
                rec1 = (b"WARC/1.0\r\n"
                        b"WARC-Type: response\r\n"
                        + f"WARC-Target-URI: http://synth/{i}\r\n".encode()
                        + b"Content-Type: application/http;msgtype=response\r\n"
                        + f"Content-Length: {len(http)}\r\n\r\n".encode()
                        + http + b"\r\n\r\n")
                blob = rec0 + rec1
                if i % 2:
                    buf = io.BytesIO()
                    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                        gz.write(blob)
                    blob = buf.getvalue()
                # 'wc' prefix: keeps the synthetic WARC namespace disjoint
                # from synth_wav_media's 'w{i}' audio refs, so future
                # unions of synthetic media tables can't collide
                rows.append((f"wc{i}", "application/warc", blob))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return docs.select("doc_id", "text").mapInPandas(
        batches, schema=MEDIA_SCHEMA)
