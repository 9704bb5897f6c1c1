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
  inflated INCREMENTALLY. ``mapInPandas`` fan-out — no shuffle, no
  driver collect, same shape as explode_archive.
- ``warc_records_from_dir`` — the file front door: a directory of real
  ``.warc`` / ``.warc.gz`` files → the same record rows, reading each
  file as a STREAM so memory stays bounded per record no matter how
  large the file (a ~1 GiB Common Crawl WARC never materializes).
- ``synth_warc_media`` — deterministic WARC corpus over doc ids: each
  doc's text becomes the HTTP body of one ``response`` record (plus a
  ``warcinfo`` header record), so the driver oracle pins the record
  walk, header parse, Content-Length math, and HTTP-body split with
  ``md5(text)`` arithmetic and no WARC library on the SQL side.

Memory model (the 100 TB contract): records are parsed one at a time
from a buffered stream and emitted in bounded pandas chunks — peak
memory is O(MAX_RECORD_BYTES + chunk), never O(file). Malformed input
mid-stream yields STREAM-TRUNCATION semantics: records before the
failure are kept (a crawl salvages its valid prefix) and one trailing
``error: ...`` row marks the truncation point; hostile streams hit the
per-record size cap, the header-block cap, the record-count cap, or the
cumulative :data:`MAX_STREAM_BYTES` DoS guard — all typed
:class:`WarcError`.
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

MAX_RECORDS = 1 << 20           # per stream (a 1 GiB crawl WARC has ~50k)
MAX_RECORD_BYTES = 1 << 26      # 64 MiB: the per-record memory bound
MAX_HEADER_BYTES = 1 << 16      # a record's entire named-header block
MAX_STREAM_BYTES = 1 << 34      # 16 GiB cumulative: decompression-bomb guard
CHUNK_ROWS = 8192               # rows per emitted pandas batch
CHUNK_BYTES = 1 << 25           # ... or 32 MiB of payload, whichever first


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


def _open_stream(f):
    """Seekable raw stream → record stream (transparent gzip). A gzip
    stream with multiple members (Common Crawl's record-per-member
    layout) concatenates transparently under GzipFile."""
    import gzip

    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=f)
    return f


def _iter_records(stream) -> Iterator[dict]:
    """Buffered binary stream → record dicts, ONE AT A TIME. Memory is
    bounded by MAX_RECORD_BYTES regardless of stream length; cumulative
    output is bounded by MAX_STREAM_BYTES (decompression-bomb guard)."""
    n_records = 0
    total = 0
    while True:
        line = stream.readline(MAX_HEADER_BYTES + 1)
        while line in (b"\r\n", b"\n"):  # inter-record blank lines
            line = stream.readline(MAX_HEADER_BYTES + 1)
        if not line:
            break
        if n_records >= MAX_RECORDS:
            raise WarcError(f"more than {MAX_RECORDS} records")
        if not line.startswith(b"WARC/") or not line.endswith(b"\r\n"):
            raise WarcError(f"record {n_records}: missing WARC/ version")
        version = line[:-2].decode("ascii", "replace")
        headers: dict[str, str] = {}
        header_bytes = len(line)
        while True:
            line = stream.readline(MAX_HEADER_BYTES + 1)
            if not line.endswith(b"\r\n"):
                raise WarcError("truncated record header block")
            header_bytes += len(line)
            if header_bytes > MAX_HEADER_BYTES:
                raise WarcError("record header block exceeds the cap")
            body = line[:-2]
            if not body:
                break  # blank line ends the header block
            if b":" not in body:
                raise WarcError(f"bad WARC header line {body[:40]!r}")
            k, v = body.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise WarcError("record lacks a numeric Content-Length") from None
        if length < 0 or length > MAX_RECORD_BYTES:
            raise WarcError(f"record declares {length} bytes")
        total += length
        if total > MAX_STREAM_BYTES:
            raise WarcError("records exceed the stream cap")
        block = stream.read(length)
        if len(block) != length:
            raise WarcError("record block overruns the stream")
        if stream.read(4) != b"\r\n\r\n":
            raise WarcError("record not terminated by CRLF CRLF")
        n_records += 1
        yield {
            "version": version,
            "type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "block": block,
        }
    if n_records == 0:
        raise WarcError("stream has no WARC records")


def _parse_records(data: bytes) -> list[dict]:
    """Whole-blob convenience (tests / small inputs): bytes → record
    dicts via the same streaming iterator, transparent gzip."""
    return list(_iter_records(_open_stream(io.BytesIO(data))))


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


def _record_row(ref: str, idx: int, rec: dict) -> tuple:
    body = rec["block"]
    status = None
    ctype = rec["content_type"] or ""
    if rec["type"] in ("response", "request") and \
            ctype.startswith("application/http"):
        status, body = _split_http(rec["block"])
    return (ref, idx, rec["type"], rec["uri"], ctype or None, status,
            body, len(body), "ok")


def _stream_rows(ref: str, raw) -> Iterator[list[tuple]]:
    """One WARC stream → bounded row chunks. Mid-stream failure keeps
    the valid prefix (crawl salvage) and appends ONE truncation row."""
    rows: list[tuple] = []
    nbytes = 0
    idx = 0
    try:
        stream = _open_stream(raw)
        for rec in _iter_records(stream):
            rows.append(_record_row(ref, idx, rec))
            idx += 1
            nbytes += len(rec["block"])
            if len(rows) >= CHUNK_ROWS or nbytes >= CHUNK_BYTES:
                yield rows
                rows, nbytes = [], 0
    except WarcError as exc:
        rows.append((ref, idx if idx else None, None, None, None, None,
                     None, None, f"error: {exc}"))
    except Exception as exc:  # noqa: BLE001 — poison isolation
        rows.append((ref, idx if idx else None, None, None, None, None,
                     None, None, f"error: {type(exc).__name__}: {exc}"))
    if rows:
        yield rows


def _to_pdf(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=[f.name for f in RECORD_SCHEMA.fields])


def warc_records(media: DataFrame) -> DataFrame:
    """WARC payloads → one row per record; ``response`` records carry the
    HTTP body as ``payload`` (status split into ``http_status``), other
    record types carry their raw block. Records stream out in bounded
    chunks — a blob with 50k records never materializes 50k rows at
    once on the Python side."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                blob = bytes(payload) if payload is not None else b""
                if not looks_like_warc(blob):
                    yield _to_pdf([(ref, None, None, None, None, None,
                                    None, None, "not_warc")])
                    continue
                for rows in _stream_rows(ref, io.BytesIO(blob)):
                    yield _to_pdf(rows)

    return media.select("media_ref", "payload").mapInPandas(
        batches, schema=RECORD_SCHEMA)


def _local_path(uri: str) -> str:
    """binaryFile path URIs → worker-openable paths. Plain and file:
    schemes open directly (POSIX / NFS / fuse mounts — the common
    cluster layouts); other schemes (s3a://, hdfs://) would go through
    an fsspec-style client and are rejected typed here."""
    if uri.startswith("file:"):
        path = uri[5:]
        while path.startswith("//"):  # file:///x and file://host/x forms
            path = path[1:]
        return path
    if "://" in uri:
        raise WarcError(f"unsupported path scheme for streaming: {uri!r}")
    return uri


def list_binary_files(spark, path: str, glob: str | None = None,
                      recursive: bool = True) -> DataFrame:
    """Directory → (path, length) listing via the binaryFile source with
    the CONTENT COLUMN PRUNED — Spark's binaryFile reader only loads
    ``content`` when selected, so this is a pure metadata listing no
    matter how large the files are. The scale path: list centrally,
    fan file paths out to workers, stream each file worker-side."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path).select("path", "length")


def warc_records_from_dir(spark, path: str,
                          glob: str = "*.warc*") -> DataFrame:
    """A directory of real ``.warc`` / ``.warc.gz`` files → record rows.

    The true streaming front door: only (path, length) rides through
    Spark; each worker opens its file and iterates records with
    O(record) memory, so a ~1 GiB compressed / multi-GiB raw Common
    Crawl file ingests without ever being held whole. One file = one
    task (the listing is repartitioned by path) so big crawls spread
    across the cluster."""
    files = list_binary_files(spark, path, glob=glob)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for uri in pdf["path"]:
                try:
                    local = _local_path(str(uri))
                    f = open(local, "rb")  # noqa: SIM115 — closed below
                except (WarcError, OSError) as exc:
                    yield _to_pdf([(str(uri), None, None, None, None, None,
                                    None, None, f"error: {exc}")])
                    continue
                with f:
                    for rows in _stream_rows(str(uri), f):
                        yield _to_pdf(rows)

    # round-robin the FILE LIST (hashing paths would distribute
    # binomially); 2 tasks/core so a slow file doesn't straggle the wave
    n = max(spark.sparkContext.defaultParallelism * 2, 1)
    return files.repartition(n).mapInPandas(
        batches, schema=RECORD_SCHEMA)


def records_to_docs(records: DataFrame,
                    include_drops: bool = False) -> DataFrame:
    """``response`` record rows → the engine's INPUT_SCHEMA shape, so a
    crawl archive flows straight into marky_spark.convert.convert:
    doc_id = the record's target URI (the natural crawl key), one span
    whose kind is sniffed from the HTTP body by the same content sniff
    the CLI uses (never trusting Content-Type headers — crawls lie).
    Arrow-batched mapInPandas for the sniff (it needs the body bytes);
    no shuffle, no driver collect.

    ``include_drops=True`` additionally emits one ``_drop_warc`` marker
    doc per non-ok row (truncation / not-WARC), which convert turns into
    an error row — so the job's metrics sink accounts for every record
    the walk could not produce (nothing dropped silently)."""
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
    out = docs.select(
        "doc_id",
        F.array(F.struct(
            F.col("kind"),
            F.col("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )).alias("spans"),
    )
    if include_drops:
        drops = records.where(F.col("ok") != "ok").select(
            F.concat(F.col("media_ref"), F.lit("#drop")).alias("doc_id"),
            F.array(F.struct(
                F.lit("_drop_warc").alias("kind"),
                F.col("ok").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )).alias("spans"),
        )
        out = out.unionByName(drops)
    return out


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
