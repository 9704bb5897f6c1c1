"""MBOX streaming front door — a mail archive becomes one doc per
message, the same bounded-memory contract as ops/warc.

Mail corpora ship as mbox files (one file, many RFC 5322 messages,
``From `` separator lines — RFC 4155).  The reference converts single
documents (marky.go:27-41); this module is the crawl-scale ingest that
feeds its EML kernel (kernels/emlk), mirroring warc_records_from_dir:

- messages parse ONE AT A TIME from a buffered line stream (transparent
  gzip); peak memory is O(message), never O(file),
- per-message 64 MiB cap + a message-count cap (poison-pill bombs get
  typed rows, not OOM),
- the mboxrd quoting convention un-escapes ``>From `` body lines (one
  ``>`` stripped from ``>+From `` at line start),
- mid-stream corruption SALVAGES the valid prefix: the messages already
  parsed survive, ONE typed error row marks the truncation point,
- ``mbox_messages_from_dir`` lists (path, length) via binaryFile with
  the content column pruned — workers stream their own files,
- ``messages_to_docs`` shapes rows into INPUT_SCHEMA (kind ``eml``) so
  an archive flows straight into marky_spark.convert.convert, with
  ``include_drops=True`` emitting ``_drop_mbox`` markers so the metrics
  sink accounts for everything the run skipped.
"""
from __future__ import annotations

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

MAX_MESSAGE_BYTES = 1 << 26     # 64 MiB per message
MAX_MESSAGES = 1 << 20          # per file
CHUNK_ROWS = 8192
CHUNK_BYTES = 32 << 20


class MboxError(ValueError):
    """Malformed / hostile mbox input."""


MESSAGE_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("msg_idx", IntegerType()),
    StructField("from_line", StringType()),
    StructField("payload", BinaryType()),
    StructField("n_bytes", LongType()),
    StructField("ok", StringType()),
])


def _open_stream(f):
    import gzip

    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=f)
    return f


MAX_LINE_BYTES = 1 << 20        # bounded readline: a single multi-GB
                                # physical line cannot buffer whole


def _bounded_lines(stream) -> Iterator[tuple[bytes, bool]]:
    """→ (fragment, at_line_start) pairs; fragments cap at
    MAX_LINE_BYTES so one enormous line streams in pieces."""
    at_start = True
    while True:
        chunk = stream.readline(MAX_LINE_BYTES)
        if not chunk:
            return
        yield chunk, at_start
        at_start = chunk.endswith(b"\n")


def _iter_messages(stream) -> Iterator[tuple[str, bytes]]:
    """Bounded-line mbox walk → (from_line, message_bytes) pairs.
    Memory is bounded by MAX_MESSAGE_BYTES regardless of file size;
    the ``From `` separator and mboxrd unescape apply only at true
    line starts (mid-line fragments of an oversized line never
    misparse as separators)."""
    from_line: str | None = None
    buf: list[bytes] = []
    size = 0
    count = 0
    saw_any = False

    def finish():
        return from_line or "", b"".join(buf)

    for line, at_start in _bounded_lines(stream):
        if at_start and line.startswith(b"From "):
            if from_line is not None:
                count += 1
                if count > MAX_MESSAGES:
                    raise MboxError(f"more than {MAX_MESSAGES} messages")
                yield finish()
            from_line = line.rstrip(b"\r\n").decode("utf-8", "replace")
            buf, size = [], 0
            saw_any = True
            continue
        if from_line is None:
            if line.strip():
                raise MboxError("mbox does not start with a From line")
            continue
        # mboxrd: a body line quoted as '>From ' (any number of leading
        # '>' before 'From ') loses ONE '>'
        if at_start:
            stripped = line.lstrip(b">")
            if stripped.startswith(b"From ") and line.startswith(b">"):
                line = line[1:]
        size += len(line)
        if size > MAX_MESSAGE_BYTES:
            raise MboxError(
                f"message exceeds the {MAX_MESSAGE_BYTES}-byte cap")
        buf.append(line)
    if from_line is not None:
        yield finish()
    elif not saw_any:
        raise MboxError("empty or non-mbox stream")


def _stream_rows(ref: str, raw) -> Iterator[list[tuple]]:
    rows: list[tuple] = []
    nbytes = 0
    idx = 0
    try:
        stream = _open_stream(raw)
        for from_line, payload in _iter_messages(stream):
            rows.append((ref, idx, from_line, payload,
                         len(payload), "ok"))
            idx += 1
            nbytes += len(payload)
            if len(rows) >= CHUNK_ROWS or nbytes >= CHUNK_BYTES:
                yield rows
                rows, nbytes = [], 0
    except MboxError as exc:
        rows.append((ref, idx if idx else None, None, None, None,
                     f"error: {exc}"))
    except Exception as exc:  # noqa: BLE001 — poison isolation
        rows.append((ref, idx if idx else None, None, None, None,
                     f"error: {type(exc).__name__}: {exc}"))
    if rows:
        yield rows


def _to_pdf(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(rows,
                        columns=[f.name for f in MESSAGE_SCHEMA.fields])


def mbox_messages_from_dir(spark, path: str,
                           glob: str = "*.mbox*") -> DataFrame:
    """A directory of mbox / mbox.gz files → message rows, streaming
    (only (path, length) rides through Spark; workers open their own
    files — the warc_records_from_dir shape)."""
    from .warc import _local_path, list_binary_files

    files = list_binary_files(spark, path, glob=glob)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for uri in pdf["path"]:
                try:
                    local = _local_path(str(uri))
                    f = open(local, "rb")  # noqa: SIM115 — closed below
                except OSError as exc:
                    yield _to_pdf([(str(uri), None, None, None, None,
                                    f"error: {exc}")])
                    continue
                with f:
                    for rows in _stream_rows(str(uri), f):
                        yield _to_pdf(rows)

    n = max(spark.sparkContext.defaultParallelism * 2, 1)
    return files.repartition(n).mapInPandas(
        batches, schema=MESSAGE_SCHEMA)


def messages_to_docs(messages: DataFrame,
                     include_drops: bool = False) -> DataFrame:
    """Message rows → INPUT_SCHEMA docs: doc_id = ``{file}#{idx}``, one
    ``eml`` span carrying the raw message text.  ``include_drops=True``
    emits ``_drop_mbox`` marker docs for non-ok rows so the metrics sink
    accounts for every skipped file/truncation."""
    from ..schema import INPUT_SCHEMA  # the shared doc shape

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, idx, payload, ok in zip(
                    pdf["media_ref"], pdf["msg_idx"], pdf["payload"],
                    pdf["ok"]):
                if ok != "ok":
                    if include_drops:
                        rows.append((f"{ref}#drop",
                                     [("_drop_mbox", str(ok), "", 0)]))
                    continue
                text = bytes(payload).decode("utf-8", "replace")
                rows.append((f"{ref}#{int(idx)}",
                             [("eml", text, "", 0)]))
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    cols = messages.select("media_ref", "msg_idx", "payload", "ok")
    return cols.mapInPandas(batches, schema=INPUT_SCHEMA)
