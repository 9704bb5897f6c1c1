"""Multimodal columns: opaque binary payloads + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, ``mapInPandas`` signatures; the codec step is STUBBED because
the sandbox has no image/audio libraries. ``decoder=`` accepts a real codec
(e.g. PIL-based) in production; the default deterministic fake derives
"decoded" metadata from the payload bytes so tests pin the full dataflow.

Operators:
- ``attach_media``      — documents × media side-table join (broadcast)
- ``decode_media``      — binary → (width, height, channels, ok) per blob
- ``frame_sample``      — "video" payloads → N evenly-spaced frame rows
- ``media_features``    — fixed-width float feature vector per blob
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),
])

DECODED_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("ok", StringType()),
])


def _real_decode(payload: bytes, mime: str) -> tuple[int, int, int]:
    """Real codec hook — not available in this sandbox (no PIL/ffmpeg).

    Production: swap in a PIL/torchvision/pyav decoder here; everything
    around it (batching, schema, partitioning) is already exercised.
    """
    raise NotImplementedError("image/audio codecs not present in sandbox")


def fake_decode(payload: bytes, mime: str) -> tuple[int, int, int]:
    """Deterministic stand-in: metadata derived from a payload digest."""
    digest = hashlib.md5(payload or b"").digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    channels = 1 + digest[2] % 3
    return width, height, channels


Decoder = Callable[[bytes, str], tuple[int, int, int]]


def decode_media(media: DataFrame,
                 decoder: Decoder = fake_decode) -> DataFrame:
    """Arrow-batched decode: binary column in, typed metadata out."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, mime, payload in zip(pdf["media_ref"], pdf["mime"],
                                          pdf["payload"]):
                blob = bytes(payload) if payload is not None else b""
                try:
                    w, h, c = decoder(blob, mime or "")
                    rows.append((ref, mime, w, h, c, len(blob), "ok"))
                except NotImplementedError:
                    rows.append((ref, mime, None, None, None, len(blob),
                                 "codec_unavailable"))
                except Exception as exc:  # noqa: BLE001 — poison isolation
                    rows.append((ref, mime, None, None, None, len(blob),
                                 f"error: {exc}"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_offset", LongType()),
    StructField("frame_bytes", BinaryType()),
])


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Video' payloads → N evenly spaced frame records (one input row fans
    out to N output rows — the mapInPandas shape a real ffmpeg sampler has).
    Frame extraction itself is the stubbed codec: frames are byte slices."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                blob = bytes(payload) if payload is not None else b""
                if not blob:
                    continue
                step = max(len(blob) // n_frames, 1)
                for i in range(min(n_frames, len(blob))):
                    off = i * step
                    rows.append((ref, i, off, blob[off:off + step]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.select("media_ref", "payload").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


RESIZED_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("in_width", IntegerType()),
    StructField("in_height", IntegerType()),
    StructField("payload", BinaryType()),
    StructField("ok", StringType()),
])


def _real_resize(payload: bytes, mime: str,
                 width: int, height: int) -> bytes:
    """Real resize hook — sandbox has no PIL/ffmpeg (see _real_decode)."""
    raise NotImplementedError("image codecs not present in sandbox")


def fake_resize(payload: bytes, mime: str, width: int, height: int) -> bytes:
    """Deterministic stand-in: an ASCII pseudo-bitmap of exactly
    width×height bytes derived from the payload digest (content-addressed,
    so downstream dedup/caching over resized media behaves realistically,
    and the construction is reproducible in ANSI SQL for the oracle)."""
    h = hashlib.md5(payload or b"").hexdigest()
    n = width * height
    return (h * (-(-n // len(h))))[:n].encode("ascii")


Resizer = Callable[[bytes, str, int, int], bytes]


def resize_media(media: DataFrame, width: int = 32, height: int = 32,
                 decoder: Decoder = fake_decode,
                 resizer: Resizer = fake_resize) -> DataFrame:
    """Arrow-batched resize: binary payload in, (target-dim payload +
    source dims) out; codec failures isolate per blob (ok column)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, mime, payload in zip(pdf["media_ref"], pdf["mime"],
                                          pdf["payload"]):
                blob = bytes(payload) if payload is not None else b""
                try:
                    in_w, in_h, _ = decoder(blob, mime or "")
                    out = resizer(blob, mime or "", width, height)
                    rows.append((ref, width, height, in_w, in_h, out, "ok"))
                except NotImplementedError:
                    rows.append((ref, width, height, None, None, None,
                                 "codec_unavailable"))
                except Exception as exc:  # noqa: BLE001 — poison isolation
                    rows.append((ref, width, height, None, None, None,
                                 f"error: {exc}"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("features", ArrayType(FloatType())),
])


def media_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Fixed-width feature vector per blob (deterministic digest-based fake;
    production swaps in a real embedding model via the same batch shape)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                blob = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(blob).digest()
                vec = [(digest[i % 32] - 128) / 128.0 for i in range(dim)]
                rows.append((ref, vec))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return media.select("media_ref", "payload").mapInPandas(
        batches, schema=FEATURES_SCHEMA
    )


def attach_media(docs_out: DataFrame, media: DataFrame,
                 broadcast: bool = False) -> DataFrame:
    """Join conversion output's image spans to the media side-table.

    Strategy is left to AQE by default: an unconditional broadcast hint
    would materialize the whole media table (binary payloads!) on the
    driver and every executor when it is large. Pass ``broadcast=True``
    only when the caller KNOWS the table is small; at 100 TB both sides
    are bucketed on media_ref and the join is shuffle-free (Iceberg
    bucket transform on both tables)."""
    spans = (
        docs_out.select("doc_id", F.explode("out_spans").alias("s"))
        .where(F.col("s.kind") == "image")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )
    right = F.broadcast(media) if broadcast else media
    return spans.join(right, "media_ref", "left")
