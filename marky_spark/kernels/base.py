"""Kernel output model shared by all format converters.

A converter kernel takes one source payload (the ``text`` of an input span)
and returns an ordered list of output *segments* ``(kind, text, media_ref)``:

- ``kind='markdown'`` — a run of converted Markdown text (``media_ref=''``)
- ``kind='image'``    — an image placeholder; ``text`` is the exact inline
  Markdown the reference would emit (``![alt](target)``) and ``media_ref`` is
  the opaque reference (src URL / zip member / data-URI), preserved verbatim
  per the BASELINE.json input_hint ("media placeholders survive conversion").

Concatenating ``text`` over all segments of one payload reproduces the
reference's Markdown string for that payload byte-for-byte; splitting at
images is lossless by construction.

Kernels raise :class:`ConvertError` on invalid input; the Spark layer maps
that to a ``status='error'`` row (poison-pill isolation, never a task
failure) — reference analogue: the error return of marky.go:41.
"""

from __future__ import annotations

import base64
import binascii

Segment = tuple[str, str, str]

MARKDOWN = "markdown"
IMAGE = "image"


class ConvertError(Exception):
    """Per-document conversion failure (becomes a status='error' row)."""


_LOCAL_CACHE: dict[str, str] = {}


def local_name(tag: str) -> str:
    """Strip the '{ns}' prefix from an ElementTree tag. Memoized (bounded):
    the OOXML/EPUB tag vocabulary is small and the kernels dispatch on
    localname in their hottest walks."""
    loc = _LOCAL_CACHE.get(tag)
    if loc is None:
        loc = tag.rsplit("}", 1)[-1]
        if len(_LOCAL_CACHE) < 4096:  # bound executor-lifetime growth
            _LOCAL_CACHE[tag] = loc
    return loc


def md(text: str) -> Segment:
    return (MARKDOWN, text, "")


def image(text: str, media_ref: str) -> Segment:
    return (IMAGE, text, media_ref)


def merge_markdown(segments: list[Segment]) -> list[Segment]:
    """Coalesce adjacent markdown segments; drop empty markdown runs.

    Buffered join, not pairwise concatenation — a mega-document collapsing
    tens of thousands of segments into one would otherwise go quadratic."""
    out: list[Segment] = []
    buf: list[str] = []
    for seg in segments:
        if seg[0] == MARKDOWN:
            if seg[1]:
                buf.append(seg[1])
            continue
        if buf:
            out.append((MARKDOWN, "".join(buf), ""))
            buf = []
        out.append(seg)
    if buf:
        out.append((MARKDOWN, "".join(buf), ""))
    return out


def segments_text(segments: list[Segment]) -> str:
    """The reference's Markdown string = concatenation of segment texts."""
    return "".join(s[1] for s in segments)


def decode_binary_payload(text: str) -> bytes:
    """Binary formats (docx/xlsx/pptx/epub/pdf) travel base64-encoded in the
    span ``text`` field (the input table is all-string per the reference's
    type system, SURVEY.md §1.2)."""
    try:
        return base64.b64decode(text, validate=True)
    except (binascii.Error, ValueError) as exc:
        raise ConvertError(f"invalid base64 payload: {exc}") from exc
