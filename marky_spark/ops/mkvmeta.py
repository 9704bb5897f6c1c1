"""Matroska / WebM metadata walk — decode-free video triage (EBML).

WebM is the other major web video container (every <video> fallback,
yt-dlp output, WebRTC recordings).  Same triage design as
ops/mp4meta: duration / tracks / codecs / dimensions from the
container alone, no sample decode.

Written from the public Matroska specification (IETF cellar drafts /
RFC 8794 EBML):

- EBML variable-length integers: element IDs keep their length-marker
  bit, sizes strip it; the all-ones size means "unknown" (streamed
  files — treated as extends-to-enclosure),
- the EBML header's DocType (webm / matroska) is the brand,
- ``Segment > Info``: TimestampScale (default 1,000,000 ns) +
  Duration (4- or 8-byte FLOAT, in timestamp units) → duration_ms,
- ``Segment > Tracks > TrackEntry``: TrackType (1 video / 2 audio),
  CodecID (V_VP9, V_AV1, A_OPUS, …), ``Video > PixelWidth /
  PixelHeight``,
- bounds: element-count and nesting caps → typed :class:`MkvError`,
  and the walk seeks instead of allocating payloads.

``build_mkv`` assembles a minimal conformant EBML tree for the synth
corpus so the driver SQL oracle pins the vint math and element walk
from doc_id arithmetic.
"""
from __future__ import annotations

import struct

MAX_ELEMENTS = 65536

EBML_MAGIC = b"\x1a\x45\xdf\xa3"

_ID_SEGMENT = 0x18538067
_ID_INFO = 0x1549A966
_ID_TIMESCALE = 0x2AD7B1
_ID_DURATION = 0x4489
_ID_TRACKS = 0x1654AE6B
_ID_TRACKENTRY = 0xAE
_ID_TRACKTYPE = 0x83
_ID_CODECID = 0x86
_ID_VIDEO = 0xE0
_ID_PIXELW = 0xB0
_ID_PIXELH = 0xBA
_ID_DOCTYPE = 0x4282


class MkvError(ValueError):
    """Malformed / hostile Matroska input."""


def looks_like_mkv(data: bytes) -> bool:
    return data.startswith(EBML_MAGIC)


def _read_vint(data: bytes, at: int, keep_marker: bool) -> tuple[int, int]:
    """→ (value, next_offset)."""
    if at >= len(data):
        raise MkvError("truncated EBML vint")
    first = data[at]
    if first == 0:
        raise MkvError("EBML vint longer than 8 bytes")
    length = 8 - first.bit_length() + 1
    if at + length > len(data):
        raise MkvError("EBML vint overruns the stream")
    value = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for k in range(1, length):
        value = (value << 8) | data[at + k]
    return value, at + length


def _iter_elements(data: bytes, start: int, end: int, state: dict):
    at = start
    while at < end:
        state["n"] = state.get("n", 0) + 1
        if state["n"] > MAX_ELEMENTS:
            raise MkvError(f"more than {MAX_ELEMENTS} EBML elements")
        eid, at = _read_vint(data, at, keep_marker=True)
        size_at = at
        size, at = _read_vint(data, at, keep_marker=False)
        # all-ones payload size = unknown → extends to the enclosure
        size_len = at - size_at
        if size == (1 << (7 * size_len)) - 1:
            size = end - at
        if at + size > end:
            raise MkvError(f"element 0x{eid:x} overruns its enclosure")
        yield eid, at, at + size
        at += size


def _uint(data: bytes, start: int, end: int) -> int:
    v = 0
    for b in data[start:end]:
        v = (v << 8) | b
    return v


def _float(data: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", data[start:end])[0]
    if n == 8:
        return struct.unpack(">d", data[start:end])[0]
    raise MkvError(f"EBML float of {n} bytes")


def mkv_meta(data: bytes) -> dict:
    if not looks_like_mkv(data):
        raise MkvError("not Matroska (no EBML magic)")
    state: dict = {}
    brand = ""
    duration_ms = 0
    n_tracks = 0
    video_codec = audio_codec = ""
    width = height = 0

    segment = None
    for eid, p, e in _iter_elements(data, 0, len(data), state):
        if eid == 0x1A45DFA3:           # EBML header
            for hid, hp, he in _iter_elements(data, p, e, state):
                if hid == _ID_DOCTYPE:
                    brand = data[hp:he].decode("ascii", "replace")
        elif eid == _ID_SEGMENT:
            segment = (p, e)
            break
    if segment is None:
        raise MkvError("no Segment element")

    timescale = 1_000_000
    duration_units = 0.0
    for eid, p, e in _iter_elements(data, segment[0], segment[1], state):
        if eid == _ID_INFO:
            for iid, ip, ie in _iter_elements(data, p, e, state):
                if iid == _ID_TIMESCALE:
                    timescale = _uint(data, ip, ie)
                elif iid == _ID_DURATION:
                    duration_units = _float(data, ip, ie)
        elif eid == _ID_TRACKS:
            for tid, tp, te in _iter_elements(data, p, e, state):
                if tid != _ID_TRACKENTRY:
                    continue
                n_tracks += 1
                ttype = 0
                codec = ""
                t_w = t_h = 0
                for fid, fp, fe in _iter_elements(data, tp, te, state):
                    if fid == _ID_TRACKTYPE:
                        ttype = _uint(data, fp, fe)
                    elif fid == _ID_CODECID:
                        codec = data[fp:fe].decode("ascii", "replace")
                    elif fid == _ID_VIDEO:
                        for vid, vp, ve in _iter_elements(
                                data, fp, fe, state):
                            if vid == _ID_PIXELW:
                                t_w = _uint(data, vp, ve)
                            elif vid == _ID_PIXELH:
                                t_h = _uint(data, vp, ve)
                if ttype == 1:
                    video_codec = video_codec or codec
                    width = width or t_w
                    height = height or t_h
                elif ttype == 2:
                    audio_codec = audio_codec or codec
    if timescale == 0:
        raise MkvError("zero TimestampScale")
    duration_ms = int(duration_units * timescale / 1_000_000)
    return {
        "brand": brand,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "video_codec": video_codec,
        "audio_codec": audio_codec,
        "width": width,
        "height": height,
    }


# ------------------------------------------------------------- builder

def _vint_id(eid: int) -> bytes:
    out = []
    v = eid
    while v:
        out.append(v & 0xFF)
        v >>= 8
    return bytes(reversed(out))


def _vint_size(n: int) -> bytes:
    # 4-byte size vint: marker 0x10 in the top byte, 28-bit payload
    if n >= (1 << 28) - 1:
        raise MkvError("builder size too large")
    return struct.pack(">I", n | 0x10000000)


def _el(eid: int, payload: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(payload)) + payload


def _uint_el(eid: int, v: int, width: int = 0) -> bytes:
    out = []
    while v:
        out.append(v & 0xFF)
        v >>= 8
    body = bytes(reversed(out)) or b"\x00"
    if width:
        body = body.rjust(width, b"\x00")
    return _el(eid, body)


def build_mkv(*, doctype: str = "webm", timescale: int = 1_000_000,
              duration_units: float = 5000.0, tracks=(),
              float8: bool = False) -> bytes:
    """Minimal conformant Matroska: EBML header + Segment(Info +
    Tracks).  ``tracks``: (track_type, codec_id, width, height)."""
    header = _el(0x1A45DFA3, _el(_ID_DOCTYPE, doctype.encode("ascii")))
    dur = (struct.pack(">d", duration_units) if float8
           else struct.pack(">f", duration_units))
    info = _el(_ID_INFO,
               _uint_el(_ID_TIMESCALE, timescale)
               + _el(_ID_DURATION, dur))
    entries = b""
    for ttype, codec, w, h in tracks:
        body = (_uint_el(_ID_TRACKTYPE, ttype)
                + _el(_ID_CODECID, codec.encode("ascii")))
        if ttype == 1:
            body += _el(_ID_VIDEO,
                        _uint_el(_ID_PIXELW, w) + _uint_el(_ID_PIXELH, h))
        entries += _el(_ID_TRACKENTRY, body)
    segment = _el(_ID_SEGMENT, info + _el(_ID_TRACKS, entries))
    return header + segment
