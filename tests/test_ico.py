"""ICO favicon container: round-trips over PNG and DIB entries,
largest-image selection, weak-magic sniff strictness, hostile inputs,
mutation fuzz, and the Spark decode_pixels routing."""
from __future__ import annotations

import random
import struct

import pytest

from marky_spark.ops.icocodec import (
    IcoError,
    IcoUnsupportedError,
    ico_decode,
    ico_encode,
    looks_like_ico,
)


def _px(n: int, ch: int, seed: int = 1) -> bytes:
    return bytes((i * seed * 7 + 3) % 256 for i in range(n * n * ch))


def test_round_trips():
    for kind in ("png", "dib"):
        for ch in (3, 4) if kind == "dib" else (3,):
            px = _px(16, ch)
            assert ico_decode(ico_encode([(px, 16, 16, ch, kind)])) == \
                (16, 16, ch, px)


def test_largest_entry_wins():
    blob = ico_encode([(_px(8, 3), 8, 8, 3, "dib"),
                       (_px(32, 4, 2), 32, 32, 4, "png"),
                       (_px(16, 3, 3), 16, 16, 3, "dib")])
    assert ico_decode(blob) == (32, 32, 4, _px(32, 4, 2))


def test_weak_magic_sniffs_strictly():
    """00 00 01 00 opens plenty of binaries; only a fully valid
    ICONDIR takes the real path."""
    assert not looks_like_ico(b"\x00\x00\x01\x00\xff\xff" + b"x" * 64)
    assert not looks_like_ico(b"\x00\x00\x01\x00\x01\x00" + b"\x00" * 8)
    assert looks_like_ico(ico_encode([(_px(8, 3), 8, 8, 3, "png")]))


def test_hostile_inputs_raise_typed():
    good = ico_encode([(_px(16, 3), 16, 16, 3, "png")])
    with pytest.raises(IcoError, match="outside the file"):
        ico_decode(good[:-5])
    cur = bytearray(good)
    cur[2] = 2
    with pytest.raises(IcoUnsupportedError, match="cursor"):
        ico_decode(bytes(cur))
    with pytest.raises(IcoError, match="bad ICONDIR"):
        ico_decode(b"\x01\x00\x01\x00\x01\x00" + b"\x00" * 32)
    # palettized DIB → typed unsupported
    dib = bytearray(ico_encode([(_px(16, 3), 16, 16, 3, "dib")]))
    at = 6 + 16  # DIB starts right after the single entry
    struct.pack_into("<H", dib, at + 14, 8)  # biBitCount = 8
    with pytest.raises(IcoUnsupportedError, match="palettized"):
        ico_decode(bytes(dib))


def test_mutations_stay_typed():
    from tests.test_mutation_fuzz import _mutate

    rng = random.Random(0x1C0)
    bases = [ico_encode([(_px(16, 3), 16, 16, 3, "png")]),
             ico_encode([(_px(16, 4), 16, 16, 4, "dib")]),
             ico_encode([(_px(8, 3), 8, 8, 3, "dib"),
                         (_px(16, 3, 2), 16, 16, 3, "png")])]
    for k in range(900):
        blob = _mutate(rng, bases[k % len(bases)])
        if not looks_like_ico(blob):
            continue
        try:
            w, h, c, out = ico_decode(blob)
        except (IcoError, IcoUnsupportedError, ValueError,
                NotImplementedError):
            continue
        assert len(out) == w * h * c


def test_spark_decode_pixels_routes_ico(spark):
    from marky_spark.ops.multimodal import decode_pixels

    px = _px(16, 3)
    blob = ico_encode([(px, 16, 16, 3, "png")])
    df = spark.createDataFrame(
        [("i1", "image/x-icon", bytearray(blob))],
        "media_ref string, mime string, payload binary")
    r = decode_pixels(df).collect()[0]
    import hashlib

    assert (r["width"], r["height"], r["channels"], r["ok"]) == \
        (16, 16, 3, "ok")
    assert r["pixel_md5"] == hashlib.md5(px).hexdigest()
