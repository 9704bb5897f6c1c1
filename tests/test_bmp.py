"""BMP codec (ops/bmpcodec) — the second real image codec.

Round-trips, layout variants (bottom-up/top-down, row padding), the strict
payload sniff (arbitrary text bytes must NEVER take the BMP path — the
media_decode driver query feeds document text as payloads), and the
format-agnostic pixel digest through decode_pixels.
"""

import hashlib
import random
import struct

import pytest

from marky_spark.ops.bmpcodec import (
    BmpError,
    bmp_decode,
    bmp_encode,
    looks_like_bmp,
)


@pytest.mark.parametrize("channels", [3, 4])
@pytest.mark.parametrize("dims", [(1, 1), (3, 5), (7, 2), (16, 9)])
def test_round_trip(channels, dims):
    w, h = dims
    rng = random.Random(w * 100 + h * 10 + channels)
    px = bytes(rng.randrange(256) for _ in range(w * h * channels))
    data = bmp_encode(px, w, h, channels)
    assert looks_like_bmp(data)
    assert bmp_decode(data) == (w, h, channels, px)


def test_top_down_decode():
    """Negative height means rows are stored top-down (no flip)."""
    px = bytes(range(2 * 2 * 3))
    data = bytearray(bmp_encode(px, 2, 2, 3))
    # flip height sign AND reverse the stored row order to keep pixels equal
    struct.pack_into("<i", data, 22, -2)
    row = (2 * 3 + 3) & ~3
    body = bytes(data[54:])
    data[54:] = body[row:] + body[:row]
    assert bmp_decode(bytes(data)) == (2, 2, 3, px)


def test_row_padding():
    """width*3 not divisible by 4 exercises the 4-byte row alignment."""
    w, h = 3, 2  # stride 9 → padded 12
    px = bytes(range(w * h * 3))
    data = bmp_encode(px, w, h, 3)
    assert len(data) == 54 + 12 * h
    assert bmp_decode(data) == (w, h, 3, px)


def test_sniff_rejects_text_and_garbage():
    """Strict structural sniff: text starting with 'BM' (a real risk — the
    media_decode query feeds document text bytes) and random blobs must
    stay on the fake-decode path."""
    assert not looks_like_bmp(b"BM is a stock ticker, not a bitmap " * 4)
    assert not looks_like_bmp(b"")
    assert not looks_like_bmp(b"BM" + b"\x00" * 52)  # header size 0
    rng = random.Random(11)
    for _ in range(200):
        blob = b"BM" + bytes(rng.randrange(256) for _ in range(80))
        if looks_like_bmp(blob):  # would need a fully plausible DIB header
            pytest.fail(f"sniff accepted random blob {blob[:30]!r}")


def test_malformed_raises_bmp_error():
    good = bmp_encode(bytes(12), 2, 2, 3)
    for bad in (
        good[:40],                      # truncated pixel data
        good[:28] + b"\x08\x00" + good[30:],   # bpp 8
        good[:30] + b"\x01\x00\x00\x00" + good[34:],  # RLE compression
    ):
        with pytest.raises(BmpError):
            bmp_decode(bad)


def test_dimension_cap():
    data = bytearray(bmp_encode(bytes(12), 2, 2, 3))
    struct.pack_into("<ii", data, 18, 100_000, 100_000)
    with pytest.raises(BmpError, match="pixel cap"):
        bmp_decode(bytes(data))


def test_decode_media_auto_takes_real_bmp_path(spark):
    from pyspark.sql import Row

    from marky_spark.ops.multimodal import MEDIA_SCHEMA, decode_media

    px = bytes(range(4 * 3 * 3))
    media = spark.createDataFrame(
        [Row(media_ref="b1", mime="image/bmp",
             payload=bmp_encode(px, 4, 3, 3))],
        schema=MEDIA_SCHEMA)
    got = decode_media(media).collect()[0]
    assert (got["width"], got["height"], got["channels"], got["ok"]) == \
        (4, 3, 3, "ok")


def test_pixel_digest_format_agnostic(spark):
    """The same pixels as PNG and as BMP hash to the same pixel_md5 —
    exact image dedup keys on content, not container."""
    from pyspark.sql import Row

    from marky_spark.ops.multimodal import MEDIA_SCHEMA, decode_pixels
    from marky_spark.ops.pngcodec import png_encode

    px = bytes((i * 31) % 256 for i in range(5 * 4 * 3))
    media = spark.createDataFrame(
        [Row(media_ref="png", mime="image/png",
             payload=png_encode(px, 5, 4, 3)),
         Row(media_ref="bmp", mime="image/bmp",
             payload=bmp_encode(px, 5, 4, 3))],
        schema=MEDIA_SCHEMA)
    rows = {r["media_ref"]: r for r in decode_pixels(media).collect()}
    want = hashlib.md5(px).hexdigest()
    assert rows["png"]["pixel_md5"] == want
    assert rows["bmp"]["pixel_md5"] == want
    assert rows["png"]["ok"] == rows["bmp"]["ok"] == "ok"
