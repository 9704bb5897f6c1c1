"""Metadata stripping (ops/metastrip): lossless EXIF/XMP/IPTC/comment
removal across the three containers, byte-exact strip accounting, and
typed errors on malformed framing."""
import struct

import pytest

from marky_spark.ops.metastrip import (
    MetaStripError,
    strip_jpeg,
    strip_png,
    strip_webp,
)


def test_jpeg_strip_is_lossless_and_exact():
    from marky_spark.ops.jpegcodec import jpeg_decode, jpeg_encode

    jpg = jpeg_encode(bytes([77]) * 16, 4, 4, 1)
    app1 = (b"\xff\xe1" + struct.pack(">H", 2 + 6 + 50)
            + b"Exif\x00\x00" + b"D" * 50)
    com = b"\xff\xfe" + struct.pack(">H", 2 + 12) + b"E" * 12
    out, n = strip_jpeg(jpg[:2] + app1 + com + jpg[2:])
    assert n == (4 + 6 + 50) + (4 + 12)
    assert out == jpg                      # byte-identical reassembly
    assert jpeg_decode(out) == jpeg_decode(jpg)


def test_jpeg_keeps_app0_and_app14():
    from marky_spark.ops.jpegcodec import jpeg_encode

    jpg = jpeg_encode(bytes([10]) * 16, 4, 4, 1)
    app0 = b"\xff\xe0" + struct.pack(">H", 2 + 5) + b"JFIF\x00"
    tagged = jpg[:2] + app0 + jpg[2:]
    out, n = strip_jpeg(tagged)
    assert n == 0 and out == tagged


def test_png_strip_keeps_pixels_and_crcs():
    from marky_spark.ops.pngcodec import _chunk, png_decode, png_encode

    blob = png_encode(bytes(48), 4, 4, 3)
    at = blob.index(b"IDAT") - 4
    tagged = (blob[:at] + _chunk(b"tEXt", b"A" * 100)
              + _chunk(b"eXIf", b"B" * 20) + blob[at:])
    out, n = strip_png(tagged)
    assert n == (12 + 100) + (12 + 20)
    assert out == blob
    assert png_decode(out) == png_decode(blob)


def test_webp_strip_clears_vp8x_flags():
    from marky_spark.ops.webpcodec import webp_decode, webp_encode

    still = webp_encode(bytes(48), 4, 4, 3)
    exif = b"EXIF" + (31).to_bytes(4, "little") + b"C" * 31 + b"\x00"
    vp8x = (b"VP8X" + (10).to_bytes(4, "little")
            + bytes((0x0C, 0, 0, 0))
            + (3).to_bytes(3, "little") * 2)
    body = vp8x + exif + still[12:]
    tagged = (b"RIFF" + (4 + len(body)).to_bytes(4, "little")
              + b"WEBP" + body)
    out, n = strip_webp(tagged)
    assert n == 8 + 31 + 1
    assert out[20] & 0x0C == 0            # EXIF/XMP flag bits cleared
    assert webp_decode(out) == webp_decode(still)


def test_hostile_framing_is_typed():
    with pytest.raises(MetaStripError):
        strip_jpeg(b"\xff\xd8\xff\xe1\x00\x01")      # segment len < 2
    with pytest.raises(MetaStripError):
        strip_jpeg(b"\xff\xd8" + b"\x00" * 8)        # marker desync
    with pytest.raises(MetaStripError):
        strip_jpeg(b"\xff\xd8\xff\xe1\xff\xff")      # overrun
    with pytest.raises(MetaStripError):
        strip_png(b"\x89PNG\r\n\x1a\n"
                  + struct.pack(">I", 1 << 30) + b"tEXt")
    with pytest.raises(MetaStripError):
        strip_webp(b"RIFF\x40\x00\x00\x00WEBP"
                   + b"EXIF" + (1 << 20).to_bytes(4, "little"))


def test_operator_passthrough_and_error_rows(spark):
    from pyspark.sql import functions as F

    from marky_spark.ops.metastrip import strip_metadata

    rows = [("a", b"not an image at all"),
            ("b", b"\xff\xd8\xff\xe1\x00\x01")]       # malformed JPEG
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = {r["media_ref"]: r for r in strip_metadata(df).collect()}
    assert out["a"]["ok"] == "ok" and out["a"]["n_stripped"] == 0
    assert bytes(out["a"]["payload"]) == b"not an image at all"
    assert out["b"]["ok"].startswith("error:")
