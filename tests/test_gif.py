"""GIF codec (ops/gifcodec) — the third real image codec.

Real-LZW round-trips (dictionary growth, code widening, clear-on-overflow),
interlaced row order, local color tables, the strict payload sniff, hostile
inputs, palette-domain resize, and the Spark-side routing through
decode_media / decode_pixels / resize_media / media_features /
pixel_features.
"""

import hashlib
import random
import struct

import numpy as np
import pytest

from marky_spark.ops.gifcodec import (
    GifError,
    gif_decode,
    gif_decode_indexed,
    gif_encode,
    gif_resize_nearest,
    looks_like_gif,
)


def _expected_rgb(idx: bytes, palette: bytes) -> bytes:
    pal = np.frombuffer(palette, np.uint8).reshape(len(palette) // 3, 3)
    return pal[np.frombuffer(idx, np.uint8)].tobytes()


@pytest.mark.parametrize("n_colors", [2, 5, 16, 256])
@pytest.mark.parametrize("dims", [(1, 1), (3, 2), (16, 10), (31, 31)])
def test_round_trip(dims, n_colors):
    w, h = dims
    rng = random.Random(w * 1000 + h * 10 + n_colors)
    palette = bytes(rng.randrange(256) for _ in range(n_colors * 3))
    idx = bytes(rng.randrange(n_colors) for _ in range(w * h))
    data = gif_encode(idx, w, h, palette)
    assert looks_like_gif(data)
    assert gif_decode(data) == (w, h, 3, _expected_rgb(idx, palette))


def test_lzw_dictionary_overflow_and_code_widening():
    """Long runs drive the LZW table through every code width to 4096 and
    force a mid-stream clear — the compressed form must still decode
    exactly."""
    idx = (b"\x00" * 500 + b"\x01" * 499 + b"\x02") * 40
    palette = bytes(range(9))
    data = gif_encode(idx, 200, 200, palette)
    assert len(data) < len(idx) // 10  # actually compressed
    assert gif_decode(data) == (200, 200, 3, _expected_rgb(idx, palette))


def test_interlaced_decode():
    """Rows of an interlaced GIF arrive in 4 passes (8/8/4/2 stride);
    the decoder must reassemble scan order."""
    w, h, nc = 4, 11, 4
    rng = random.Random(7)
    palette = bytes(rng.randrange(256) for _ in range(nc * 3))
    idx = bytes(rng.randrange(nc) for _ in range(w * h))
    plain = bytearray(gif_encode(idx, w, h, palette))
    # rewrite the image data with rows pre-shuffled into interlace order
    # and the interlace flag set
    rows = np.frombuffer(idx, np.uint8).reshape(h, w)
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(start, h, step)]
    shuffled = rows[order].tobytes()
    inter = bytearray(gif_encode(shuffled, w, h, palette))
    # image descriptor: 0x2C at offset 13+3*GCT; set packed interlace bit
    gct_len = 3 * (2 << (plain[10] & 0x07))
    desc = 13 + gct_len
    assert inter[desc] == 0x2C
    inter[desc + 9] |= 0x40
    assert gif_decode(bytes(inter)) == (w, h, 3, _expected_rgb(idx, palette))


def test_local_color_table_overrides_global():
    w, h = 3, 2
    lct = bytes(range(6))          # 2 colors
    idx = bytes([0, 1, 1, 0, 1, 0])
    data = gif_encode(idx, w, h, bytes(6)[::-1])  # global: different colors
    # splice a local color table into the image descriptor
    gct_len = 3 * (2 << (data[10] & 0x07))
    desc = 13 + gct_len
    assert data[desc] == 0x2C
    out = bytearray(data)
    out[desc + 9] = 0x80 | 0  # LCT flag, size 0 → 2 entries
    out[desc + 10:desc + 10] = lct
    assert gif_decode(bytes(out)) == (w, h, 3, _expected_rgb(idx, lct))


def test_sniff_rejects_text_and_garbage():
    assert not looks_like_gif(b"")
    assert not looks_like_gif(b"GIF89a")  # too short for a descriptor
    assert not looks_like_gif(b"GIFs are a web format " * 3)
    bomb = b"GIF89a" + struct.pack("<HH", 65535, 65535) + b"\x00" * 40
    assert not looks_like_gif(bomb)  # over the pixel cap


def test_malformed_raises_gif_error():
    palette = bytes(range(12))
    good = gif_encode(bytes([0, 1, 2, 3]), 2, 2, palette)
    bads = [
        good[:20],                     # truncated mid-structure
        good[:-5],                     # truncated image data
        good[:6] + good[6:].replace(b"\x2c", b"\x7f", 1),  # unknown block
        b"GIF89a" + struct.pack("<HH", 2, 2) + b"\x00\x00\x00" + b"\x3b",
    ]
    for bad in bads:
        with pytest.raises(GifError):
            gif_decode(bad)


def test_lzw_bomb_is_bounded():
    """A stream whose LZW expansion exceeds w*h must not allocate beyond
    the declared frame: decode either succeeds with exactly w*h pixels or
    raises GifError — never unbounded growth."""
    idx = bytes([0, 1] * 50)  # encode 100 indices...
    data = bytearray(gif_encode(idx, 10, 10, bytes(6)))
    # ...then shrink the declared frame to 2x2 (expansion now 25x the frame)
    gct_len = 3 * (2 << (data[10] & 0x07))
    desc = 13 + gct_len
    struct.pack_into("<HH", data, desc + 5, 2, 2)
    w, h, _, px = gif_decode(bytes(data))
    assert (w, h, len(px)) == (2, 2, 2 * 2 * 3)


def test_resize_preserves_palette():
    w, h, nc = 8, 6, 7
    rng = random.Random(3)
    palette = bytes(rng.randrange(256) for _ in range(nc * 3))
    idx = bytes(rng.randrange(nc) for _ in range(w * h))
    small = gif_resize_nearest(gif_encode(idx, w, h, palette), 4, 3)
    sw, sh, sidx, spal = gif_decode_indexed(small)
    assert (sw, sh) == (4, 3)
    # stored tables are zero-padded to a power-of-two entry count
    assert spal[:len(palette)] == palette
    assert not any(spal[len(palette):])
    grid = np.frombuffer(idx, np.uint8).reshape(h, w)
    ys = np.arange(3) * h // 3
    xs = np.arange(4) * w // 4
    assert sidx == grid[ys][:, xs].tobytes()


def test_spark_routing_decode_resize_features(spark):
    """One GIF through the whole multimodal surface: decode_media (real
    dims), decode_pixels (format-agnostic digest vs the same pixels as
    PNG), resize_media (stays a GIF), media_features (pixel statistics,
    not digest fake), pixel_features (exact integers)."""
    from pyspark.sql import Row

    from marky_spark.ops.gifcodec import gif_decode as gd
    from marky_spark.ops.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        decode_pixels,
        media_features,
        pixel_features,
        resize_media,
    )
    from marky_spark.ops.pngcodec import png_encode

    w, h, nc = 6, 4, 8
    rng = random.Random(5)
    palette = bytes(rng.randrange(256) for _ in range(nc * 3))
    idx = bytes(rng.randrange(nc) for _ in range(w * h))
    gif = gif_encode(idx, w, h, palette)
    px = _expected_rgb(idx, palette)
    media = spark.createDataFrame(
        [Row(media_ref="g1", mime="image/gif", payload=gif),
         Row(media_ref="p1", mime="image/png", payload=png_encode(px, w, h, 3))],
        schema=MEDIA_SCHEMA)

    dec = {r["media_ref"]: r for r in decode_media(media).collect()}
    assert (dec["g1"]["width"], dec["g1"]["height"], dec["g1"]["channels"],
            dec["g1"]["ok"]) == (w, h, 3, "ok")

    pix = {r["media_ref"]: r for r in decode_pixels(media).collect()}
    want = hashlib.md5(px).hexdigest()
    assert pix["g1"]["pixel_md5"] == pix["p1"]["pixel_md5"] == want

    res = {r["media_ref"]: r for r in
           resize_media(media, width=3, height=2).collect()}
    assert (res["g1"]["in_width"], res["g1"]["in_height"]) == (w, h)
    assert gd(bytes(res["g1"]["payload"]))[:3] == (3, 2, 3)

    feats = {r["media_ref"]: r["features"] for r in
             media_features(media).collect()}
    arr = np.frombuffer(px, np.uint8)
    assert feats["g1"] == pytest.approx(feats["p1"])  # content, not container
    assert feats["g1"][0] == pytest.approx(w / 1024.0)
    assert feats["g1"][3] == pytest.approx(float(arr.mean()) / 255.0, abs=1e-6)

    pf = {r["media_ref"]: r for r in pixel_features(media).collect()}
    for ref in ("g1", "p1"):
        assert pf[ref]["ok"] == "ok"
        assert pf[ref]["sum_c0"] == int(arr[0::3].sum())
        assert pf[ref]["sum_c3"] is None
        assert pf[ref]["hist_0"] == int((arr >> 6 == 0).sum())


def test_media_features_fake_path_unchanged_for_non_images(spark):
    """Non-decodable payloads keep the digest-derived vector (the driver
    oracle for media_features reconstructs exactly this)."""
    from pyspark.sql import Row

    from marky_spark.ops.multimodal import MEDIA_SCHEMA, media_features

    blob = b"just some document text, not an image"
    media = spark.createDataFrame(
        [Row(media_ref="t1", mime="text/plain", payload=blob)],
        schema=MEDIA_SCHEMA)
    got = media_features(media).collect()[0]["features"]
    digest = hashlib.sha256(blob).digest()
    want = [(digest[i % 32] - 128) / 128.0 for i in range(16)]
    assert got == pytest.approx(want)
