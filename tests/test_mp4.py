"""MP4/M4A box-walk triage (ops/mp4meta, ISO 14496-12): builder
round-trips across the grammar variants, hand-built hostile vectors,
and mutation fuzz under the typed-error contract."""
import random
import struct

import pytest

from marky_spark.ops.mp4meta import (
    Mp4Error,
    _box,
    build_mp4,
    looks_like_mp4,
    mp4_meta,
)


def test_roundtrip_matrix():
    for i in range(40):
        tracks = [("vide", ("avc1", "hev1", "vp09", "av01")[i % 4],
                   16 * (1 + i % 40), 16 * (1 + i % 23))]
        if i % 2 == 1:
            tracks.append(("soun", "mp4a", 0, 0))
        blob = build_mp4(brand=("isom", "mp42", "M4A")[i % 3],
                         duration=(i * 37) % 100000 + 1000,
                         tracks=tracks,
                         large_moov=i % 5 == 0,
                         mvhd_v1=i % 7 == 0)
        m = mp4_meta(blob)
        assert m["duration_ms"] == (i * 37) % 100000 + 1000
        assert m["width"] == 16 * (1 + i % 40)
        assert m["height"] == 16 * (1 + i % 23)
        assert m["video_codec"] == ("avc1", "hev1", "vp09", "av01")[i % 4]
        assert m["audio_codec"] == ("mp4a" if i % 2 else "")
        assert m["n_tracks"] == 1 + i % 2
        assert m["brand"] == ("isom", "mp42", "M4A")[i % 3]


def test_timescale_math():
    # 90 kHz timescale (the common video clock): 450000 ticks = 5000 ms
    blob = build_mp4(timescale=90000, duration=450000,
                     tracks=[("vide", "avc1", 64, 48)])
    assert mp4_meta(blob)["duration_ms"] == 5000


def test_sniff():
    assert looks_like_mp4(build_mp4(tracks=[("vide", "avc1", 4, 4)]))
    assert not looks_like_mp4(b"RIFF....WEBP")
    assert not looks_like_mp4(b"")


def test_hostile_vectors_are_typed():
    good = build_mp4(tracks=[("vide", "avc1", 64, 48)])
    with pytest.raises(Mp4Error, match="ftyp"):
        mp4_meta(b"\x00" * 32)
    # box overruns its enclosure
    bad = bytearray(good)
    struct.pack_into(">I", bad, 0, len(good) + 100)
    with pytest.raises(Mp4Error, match="overruns"):
        mp4_meta(bytes(bad))
    # zero mvhd timescale
    at = good.find(b"mvhd")
    bad = bytearray(good)
    struct.pack_into(">I", bad, at + 4 + 4 + 8, 0)
    with pytest.raises(Mp4Error, match="timescale"):
        mp4_meta(bytes(bad))
    # no moov
    ftyp_only = good[:good.find(b"moov") - 4]
    with pytest.raises(Mp4Error, match="moov"):
        mp4_meta(ftyp_only)
    # bad largesize
    with pytest.raises(Mp4Error):
        mp4_meta(_box(b"ftyp", b"isom" + bytes(8))
                 + struct.pack(">I", 1) + b"moov"
                 + struct.pack(">Q", 4))
    # box-count bomb: thousands of tiny free boxes
    bomb = _box(b"ftyp", b"isom" + bytes(8)) \
        + struct.pack(">I", 8) + b"free"
    bomb = bomb[:12 + 8] + (struct.pack(">I", 8) + b"free") * 70000
    with pytest.raises(Mp4Error, match="boxes"):
        mp4_meta(bytes(bomb))


def test_mutation_fuzz_never_crashes():
    rng = random.Random(1)
    base = build_mp4(tracks=[("vide", "avc1", 64, 48),
                             ("soun", "mp4a", 0, 0)])
    outcomes = {"ok": 0, "typed": 0}
    for _ in range(800):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            mp4_meta(bytes(b))
            outcomes["ok"] += 1
        except Mp4Error:
            outcomes["typed"] += 1
    assert sum(outcomes.values()) == 800
    assert outcomes["typed"] > 0


# ---------------------------------------------------------- Matroska/WebM

class TestMkv:
    def test_roundtrip_matrix(self):
        from marky_spark.ops.mkvmeta import build_mkv, mkv_meta

        for i in range(30):
            tracks = [(1, ("V_VP9", "V_AV1", "V_VP8")[i % 3],
                       16 * (1 + i % 40), 16 * (1 + i % 23))]
            if i % 2 == 1:
                tracks.append((2, "A_OPUS", 0, 0))
            blob = build_mkv(doctype=("webm", "matroska")[i % 2],
                             duration_units=float((i * 37) % 100000
                                                  + 1000),
                             tracks=tracks, float8=i % 3 == 0)
            m = mkv_meta(blob)
            assert m["duration_ms"] == (i * 37) % 100000 + 1000
            assert m["width"] == 16 * (1 + i % 40)
            assert m["height"] == 16 * (1 + i % 23)
            assert m["video_codec"] == ("V_VP9", "V_AV1", "V_VP8")[i % 3]
            assert m["audio_codec"] == ("A_OPUS" if i % 2 else "")
            assert m["brand"] == ("webm", "matroska")[i % 2]

    def test_timescale_math(self):
        from marky_spark.ops.mkvmeta import build_mkv, mkv_meta

        blob = build_mkv(timescale=500_000, duration_units=10000.0,
                         tracks=[(1, "V_VP9", 64, 48)])
        assert mkv_meta(blob)["duration_ms"] == 5000

    def test_hostile_is_typed(self):
        from marky_spark.ops.mkvmeta import MkvError, build_mkv, mkv_meta

        with pytest.raises(MkvError, match="EBML"):
            mkv_meta(b"nope")
        good = build_mkv(tracks=[(1, "V_VP9", 64, 48)])
        # truncated stream: an element overruns
        with pytest.raises(MkvError):
            mkv_meta(good[:-6])
        # vint longer than 8 bytes (leading zero byte as an ID)
        bad = bytearray(good)
        seg_at = bad.find(b"\x18\x53\x80\x67")
        bad[seg_at] = 0
        with pytest.raises(MkvError):
            mkv_meta(bytes(bad))

    def test_mutation_fuzz_never_crashes(self):
        from marky_spark.ops.mkvmeta import MkvError, build_mkv, mkv_meta

        rng = random.Random(2)
        base = build_mkv(tracks=[(1, "V_VP9", 64, 48), (2, "A_OPUS", 0, 0)])
        for _ in range(600):
            b = bytearray(base)
            for _ in range(rng.randint(1, 5)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                mkv_meta(bytes(b))
            except MkvError:
                pass
