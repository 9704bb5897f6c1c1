"""Property-based round-trip invariants for the lossless codecs.

The randomized unit tests pin specific shapes; these let hypothesis hunt
the shape space (dims × channels × content × layout options) and SHRINK
any counterexample to a minimal one. Every codec here is lossless, so
the property is exact equality — the same invariant the driver oracle
relies on at sf0.01.
"""
from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FAST = settings(max_examples=60, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])

dims = st.tuples(st.integers(1, 24), st.integers(1, 18))


@given(dims=dims, channels=st.sampled_from([1, 3, 4]),
       compression=st.sampled_from(["none", "packbits", "lzw"]),
       predictor=st.sampled_from([1, 2]),
       rps=st.one_of(st.none(), st.integers(1, 6)),
       seed=st.integers(0, 2**31))
@FAST
def test_tiff_round_trip_property(dims, channels, compression, predictor,
                                  rps, seed):
    from marky_spark.ops.tiffcodec import tiff_decode, tiff_encode

    w, h = dims
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * channels,
                      dtype=np.uint8).tobytes()
    blob = tiff_encode(px, w, h, channels, compression=compression,
                       predictor=predictor, rows_per_strip=rps)
    assert tiff_decode(blob) == (w, h, channels, px)


@given(dims=dims, channels=st.sampled_from([1, 3]),
       seed=st.integers(0, 2**31))
@FAST
def test_pnm_round_trip_property(dims, channels, seed):
    from marky_spark.ops.pnmcodec import pnm_decode, pnm_encode

    w, h = dims
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * channels,
                      dtype=np.uint8).tobytes()
    assert pnm_decode(pnm_encode(px, w, h, channels)) == (w, h, channels, px)


@given(n=st.integers(1, 300), channels=st.sampled_from([1, 2]),
       bits=st.sampled_from([8, 16]),
       block=st.integers(1, 64),
       strategy=st.sampled_from(["fixed", "verbatim"]),
       seed=st.integers(0, 2**31))
@FAST
def test_flac_round_trip_property(n, channels, bits, block, strategy, seed):
    from marky_spark.ops.flaccodec import flac_decode, flac_encode

    rng = np.random.default_rng(seed)
    lim = 1 << (bits - 1)
    sig = rng.integers(-lim, lim, size=(n, channels)).astype(np.int64)
    rate, ch, b, out = flac_decode(
        flac_encode(sig, 22050, bits=bits, block_size=block,
                    strategy=strategy))
    assert (rate, ch, b) == (22050, channels, bits)
    assert (out == sig).all()


@given(n=st.integers(1, 500), channels=st.sampled_from([1, 2]),
       law=st.sampled_from(["mulaw", "alaw"]), seed=st.integers(0, 2**31))
@FAST
def test_g711_lattice_round_trip_property(n, channels, law, seed):
    """Any signal already on the law's decoded lattice survives exactly
    (the oracle invariant); arbitrary signals quantize WITHIN the lattice
    (decode of encode is always a lattice point, idempotent thereafter)."""
    from marky_spark.ops.wavcodec import _g711_lut, wav_decode, wav_encode_g711

    rng = np.random.default_rng(seed)
    lut = _g711_lut(7 if law == "mulaw" else 6)
    sig = lut[rng.integers(0, 256, size=(n, channels))].astype(np.int64)
    _, _, _, out = wav_decode(wav_encode_g711(sig, 8000, law))
    assert (out == sig).all()
    arbitrary = rng.integers(-32768, 32768, size=(n, channels)).astype(
        np.int64)
    _, _, _, once = wav_decode(wav_encode_g711(arbitrary, 8000, law))
    _, _, _, twice = wav_decode(
        wav_encode_g711(once.astype(np.int64), 8000, law))
    assert (once == twice).all()


@given(texts=st.lists(st.binary(min_size=0, max_size=300), min_size=1,
                      max_size=6),
       seed=st.integers(0, 2**31))
@FAST
def test_archive_round_trip_property(texts, seed):
    """zip/tar/gzip of arbitrary member bytes always explode back to the
    exact members (names + payloads)."""
    import gzip
    import io
    import tarfile
    import zipfile

    from marky_spark.ops.archive import (
        _gzip_members,
        _tar_members,
        _zip_members,
    )

    members = {f"m{k}.bin": t for k, t in enumerate(texts)}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    assert dict(_zip_members(buf.getvalue())) == members
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members.items():
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    assert dict(_tar_members(buf.getvalue())) == members
    assert dict(_tar_members(gzip.decompress(
        gzip.compress(buf.getvalue())))) == members


@given(dims=dims, codec=st.sampled_from(["g4", "mh", "mh_eol", "g3_2d"]),
       k=st.integers(1, 6), seed=st.integers(0, 2**31))
@FAST
def test_fax_round_trip_property(dims, codec, k, seed):
    from marky_spark.ops.faxcodec import (
        g3_2d_decode,
        g3_2d_encode,
        g4_decode,
        g4_encode,
        mh_decode,
        mh_encode,
    )

    w, h = dims
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 2, size=w * h, dtype=np.uint8).tobytes()
    if codec == "g4":
        assert g4_decode(g4_encode(px, w, h), w, h) == px
    elif codec == "g3_2d":
        assert g3_2d_decode(g3_2d_encode(px, w, h, k=k), w, h) == px
    else:
        eol = codec == "mh_eol"
        assert mh_decode(mh_encode(px, w, h, eol=eol), w, h, eol=eol) == px


@given(dims=dims, channels=st.sampled_from([1, 3]),
       maxval=st.integers(255, 65535), seed=st.integers(0, 2**31))
@FAST
def test_pnm_wide_maxval_round_trip_property(dims, channels, maxval, seed):
    """encode(maxval)→decode is the identity for EVERY maxval >= 255:
    the round-half-up spread and rescale are exact inverses."""
    from marky_spark.ops.pnmcodec import pnm_decode, pnm_encode

    w, h = dims
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * channels,
                      dtype=np.uint8).tobytes()
    assert pnm_decode(pnm_encode(px, w, h, channels, maxval=maxval)) == \
        (w, h, channels, px)
