"""Property-based robustness: no input may escape the poison-pill contract.

For every kernel: arbitrary text/bytes either convert or raise ConvertError —
never any other exception (an unhandled kernel exception at 10^12-doc scale
is a task-retry storm). convert_document must always return a status row.
"""

import base64

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from marky_spark.convert import convert_document
from marky_spark.kernels import REGISTRY, ConvertError

FAST = settings(max_examples=120, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])

text_strategy = st.text(max_size=400)
bytes_strategy = st.binary(max_size=400)


@given(text=text_strategy)
@FAST
def test_text_kernels_never_crash(text):
    for kind in ("csv", "html", "ipynb", "text", "markdown"):
        try:
            segments = REGISTRY[kind](text)
        except ConvertError:
            continue
        for seg in segments:
            assert len(seg) == 3
            assert isinstance(seg[1], str)


@given(blob=bytes_strategy)
@FAST
def test_binary_kernels_never_crash(blob):
    payload = base64.b64encode(blob).decode()
    for kind in ("docx", "xlsx", "pptx", "epub", "pdf"):
        try:
            segments = REGISTRY[kind](payload)
        except ConvertError:
            continue
        for seg in segments:
            assert len(seg) == 3


@given(blob=bytes_strategy)
@FAST
def test_binary_kernels_reject_raw_garbage(blob):
    """Non-base64 text into binary kernels: ConvertError, nothing else."""
    text = blob.decode("latin-1")
    for kind in ("docx", "xlsx", "pptx", "epub", "pdf"):
        try:
            REGISTRY[kind](text)
        except ConvertError:
            pass


@given(
    kind=st.sampled_from(
        ["csv", "html", "ipynb", "text", "docx", "pdf", "zzz", "", "image"]
    ),
    text=text_strategy,
    media_ref=st.text(max_size=50),
    offset=st.integers(min_value=-(2**31), max_value=2**31 - 1),
)
@FAST
def test_convert_document_total(kind, text, media_ref, offset):
    row = convert_document(
        "fuzz", [{"kind": kind, "text": text, "media_ref": media_ref,
                  "offset": offset}]
    )
    assert row["status"] in ("ok", "error", "unsupported")
    assert isinstance(row["markdown"], str)
    assert row["n_out_spans"] == len(row["out_spans"])
    # offsets are a clean renumbering
    assert [s["offset"] for s in row["out_spans"]] == list(
        range(len(row["out_spans"]))
    )


@given(texts=st.lists(st.text(max_size=60), max_size=6))
@FAST
def test_multi_span_order_stable(texts):
    spans = [
        {"kind": "text", "text": t, "media_ref": "", "offset": i}
        for i, t in enumerate(texts)
    ]
    forward = convert_document("d", spans)
    backward = convert_document("d", list(reversed(spans)))
    assert forward["markdown"] == backward["markdown"]  # offset defines order


@given(
    w=st.integers(1, 24), h=st.integers(1, 24),
    channels=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
@FAST
def test_png_codec_round_trip_property(w, h, channels, seed):
    """Any pixel buffer survives encode→decode bit-exactly."""
    import numpy as np

    from marky_spark.ops.pngcodec import png_decode, png_encode

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * channels, dtype=np.uint8).tobytes()
    assert png_decode(png_encode(px, w, h, channels)) == (w, h, channels, px)


@given(blob=st.binary(max_size=400))
@FAST
def test_png_decode_never_escapes_png_error(blob):
    """Arbitrary bytes either decode or raise PngError — never any other
    exception (same poison-pill contract as the kernels)."""
    from marky_spark.ops.pngcodec import PngError, png_decode

    try:
        png_decode(blob)
    except PngError:
        pass


@given(pos=st.integers(0, 200), bit=st.integers(0, 7), seed=st.integers(0, 99))
@FAST
def test_png_decode_bitflip_never_escapes(pos, bit, seed):
    """Single-bit corruption of a VALID png either still decodes (flips in
    unchecked slack are fine) or raises PngError."""
    import numpy as np

    from marky_spark.ops.pngcodec import PngError, png_decode, png_encode

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=6 * 5 * 3, dtype=np.uint8).tobytes()
    data = bytearray(png_encode(px, 6, 5, 3))
    data[pos % len(data)] ^= 1 << bit
    try:
        png_decode(bytes(data))
    except PngError:
        pass
