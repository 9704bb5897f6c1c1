"""PDF kernel contracts (pdf.go semantics; self-generated classic-xref
fixtures per FIXTURES.md §3 / SURVEY.md §2.3)."""

import pytest

from marky_spark import fixtures as fx
from marky_spark.kernels.base import ConvertError, segments_text
from marky_spark.kernels.pdfk import convert_pdf, extract_pdf_text


def test_single_page_flate():
    data = fx.pdf_bytes([[(72, 720, "Hello World")]], compress=True)
    assert extract_pdf_text(data) == "Hello World"


def test_reading_order_y_then_x():
    # content stream emits blocks OUT of reading order; y-desc then x-asc
    data = fx.pdf_bytes([[
        (300, 700, "world"),
        (72, 650, "below"),
        (72, 700, "hello "),
    ]])
    assert extract_pdf_text(data) == "hello world\nbelow"


def test_multi_page_joined_blank_line():
    data = fx.pdf_bytes([
        [(72, 720, "page one")],
        [(72, 720, "page two")],
    ])
    assert extract_pdf_text(data) == "page one\n\npage two"


def test_tj_array_kerning_becomes_space():
    data = fx.pdf_bytes([[(72, 720, "alpha beta gamma")]], use_tj_array=True)
    assert extract_pdf_text(data) == "alpha beta gamma"


def test_uncompressed_and_escapes():
    data = fx.pdf_bytes([[(72, 720, "par(en) and \\ slash")]], compress=False)
    assert extract_pdf_text(data) == "par(en) and \\ slash"


def test_winansi_accents():
    data = fx.pdf_bytes([[(72, 720, "café naïve")]])
    assert extract_pdf_text(data) == "café naïve"


def test_brute_scan_fallback_on_bad_startxref():
    data = fx.pdf_bytes([[(72, 720, "resilient")]])
    # corrupt the startxref offset → xref parse fails → object scan
    import re

    broken = re.sub(rb"startxref\s+\d+", b"startxref\n999999999", data)
    assert extract_pdf_text(broken) == "resilient"


def test_not_pdf_errors():
    with pytest.raises(ConvertError, match="not a PDF"):
        convert_pdf(fx.b64(b"plain text"))


def test_empty_bytes_errors():
    with pytest.raises(ConvertError):
        convert_pdf(fx.b64(b""))


def test_segments_shape():
    data = fx.pdf_bytes([[(72, 720, "x")]])
    segs = convert_pdf(fx.b64(data))
    assert segs == [("markdown", "x", "")]


def test_tj_nested_array_text_survives():
    """parse_object parity: a nested array inside TJ keeps the outer items
    (the nested list itself is ignored, its siblings are emitted)."""
    from marky_spark.kernels.pdfk import _extract_page_runs

    runs = _extract_page_runs(b"BT 1 2 Td [(a) [(x)] (b)] TJ ET")
    assert runs == [(1.0, 2.0, "ab")]
