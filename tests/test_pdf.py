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


# ---------------------------------------------------------------------------
# ToUnicode CMaps + /Encoding tables (PDF 32000-1 §9.6.6, §9.10.3)
# ---------------------------------------------------------------------------

def _stream_obj(body: bytes) -> bytes:
    return (f"<< /Length {len(body)} >>".encode()
            + b"\nstream\n" + body + b"\nendstream")


def _one_page_pdf(content: bytes, font_obj: bytes,
                  extra: dict[int, bytes] | None = None,
                  resources_on_pages: bool = False) -> bytes:
    from marky_spark.fixtures import pdf_assemble

    res = b"/Resources << /Font << /F1 5 0 R >> >> "
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            + (res if resources_on_pages else b"") + b">>"),
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R "
            + (b"" if resources_on_pages else res) + b">>"),
        4: _stream_obj(content),
        5: font_obj,
    }
    objects.update(extra or {})
    return pdf_assemble(objects)


_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
4 beginbfchar
<0001> <0048>
<0002> <0065>
<0003> <006F>
<0004> <00660069>
endbfchar
2 beginbfrange
<0010> <0011> <006C>
<0020> <0021> [<0057> <0058>]
endbfrange
endcmap
CMap currentdict /CMap defineresource pop
end end"""


def test_type0_tounicode_cmap_decodes():
    """A subset-style Type0 font: 2-byte codes resolve through the
    ToUnicode CMap (bfchar singles, incrementing bfrange, array bfrange,
    multi-unit ligature expansion) — the shape every subset-embedded
    real-world PDF uses."""
    font = (b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Subset "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>")
    # codes: H e l l o,  space via Td move, fi ligature, W X
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm "
               b"<00010002001000100003> Tj "
               b"1 0 0 1 72 680 Tm <0004> Tj "
               b"1 0 0 1 72 660 Tm <00200021> Tj ET")
    blob = _one_page_pdf(content, font, extra={6: _stream_obj(_CMAP)})
    # <0004> expands to TWO UTF-16 units <0066><0069> — 'f','i' (the
    # ligature-to-text expansion shape ToUnicode exists for)
    assert extract_pdf_text(blob) == "Hello\nfi\nWX"


def test_differences_encoding_overrides_base():
    """/Encoding dict: /BaseEncoding /WinAnsiEncoding with /Differences
    remapping codes to AGL glyph names (named, uniXXXX, composed)."""
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding "
            b"/Differences [ 65 /bullet 97 /eacute 98 /uni2020 "
            b"99 /Scaron ] >> >>")
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (A abc dB) Tj ET"
    blob = _one_page_pdf(content, font)
    # A->bullet, a->eacute, b->dagger, c->Scaron; d/B/space from WinAnsi
    assert extract_pdf_text(blob) == "• \xe9†Š dB"


def test_macroman_and_standard_encodings():
    """Named base encodings: MacRoman high bytes and StandardEncoding's
    typographic-quote quirk (0x27/0x60 are curly) decode per Annex D."""
    mac = (b"<< /Type /Font /Subtype /Type1 /BaseFont /H "
           b"/Encoding /MacRomanEncoding >>")
    # MacRoman: 0xA5 bullet, 0x8E e-acute
    blob = _one_page_pdf(
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (\xa5 \x8e) Tj ET", mac)
    assert extract_pdf_text(blob) == "• \xe9"
    std = (b"<< /Type /Font /Subtype /Type1 /BaseFont /H "
           b"/Encoding /StandardEncoding >>")
    blob = _one_page_pdf(
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (\x27x\x60 \xb1\xd0) Tj ET", std)
    assert extract_pdf_text(blob) == "’x‘ –—"


def test_resources_inherited_from_pages_node():
    """/Resources on the /Pages ancestor applies to kid pages
    (PDF 32000-1 §7.7.3.4 inheritable attributes)."""
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /H "
            b"/Encoding /MacRomanEncoding >>")
    blob = _one_page_pdf(
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (\xa5) Tj ET", font,
        resources_on_pages=True)
    assert extract_pdf_text(blob) == "•"


def test_fonts_switch_mid_page():
    """Tf switches the active decoder; text state persists across BT/ET."""
    from marky_spark.fixtures import pdf_assemble

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font "
            b"<< /F1 5 0 R /F2 6 0 R >> >> >>"),
        4: _stream_obj(
            b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (\xa5) Tj "
            b"/F2 12 Tf (\xa5) Tj ET"),
        5: (b"<< /Type /Font /Subtype /Type1 /BaseFont /H "
            b"/Encoding /MacRomanEncoding >>"),
        6: (b"<< /Type /Font /Subtype /Type1 /BaseFont /H "
            b"/Encoding /WinAnsiEncoding >>"),
    }
    # same byte, two fonts: MacRoman bullet then WinAnsi yen
    assert extract_pdf_text(pdf_assemble(objects)) == "•\xa5"


def test_hostile_cmaps_stay_bounded():
    """A bfrange demanding 2^24 mappings is capped (no hang, no OOM);
    garbage CMap bytes degrade to the fallback decode, never crash."""
    bomb = (b"begincmap 1 beginbfrange <000000> <FFFFFF> <0041> "
            b"endbfrange endcmap")
    font = (b"<< /Type /Font /Subtype /Type0 /BaseFont /B "
            b"/ToUnicode 6 0 R >>")
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm <00000001> Tj ET"
    blob = _one_page_pdf(content, font, extra={6: _stream_obj(bomb)})
    out = extract_pdf_text(blob)  # must return, bounded
    assert len(out) <= 8
    garbage = b"\x00\xffnot a cmap at all <zz> beginbfchar <1"
    blob = _one_page_pdf(content, font, extra={6: _stream_obj(garbage)})
    extract_pdf_text(blob)  # no crash is the assertion
