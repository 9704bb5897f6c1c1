"""PPTX kernel contracts (pptx.go semantics; FIXTURES.md §3)."""

import pytest

from marky_spark import fixtures as fx
from marky_spark.kernels.base import ConvertError, segments_text
from marky_spark.kernels.pptxk import convert_pptx


def test_two_slide_deck_full():
    deck = fx.pptx_zip(
        slides=[
            fx.pptx_shape("Slide One Title") + fx.pptx_shape("Body text"),
            fx.pptx_pic(name="Pic", descr="A nice pic")
            + fx.pptx_table([["H1", "H2"], ["a&b", "c"]]),
        ],
        notes={1: "Remember this"},
        media={"ppt/media/image1.png": b"IMG"},
    )
    segs = convert_pptx(fx.b64(deck))
    got = segments_text(segs)
    assert got == (
        "<!-- Slide number: 1 -->\n"
        "# Slide One Title\n"
        "Body text\n"
        "\n\n### Notes:\nRemember this"
        "\n\n<!-- Slide number: 2 -->\n"
        "\n![A nice pic](data:image/png;base64,SU1H)\n"
        "| H1 | H2 |\n"
        "|---|---|\n"
        "| a&amp;b | c |"
    )
    img = next(s for s in segs if s[0] == "image")
    assert img[2] == "ppt/media/image1.png"


def test_first_textful_shape_is_title_only_once():
    deck = fx.pptx_zip(slides=[
        fx.pptx_shape("") + fx.pptx_shape("Real Title") + fx.pptx_shape("After")
    ])
    got = segments_text(convert_pptx(fx.b64(deck)))
    assert got == "<!-- Slide number: 1 -->\n# Real Title\nAfter"


def test_pic_without_media_falls_back_to_filename():
    # getImageData nil → sanitized alt + .jpg (pptx.go:346-348)
    deck = fx.pptx_zip(slides=[fx.pptx_pic(name="n", descr="A [big]\npic")])
    got = segments_text(convert_pptx(fx.b64(deck)))
    # alt cleaned: [\r\n\[\]]→' ', \s+→' ', trim; filename \W stripped
    assert got == "<!-- Slide number: 1 -->\n\n![A big pic](Abigpic.jpg)"


def test_groups_recursed_not_titled():
    deck = fx.pptx_zip(slides=[
        fx.pptx_shape("Title")
        + fx.pptx_group(fx.pptx_shape("Grouped text"))
    ])
    got = segments_text(convert_pptx(fx.b64(deck)))
    assert got == "<!-- Slide number: 1 -->\n# Title\nGrouped text"


def test_missing_slide_skipped():
    # 2 sldIds but only slide1.xml present → slide 2 silently skipped
    deck = fx.pptx_zip(slides=[fx.pptx_shape("Only")])
    # hand-edit: presentation claims 2 slides
    import io
    import zipfile

    src = zipfile.ZipFile(io.BytesIO(deck))
    members = {n: src.read(n) for n in src.namelist()}
    members["ppt/presentation.xml"] = members["ppt/presentation.xml"].replace(
        b"</p:sldIdLst>", b'<p:sldId id="999" r:id="rId9"/></p:sldIdLst>'
    )
    deck2 = fx._make_zip(members)
    got = segments_text(convert_pptx(fx.b64(deck2)))
    assert got == "<!-- Slide number: 1 -->\n# Only"


def test_no_presentation_xml_errors():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    with pytest.raises(ConvertError, match="presentation.xml not found"):
        convert_pptx(fx.b64(buf.getvalue()))


def test_invalid_zip_errors():
    with pytest.raises(ConvertError):
        convert_pptx(fx.b64(b"nope"))
