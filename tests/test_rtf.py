"""RTF kernel (kernels/rtfk — beyond-the-reference format): byte-exact
span goldens over the tokenizer/styling/table/link/unicode surface,
and the poison-pill contract on hostile input."""
import pytest

from marky_spark.kernels import ConvertError
from marky_spark.kernels.rtfk import convert_rtf


def _md(rtf: str) -> str:
    segs = convert_rtf(rtf)
    assert all(s[0] == "markdown" for s in segs)
    return "".join(s[1] for s in segs)


def test_basic_paragraphs_and_styles():
    # NB: one space after a control word is the word's delimiter and is
    # consumed (RTF 1.9.1 syntax) — writers double a space they mean
    out = _md(r"{\rtf1 first\par second \b bo\b0  \i it\i0  tail\par}")
    assert out == "first\n\nsecond **bo** *it* tail"


def test_group_scoped_styles_restore():
    out = _md(r"{\rtf1 a {\b inb {\i bi} back} out\par}")
    assert out == "a **inb** ***bi*** **back** out"


def test_heading_via_outlinelevel():
    assert _md(r"{\rtf1\pard\outlinelevel0 Top\par\pard body\par}") \
        == "# Top\n\nbody"
    assert _md(r"{\rtf1\pard\outlinelevel2 Sub\par}") == "### Sub"


def test_hex_unicode_and_fallback_skip():
    # \'e9 is cp1252 é; \u945? emits α and skips ONE fallback char
    assert _md(r"{\rtf1 caf\'e9 \u945?x\par}") == "café αx"
    # \uc2: two fallback chars are skipped (incl. a hex escape)
    assert _md(r"{\rtf1\uc2 \u945\'3f\'3fx\par}") == "αx"


def test_surrogate_pair_combines():
    assert _md(r"{\rtf1 \u-10179?\u-8704?\par}") == "😀"
    _md(r"{\rtf1 lone \u-10179? end\par}").encode("utf-8")  # never poisons


def test_skipped_destinations_and_ignorable_groups():
    out = _md(r"{\rtf1{\fonttbl{\f0 X;}}{\info{\title T}}"
              r"{\*\mystery {\b hidden}}shown\par}")
    assert out == "shown"


def test_specials_and_escapes():
    out = _md(r"{\rtf1 \emdash\endash\bullet x \\ \{ \} \~y\par}")
    assert out == "—–•x \\\\ { } \u00a0y"


def test_hyperlink_field():
    out = _md(r'{\rtf1 see {\field{\*\fldinst HYPERLINK '
              r'"https://a.io/p"}{\fldrslt the page}} end\par}')
    assert out == "see [the page](https://a.io/p) end"


def test_table_renders_uniform_pipe():
    out = _md(r"{\rtf1\trowd\cell h1\cell h2\cell\row"
              r"\trowd\cell a\cell b|c\cell\row\pard after\par}")
    assert out == ("|  | h1 | h2 |\n| --- | --- | --- |\n"
                   "|  | a | b\\|c |\n\nafter")


def test_markdown_specials_escaped():
    assert _md(r"{\rtf1 star*star tilde~tilde\par}") \
        == "star\\*star tilde\\~tilde"


def test_line_and_tab():
    assert _md(r"{\rtf1 a\line b\tab c\par}") == "a\nb\tc"


def test_hostile_inputs_raise_convert_error():
    with pytest.raises(ConvertError, match="rtf"):
        convert_rtf("plain text, not rtf")
    with pytest.raises(ConvertError, match="unbalanced"):
        convert_rtf(r"{\rtf1 {unclosed\par}")
    with pytest.raises(ConvertError, match="unbalanced"):
        convert_rtf(r"{\rtf1 too}many}braces}")
    with pytest.raises(ConvertError):
        convert_rtf("{\\rtf1 bad hex \\'g")


def test_mutation_fuzz_never_crashes():
    import random

    from marky_spark.corpus import extra_variant

    rng = random.Random(77)
    base = extra_variant("rtf", 9)
    for _ in range(300):
        chars = list(base)
        for _ in range(rng.randint(1, 5)):
            k = rng.randrange(len(chars))
            chars[k] = chr(rng.randrange(32, 127))
        try:
            out = convert_rtf("".join(chars))
            "".join(s[1] for s in out).encode("utf-8")
        except ConvertError:
            pass


def test_frozen_corpus_sample_matches_golden():
    import hashlib

    from marky_spark.convert import convert_document
    from marky_spark.corpus import make_extra_doc
    from marky_spark.frozen_golden import EXTRA_GOLDEN

    golden = {d: (h, n) for d, h, n in EXTRA_GOLDEN["rtf"]}
    for i in (0, 7, 31, 63, 200, 399):
        doc = make_extra_doc("rtf", i)
        row = convert_document(doc["doc_id"], [
            {"kind": s[0], "text": s[1], "media_ref": s[2], "offset": s[3]}
            for s in doc["spans"]])
        h, n = golden[doc["doc_id"]]
        assert row["status"] == "ok"
        assert hashlib.md5(row["markdown"].encode()).hexdigest() == h
        assert row["md_chars"] == n


def test_bin_control_skips_raw_bytes():
    """\\binN raw bytes (which may contain braces/backslashes) must not
    desync the group tokenizer."""
    rtf = "{\\rtf1 a {\\pict\\bin5 }}\\{x} b\\par}"
    #                           ^^^^^ 5 raw bytes: '}}\\{x'
    out = convert_rtf(rtf)[0][1]
    assert out == "a  b"   # one space each side of the pict group
    with pytest.raises(ConvertError, match="bin"):
        convert_rtf("{\\rtf1 \\bin99999 x}")
