"""Real-world parity pins: the reference repo's own integration fixtures
(`/root/reference/test_files/`, README.md:167-175 of the reference) through
our kernels, output hash-locked.

These are the only tests that read outside the repo; they skip cleanly if
the reference checkout is absent. A hash change means a semantic change on
real-world input — deliberate changes must re-pin with an explanation.
"""

import base64
import hashlib
import os

import pytest

from marky_spark.convert import convert_document

REF_DIR = "/root/reference/test_files"

# format -> (sha256 of markdown, markdown length)
PINS = {
    "csv": ("a65f349dc0d88fe81b53c9bff273169853c159b6df9dc95b834e79816387c24f", 112),
    "html": ("615da3524ccce76487c5a2b704595c44ca4f3f7806c3064ef15cb46206648e48", 7371),
    "ipynb": ("08ef07914ee05c8c1b803450f954a48bec863c56e6ce344840d43987301e2fc9", 1194),
    "docx": ("01a367b87e65a529a8d32a7fa799b42426ab2e7c4085187962dc5b719d3befef", 4706),
    "xlsx": ("0b8138046eb6684cdf05db1296b3dc60f240673ed323199e514804db44915632", 594),
    "pptx": ("8a92ae3bd2d28d0f6e5ced5aa7cec4656f2fff558c15431d473e96695fa3a08f", 99885),
    "epub": ("7f7e0a54bc692a96b1e835a3d6380d39768f65ad750dde54d46af161956713f7", 145516),
    # pdf re-pinned 2026-08-18 when /Encoding /Differences + AGL names
    # landed: the physics paper's accents/quotes/Greek now decode for real
    # ("d'Annecy"→"d’Annecy", "D!decay"→"D→πππdecay"); unmapped symbol-font
    # glyphs surface as U+FFFD instead of silently-wrong cp1252 ASCII
    "pdf": ("94da4b032b28c9edfaf561bf8370e108c722f9682cc635286672be72fb7c2c4a", 43716),
}

# content spot-checks so a pin break points at the symptom, not just a hash
MUST_CONTAIN = {
    "csv": ["| --- |"],
    "html": ["AutoGen", "["],                      # links survive, chrome page converts
    "ipynb": ["```python"],
    "docx": ["AutoGen: Enabling Next-Gen LLM Applications"],
    "xlsx": ["| Alpha | Beta | Gamma | Delta |"],
    "pptx": ["<!-- Slide number: 1 -->", "# AutoGen"],
    "epub": ["**Title:** Alice's Adventures in Wonderland", "**Authors:** Lewis Carroll"],
    "pdf": ["SLAC-PUB-16505", "Universit´e de Savoie",
            "D→πππdecay"],
}

TEXT_KINDS = {"csv", "html", "ipynb"}

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference fixtures not available"
)


@needs_reference
@pytest.mark.parametrize("fmt", sorted(PINS))
def test_reference_fixture_output_pinned(fmt):
    raw = open(f"{REF_DIR}/test.{fmt}", "rb").read()
    text = raw.decode("utf-8") if fmt in TEXT_KINDS else base64.b64encode(raw).decode()
    r = convert_document("ref", [
        {"kind": fmt, "text": text, "media_ref": "", "offset": 0}
    ])
    assert r["status"] == "ok", r["error"]
    md = r["markdown"]
    for needle in MUST_CONTAIN[fmt]:
        assert needle in md, f"{fmt}: missing {needle!r}"
    digest, length = PINS[fmt]
    assert len(md) == length, f"{fmt}: length {len(md)} != pinned {length}"
    assert hashlib.sha256(md.encode()).hexdigest() == digest, (
        f"{fmt}: output drifted from pin"
    )
