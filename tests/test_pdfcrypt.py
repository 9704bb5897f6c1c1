"""PDF standard security handler (kernels/pdfcrypt + pdfk wiring):
published crypto vectors, empty-user-password decryption across RC4-40 /
RC4-128 / AES-128 (AESV2) / AES-256 (R6), typed pdf_encrypted
classification, string decryption, and the pdfmedia image path."""
from __future__ import annotations

import base64

import pytest

from marky_spark import fixtures as fx
from marky_spark.kernels.base import ConvertError
from marky_spark.kernels.pdfcrypt import (
    PdfEncryptedError,
    StdSecurityHandler,
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    _SBOX,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    rc4,
)
from marky_spark.kernels.pdfk import convert_pdf

PAGES = [[(72, 700, "hello encrypted world"), (72, 686, "second line")]]
VARIANTS = ("rc4-40", "rc4-128", "aesv2", "aes256")


def _md(blob: bytes) -> str:
    segs = convert_pdf(base64.b64encode(blob).decode())
    return "".join(text for _, text, _ in segs)


# ------------------------------------------------------ crypto vectors
def test_aes_fips197_vectors():
    """The generated S-box and both block directions against FIPS-197
    appendix B (AES-128) and C.3 (AES-256)."""
    assert _SBOX[0x00] == 0x63 and _SBOX[0x53] == 0xED
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct = bytes.fromhex("3925841d02dc09fbdc118597196a0b32")
    rks = _expand_key(key)
    assert _encrypt_block(rks, pt) == ct
    assert _decrypt_block(rks, ct) == pt
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                        "101112131415161718191a1b1c1d1e1f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    rks = _expand_key(key)
    assert _encrypt_block(rks, pt) == ct
    assert _decrypt_block(rks, ct) == pt


def test_rc4_known_answers():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert rc4(b"Secret", b"Attack at dawn").hex() == \
        "45a01f645fc35b383552544b9bf5"


def test_aes_cbc_round_trip_and_alignment():
    k, iv = bytes(range(16)), bytes(range(16, 32))
    data = bytes((i * 7) % 256 for i in range(64))
    assert aes_cbc_decrypt(k, iv, aes_cbc_encrypt(k, iv, data)) == data
    with pytest.raises(PdfEncryptedError, match="aligned"):
        aes_cbc_decrypt(k, iv, b"short")


# ------------------------------------------- empty-password decryption
@pytest.mark.parametrize("variant", VARIANTS)
def test_encrypted_pdf_decrypts_to_plain_markdown(variant):
    plain = _md(fx.pdf_bytes(PAGES))
    assert "hello encrypted world" in plain
    blob = fx.pdf_encrypt(fx.pdf_objects(PAGES), variant)
    assert _md(blob) == plain


@pytest.mark.parametrize("variant", VARIANTS)
def test_password_protected_is_typed(variant):
    blob = fx.pdf_encrypt(fx.pdf_objects(PAGES), variant,
                          password_required=True)
    with pytest.raises(ConvertError, match="pdf_encrypted"):
        convert_pdf(base64.b64encode(blob).decode())


def test_unsupported_handler_is_typed():
    objects = fx.pdf_objects(PAGES)
    n = max(objects) + 1
    objects[n] = b"<< /Filter /MyCustomSecurity /V 4 >>"
    blob = fx.pdf_assemble(objects,
                           trailer_extra=f"/Encrypt {n} 0 R ")
    with pytest.raises(ConvertError,
                       match="pdf_encrypted.*not supported"):
        convert_pdf(base64.b64encode(blob).decode())


def test_unsupported_revision_is_typed():
    enc = {"/Filter": "/Standard", "/V": 3, "/R": 3,
           "/O": b"\x00" * 32, "/U": b"\x00" * 32, "/P": -4}
    with pytest.raises(PdfEncryptedError, match="not supported"):
        StdSecurityHandler(enc, b"")


def test_strings_outside_streams_decrypt():
    """Literal strings in object dictionaries are encrypted per-object;
    the recursive walk in _Pdf.get must decrypt them (streams are
    covered by the markdown tests — this pins the string layer)."""
    from marky_spark.kernels.pdfk import _Pdf

    blob = fx.pdf_encrypt(fx.pdf_objects(PAGES), "rc4-128")
    pdf = _Pdf(blob)
    key = pdf._crypt.object_key(42, 0)
    secret = rc4(key, b"Attack at dawn")
    got = pdf._decrypt_parsed(
        {"/Title": secret, "/Nested": [secret, 7, "/Name"]}, 42, 0)
    assert got["/Title"] == b"Attack at dawn"
    assert got["/Nested"] == [b"Attack at dawn", 7, "/Name"]
    # AES string layer too
    blob = fx.pdf_encrypt(fx.pdf_objects(PAGES), "aesv2")
    pdf = _Pdf(blob)
    key = pdf._crypt.object_key(42, 0)
    iv = bytes(range(16))
    pt = b"Attack at dawn" + bytes([2]) * 2
    ct = iv + aes_cbc_encrypt(key, iv, pt)
    got = pdf._decrypt_parsed({"/Title": ct}, 42, 0)
    assert got["/Title"] == b"Attack at dawn"


def test_encrypted_pdf_image_xobjects_extract():
    """pdfmedia rides the same _Pdf machinery: an encrypted PDF's image
    XObject stream decrypts before codec routing."""
    from marky_spark.ops.pdfmedia import extract_pdf_images

    w = 12
    samples = bytes(range(40, 40 + w))
    img = (f"<< /Subtype /Image /Width {w} /Height 1 "
           f"/BitsPerComponent 8 /ColorSpace /DeviceGray "
           f"/Length {w} >>").encode() + \
        b"\nstream\n" + samples + b"\nendstream"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R "
            b"/Resources << /XObject << /Im0 5 0 R >> >> >>"),
        4: b"<< /Length 6 >>\nstream\nBT ET \nendstream",
        5: img,
    }
    from marky_spark.ops.pngcodec import png_decode

    for variant in VARIANTS:
        blob = fx.pdf_encrypt(objects, variant)
        out = extract_pdf_images(blob)
        assert len(out) == 1 and out[0]["ok"] == "ok", (variant, out)
        assert png_decode(out[0]["payload"]) == (w, 1, 1, samples)


def test_spark_convert_classifies_encrypted_rows(spark):
    """End-to-end: password-protected PDFs land as typed error rows
    whose message carries the pdf_encrypted classification; empty-
    password ones convert fine."""
    import pandas as pd

    from marky_spark.convert import convert
    from marky_spark.schema import INPUT_SCHEMA

    ok_blob = fx.pdf_encrypt(fx.pdf_objects(PAGES), "aesv2")
    locked = fx.pdf_encrypt(fx.pdf_objects(PAGES), "aes256",
                            password_required=True)
    rows = [
        ("open", [{"kind": "pdf",
                   "text": base64.b64encode(ok_blob).decode(),
                   "media_ref": "", "offset": 0}]),
        ("locked", [{"kind": "pdf",
                     "text": base64.b64encode(locked).decode(),
                     "media_ref": "", "offset": 0}]),
    ]
    df = spark.createDataFrame(rows, schema=INPUT_SCHEMA)
    got = {r["doc_id"]: r for r in convert(df).collect()}
    assert got["open"]["status"] == "ok"
    assert "hello encrypted world" in got["open"]["markdown"]
    assert got["locked"]["status"] == "error"
    assert "pdf_encrypted" in got["locked"]["error"]
