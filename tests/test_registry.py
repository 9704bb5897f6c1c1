"""Dispatch registry parity (lib.go:9-24, marky.go:21-23, model_test.go)."""

from marky_spark.kernels import MEDIA_KINDS, REGISTRY, register


def test_registration_order_mirrors_reference():
    # lib.go:14-21: csv, docx, epub, xlsx, html, ipynb, pdf, pptx —
    # key order is load-bearing documentation of first-match precedence
    assert list(REGISTRY)[:8] == [
        "csv", "docx", "epub", "xlsx", "html", "ipynb", "pdf", "pptx"
    ]


def test_all_kernels_are_callable():
    for kind, kernel in REGISTRY.items():
        assert callable(kernel), kind


def test_register_extension_point():
    # Marky.RegisterConverter parity (marky.go:21-23)
    def custom(text):
        return [("markdown", f"custom:{text}", "")]

    register("customfmt", custom)
    try:
        from marky_spark.convert import convert_document

        row = convert_document("d1", [
            {"kind": "customfmt", "text": "x", "media_ref": "", "offset": 0}
        ])
        assert row["status"] == "ok"
        assert row["markdown"] == "custom:x"
    finally:
        REGISTRY.pop("customfmt", None)


def test_media_kinds_pass_through():
    assert {"image", "media"} <= set(MEDIA_KINDS)
    assert not (MEDIA_KINDS & set(REGISTRY))
