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


def test_accepted_extensions_and_mime_types_match_reference():
    """Exact-list port of every TestNew*Converter metadata assertion
    (csv_test.go:11-24 and siblings; lists verbatim from each converter's
    NewBaseConverter call)."""
    from marky_spark.kernels import accepted_extensions, accepted_mime_types

    assert accepted_extensions("csv") == (".csv",)
    assert accepted_mime_types("csv") == ("text/csv", "application/csv")
    assert accepted_extensions("docx") == (".docx", ".doc")
    assert accepted_mime_types("docx") == (
        "application/vnd.openxmlformats-officedocument"
        ".wordprocessingml.document",
        "application/vnd.openxmlformats-officedocument.wordprocessingml",
        "application/msword",
    )
    assert accepted_extensions("epub") == (".epub",)
    assert accepted_mime_types("epub") == (
        "application/epub", "application/epub+zip",
        "application/x-epub+zip",
    )
    assert accepted_extensions("xlsx") == (".xlsx", ".xls")
    assert accepted_mime_types("xlsx") == (
        "application/vnd.openxmlformats-officedocument"
        ".spreadsheetml.sheet",
        "application/vnd.openxmlformats-officedocument.spreadsheetml",
        "application/vnd.ms-excel",
    )
    assert accepted_extensions("html") == (".html", ".htm")
    assert accepted_mime_types("html") == ("text/html",)
    assert accepted_extensions("ipynb") == (".ipynb",)
    assert accepted_mime_types("ipynb") == (
        "application/x-ipynb+json", "application/json")
    assert accepted_extensions("pdf") == (".pdf",)
    assert accepted_mime_types("pdf") == ("application/pdf",)
    assert accepted_extensions("pptx") == (".pptx",)
    assert accepted_mime_types("pptx") == (
        "application/vnd.openxmlformats-officedocument"
        ".presentationml.presentation",
        "application/vnd.openxmlformats-officedocument.presentationml",
    )
    # unknown kinds return empty metadata, not an error (model_test.go
    # nil/empty-inputs contract)
    assert accepted_extensions("nope") == ()
    assert accepted_mime_types("nope") == ()


def test_every_registered_binary_or_text_kind_has_metadata():
    from marky_spark.kernels import CONVERTER_META, REGISTRY

    for kind in list(REGISTRY)[:8]:  # the 8 reference formats
        assert kind in CONVERTER_META, kind
