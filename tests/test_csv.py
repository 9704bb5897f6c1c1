"""Ported contracts: /root/reference/internal/converters/csv_test.go."""

import pytest

from marky_spark.kernels.base import ConvertError, segments_text
from marky_spark.kernels.csvk import convert_csv, parse_csv


def md_of(text: str) -> str:
    return segments_text(convert_csv(text))


def test_basic_csv():
    # csv_test.go:46
    got = md_of("Name,Age,City\nJohn,30,New York\nJane,25,Los Angeles")
    assert got == (
        "| Name | Age | City |\n| --- | --- | --- |\n"
        "| John | 30 | New York |\n| Jane | 25 | Los Angeles |\n"
    )


def test_header_only():
    # csv_test.go:92
    assert md_of("Name,Age,City") == "| Name | Age | City |\n| --- | --- | --- |\n"


def test_empty_csv():
    # csv_test.go:52-72 — empty file converts to empty string
    assert md_of("") == ""


def test_quoted_fields():
    # csv_test.go:98-128 — quotes, embedded commas, "" escapes
    got = md_of(
        'Name,Quote\n"Smith, John","He said ""hi"""\n'
    )
    assert got == (
        "| Name | Quote |\n| --- | --- |\n"
        '| Smith, John | He said "hi" |\n'
    )


def test_pipe_escape():
    # csv_test.go:130-157
    got = md_of("Name,Val\nJohn,a|b")
    assert got == "| Name | Val |\n| --- | --- |\n| John | a\\|b |\n"


def test_unicode_with_trailing_empty_column():
    # test_files/test.csv style: Japanese CSV with trailing comma column
    got = md_of("名前,年齢,\n田中,30,\n")
    assert got == "| 名前 | 年齢 |  |\n| --- | --- | --- |\n| 田中 | 30 |  |\n"


def test_uneven_rows_error():
    # csv_test.go:159-186 — Go csv errors on inconsistent field counts
    with pytest.raises(ConvertError):
        convert_csv("a,b,c\nd,e\n")


def test_blank_lines_skipped():
    # Go encoding/csv skips empty lines rather than producing empty records
    got = md_of("a,b\n\nc,d\n")
    assert got == "| a | b |\n| --- | --- |\n| c | d |\n"


def test_crlf():
    assert parse_csv("a,b\r\nc,d\r\n") == [["a", "b"], ["c", "d"]]


def test_embedded_newline_in_quotes():
    assert parse_csv('a,b\n"x\ny",z\n') == [["a", "b"], ["x\ny", "z"]]


def test_bad_quoting_errors_like_go():
    """Go encoding/csv rejects extraneous quotes in a quoted field; so do we
    (csv strict mode), instead of silently mangling the cell."""
    import pytest

    from marky_spark.kernels.base import ConvertError
    from marky_spark.kernels.csvk import parse_csv

    with pytest.raises(ConvertError):
        parse_csv('a,"b"x,c\n1,2,3')


# ------------------------------------------------------------- TSV

def test_tsv_basic_and_quoting():
    from marky_spark.kernels.csvk import convert_tsv

    out = convert_tsv('a\tb\n"x\ty"\t2\n')[0][1]
    assert out == "| a | b |\n| --- | --- |\n| x\ty | 2 |\n"


def test_tsv_uneven_rows_error():
    import pytest as _pytest

    from marky_spark.kernels import ConvertError
    from marky_spark.kernels.csvk import convert_tsv

    with _pytest.raises(ConvertError, match="wrong number of fields"):
        convert_tsv("a\tb\n1\t2\t3\n")


def test_tsv_frozen_samples():
    import hashlib

    from marky_spark.convert import convert_document
    from marky_spark.corpus import make_extra_doc
    from marky_spark.frozen_golden import EXTRA_GOLDEN

    golden = {d: (h, n) for d, h, n in EXTRA_GOLDEN["tsv"]}
    for i in (0, 1, 4, 33, 399):
        doc = make_extra_doc("tsv", i)
        row = convert_document(doc["doc_id"], [
            {"kind": s[0], "text": s[1], "media_ref": s[2], "offset": s[3]}
            for s in doc["spans"]])
        h, n = golden[doc["doc_id"]]
        assert row["status"] == "ok"
        assert hashlib.md5(row["markdown"].encode()).hexdigest() == h
        assert row["md_chars"] == n
