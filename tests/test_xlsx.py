"""XLSX kernel contracts (excel.go + excel_test.go:32-127)."""

import pytest

from marky_spark import fixtures as fx
from marky_spark.kernels.base import ConvertError, segments_text
from marky_spark.kernels.xlsxk import convert_xlsx, read_xlsx_rows


BASIC = [
    ["Name", "Age", "City"],
    ["John", "30", "New York"],
    ["Jane", "25", "Los Angeles"],
]
BASIC_MD = (
    "| Name | Age | City |\n| --- | --- | --- |\n"
    "| John | 30 | New York |\n| Jane | 25 | Los Angeles |\n"
)


def test_basic_table_matches_csv_golden():
    # excel_test.go:66 — same golden string as the CSV path
    got = segments_text(convert_xlsx(fx.b64(fx.xlsx_zip(BASIC))))
    assert got == BASIC_MD


def test_first_sheet_only():
    # excel.go:53-58 — extra sheets present but ignored
    data = fx.xlsx_zip(BASIC, extra_sheets=[("Other", [["IGNORED"]])])
    got = segments_text(convert_xlsx(fx.b64(data)))
    assert got == BASIC_MD
    assert "IGNORED" not in got


def test_empty_workbook():
    # excel_test.go:72-95
    assert segments_text(convert_xlsx(fx.b64(fx.xlsx_zip([])))) == ""


def test_formula_cached_value():
    # excel_test.go:127 — formulas evaluated (cached <v>)
    data = fx.xlsx_zip([["X"]], with_formula=("C1", "42"))
    assert read_xlsx_rows(data) == [["X", "", "42"]]


def test_unicode_cells():
    data = fx.xlsx_zip([["名前", "年齢"], ["田中", "30"]])
    got = segments_text(convert_xlsx(fx.b64(data)))
    assert got == "| 名前 | 年齢 |\n| --- | --- |\n| 田中 | 30 |\n"


def test_invalid_zip_errors():
    with pytest.raises(ConvertError):
        convert_xlsx(fx.b64(b"garbage bytes"))


def test_zip_without_workbook_errors():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    with pytest.raises(ConvertError, match="no workbook"):
        convert_xlsx(fx.b64(buf.getvalue()))


def test_sparse_row_gap_filled():
    # cell refs with gaps → '' fill (GetRows parity)
    import io
    import zipfile

    sheet = (
        '<?xml version="1.0"?><worksheet xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row r="1">'
        '<c r="A1" t="str"><v>a</v></c><c r="C1" t="str"><v>c</v></c>'
        "</row></sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0"?><workbook xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    assert read_xlsx_rows(buf.getvalue()) == [["a", "", "c"]]
