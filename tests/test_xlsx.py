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


def test_understated_eocd_count_falls_back_to_zipfile():
    """EOCD entry-count lying low must not silently drop members."""
    import io
    import struct
    import zipfile

    from marky_spark.kernels.fastzip import _StdlibZip, open_zip

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", b"A")
        z.writestr("b.txt", b"B")
    data = bytearray(buf.getvalue())
    eocd = data.rfind(b"PK\x05\x06")
    # patch both entry-count fields from 2 to 1
    struct.pack_into("<2H", data, eocd + 8, 1, 1)
    z = open_zip(bytes(data))
    assert isinstance(z, _StdlibZip)  # deferred to stdlib, not silently cut
    assert set(z.namelist()) == {"a.txt", "b.txt"}


def test_mixed_namespace_xlsx_still_converts():
    """Sheet/row/t elements in a namespace differing from the root must hit
    the namespace-agnostic fallback scans."""
    import io
    import zipfile

    from marky_spark.kernels.xlsxk import read_xlsx_rows

    wb = (b'<?xml version="1.0"?>'
          b'<workbook xmlns="urn:root">'
          b'<sheets><sheet xmlns="urn:other" name="S1" r:id="rId1" '
          b'xmlns:r="urn:r"/></sheets></workbook>')
    sheet = (b'<?xml version="1.0"?>'
             b'<worksheet xmlns="urn:root"><sheetData>'
             b'<row xmlns="urn:other" r="1">'
             b'<c r="A1" t="inlineStr"><is><t>hello</t></is></c>'
             b'</row></sheetData></worksheet>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    rows = read_xlsx_rows(buf.getvalue())
    assert rows == [["hello"]]
