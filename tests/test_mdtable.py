"""Ported contracts: markdown_test.go:15-175 (uniform renderer), plus the
docx (docx.go:449-557) and pptx (pptx.go:381-422) renderers."""

from marky_spark.kernels.mdtable import docx_table, pptx_table, to_markdown_table


def test_empty_input():
    assert to_markdown_table([]) == ""


def test_empty_first_row():
    assert to_markdown_table([[]]) == ""


def test_single_row():
    # markdown_test.go:15-27
    assert (
        to_markdown_table([["Name", "Age", "City"]])
        == "| Name | Age | City |\n| --- | --- | --- |\n"
    )


def test_multiple_rows():
    # markdown_test.go:29-43
    got = to_markdown_table(
        [
            ["Name", "Age", "City"],
            ["John", "30", "New York"],
            ["Jane", "25", "Los Angeles"],
        ]
    )
    assert got == (
        "| Name | Age | City |\n| --- | --- | --- |\n"
        "| John | 30 | New York |\n| Jane | 25 | Los Angeles |\n"
    )


def test_escape_pipes():
    # markdown_test.go:45-58
    got = to_markdown_table(
        [
            ["Name", "Description"],
            ["John", "Works at Company|Inc"],
            ["Jane", "Has pipe | character"],
        ]
    )
    assert got == (
        "| Name | Description |\n| --- | --- |\n"
        "| John | Works at Company\\|Inc |\n| Jane | Has pipe \\| character |\n"
    )


def test_trim_whitespace():
    # markdown_test.go:60-73
    got = to_markdown_table(
        [["  Name  ", " Age ", "City   "], [" John ", "30  ", "  New York "]]
    )
    assert got == "| Name | Age | City |\n| --- | --- | --- |\n| John | 30 | New York |\n"


def test_uneven_rows():
    # markdown_test.go:75-92 — pad missing, truncate extra
    got = to_markdown_table(
        [
            ["Name", "Age", "City", "Country"],
            ["John", "30", "New York"],
            ["Jane", "25"],
            ["Bob", "35", "Chicago", "USA", "Extra"],
        ]
    )
    assert got == (
        "| Name | Age | City | Country |\n| --- | --- | --- | --- |\n"
        "| John | 30 | New York |  |\n| Jane | 25 |  |  |\n"
        "| Bob | 35 | Chicago | USA |\n"
    )


def test_empty_strings():
    got = to_markdown_table(
        [["Name", "Age", "City"], ["John", "", "New York"], ["", "25", ""]]
    )
    assert got == (
        "| Name | Age | City |\n| --- | --- | --- |\n"
        "| John |  | New York |\n|  | 25 |  |\n"
    )


def test_unicode_preserved():
    got = to_markdown_table([["名前", "年齢"], ["田中", "30"]])
    assert got == "| 名前 | 年齢 |\n| --- | --- |\n| 田中 | 30 |\n"


# --- docx width-padded renderer (docx.go:449-557) ---


def test_docx_table_basic():
    got = docx_table([["ab", "c"], ["d", "efgh"]])
    # widths: col0=2, col1=4; synthesized empty header + dash separator
    assert got == (
        "|  |    |\n"
        "|--|----|\n"
        "|ab|c   |\n"
        "|d |efgh|\n"
        "\n"
    )


def test_docx_table_cjk_width():
    # CJK chars count as 2 columns (StringWidth) — docx.go:504-517
    got = docx_table([["中", "x"], ["ab", "y"]])
    assert got == (
        "|  | |\n"
        "|--|-|\n"
        "|中|x|\n"
        "|ab|y|\n"
        "\n"
    )


def test_docx_table_pipe_escape_and_ragged():
    got = docx_table([["a|b"], ["c", "d"]])
    # maxcol=2; widths: col0=max(3,1)=3 (raw "a|b" width 3), col1=1
    assert got == (
        "|   | |\n"
        "|---|-|\n"
        "|a\\|b| |\n"
        "|c  |d|\n"
        "\n"
    )


def test_docx_table_empty():
    assert docx_table([]) == ""


# --- pptx renderer (pptx.go:381-422) ---


def test_pptx_table():
    got = pptx_table([["Name", "A&B"], ["John", "<30>"]])
    assert got == (
        "| Name | A&amp;B |\n"
        "|---|---|\n"
        "| John | &lt;30&gt; |\n"
    )


def test_pptx_table_quotes():
    # Go html.EscapeString: ' → &#39;, " → &#34;
    got = pptx_table([["a'b", 'c"d']])
    assert got == "| a&#39;b | c&#34;d |\n|---|---|\n"
