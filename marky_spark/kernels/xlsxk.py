"""XLSX → Markdown table kernel (reference parity: internal/converters/excel.go).

stdlib ``zipfile`` + ``xml.etree`` reader replacing excelize (excel.go:41-64):

- **first sheet only** (workbook.xml sheet order; excel.go:53-58 —
  observable behavior: extra sheets are present but ignored);
- sharedStrings + inline strings resolved; formula cells use the cached
  ``<v>`` value ("formulas evaluated", excel_test.go:127);
- rows render through the *uniform* table renderer (O5, markdown.go) — same
  golden string as the CSV path (excel_test.go:66).
"""

from __future__ import annotations

from xml.etree import ElementTree as ET

from .base import ConvertError, Segment, decode_binary_payload, md
from .base import local_name as _local
from .fastzip import BadZip, open_zip
from .mdtable import to_markdown_table




def _ns_of(root: ET.Element) -> str:
    """'{uri}' prefix of the root element ('' when un-namespaced) — lets tag
    scans use Element.iter(exact_tag), which matches in C."""
    tag = root.tag
    return tag[: tag.index("}") + 1] if tag.startswith("{") else ""


def _attr(el: ET.Element, name: str) -> str | None:
    # spreadsheetML cell/row/sheet attributes are almost always unprefixed —
    # direct dict hit first, namespaced fallback second
    v = el.attrib.get(name)
    if v is not None:
        return v
    for k, v in el.attrib.items():
        if _local(k) == name:
            return v
    return None


def _parse(data: bytes) -> ET.Element:
    try:
        return ET.fromstring(data)
    except ET.ParseError as exc:
        raise ConvertError(f"invalid XML in workbook: {exc}") from exc


def _col_index(ref: str) -> int:
    """'B7' → 1 (0-based column)."""
    col = 0
    for ch in ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return col - 1


def _cell_value(cell: ET.Element, shared: list[str]) -> str:
    ctype = _attr(cell, "t") or "n"
    v = None
    inline = None
    for child in cell:
        name = _local(child.tag)
        if name == "v":
            v = child.text or ""
        elif name == "is":
            inline = "".join(
                t.text or "" for t in child.iter() if _local(t.tag) == "t"
            )
    if ctype == "s":
        try:
            return shared[int(v or "")]
        except (ValueError, IndexError):
            return ""
    if ctype == "inlineStr":
        return inline or ""
    if ctype == "b":
        return "TRUE" if (v or "") == "1" else "FALSE"
    return v or ""


def read_xlsx_rows(data: bytes) -> list[list[str]]:
    """All rows of the first sheet, gaps filled with '' (excelize GetRows)."""
    try:
        zf = open_zip(data)
    except BadZip as exc:
        raise ConvertError(f"unable to open Excel file: {exc}") from exc

    with zf:
        names = zf.names
        if "xl/workbook.xml" not in names:
            raise ConvertError("no workbook found in Excel file")

        workbook = _parse(zf.read("xl/workbook.xml"))
        sheets: list[tuple[str, str]] = []  # (name, r:id)
        for el in workbook.iter(_ns_of(workbook) + "sheet"):
            sheets.append((_attr(el, "name") or "", _attr(el, "id") or ""))
        if not sheets:
            # mixed-namespace fallback: C-level exact-tag scan found nothing,
            # re-scan namespace-agnostically before declaring the file empty
            for el in workbook.iter():
                if _local(el.tag) == "sheet":
                    sheets.append((_attr(el, "name") or "",
                                   _attr(el, "id") or ""))
        if not sheets:
            raise ConvertError("no sheets found in Excel file")

        # resolve first sheet target via workbook rels, fallback sheet1
        target = "worksheets/sheet1.xml"
        rels_name = "xl/_rels/workbook.xml.rels"
        if rels_name in names:
            rels_root = _parse(zf.read(rels_name))
            for rel in rels_root:
                if _local(rel.tag) == "Relationship" and rel.get("Id") == sheets[0][1]:
                    target = rel.get("Target") or target
        sheet_member = "xl/" + target.lstrip("/")
        if sheet_member not in names:
            raise ConvertError(f"sheet {sheet_member} not found")

        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            ss_root = _parse(zf.read("xl/sharedStrings.xml"))
            t_tag = _ns_of(ss_root) + "t"
            for si in ss_root:
                if _local(si.tag) == "si":
                    parts = [t.text or "" for t in si.iter(t_tag)]
                    if not parts:  # mixed-namespace fallback
                        parts = [t.text or "" for t in si.iter()
                                 if _local(t.tag) == "t"]
                    shared.append("".join(parts))

        sheet = _parse(zf.read(sheet_member))
        row_els = list(sheet.iter(_ns_of(sheet) + "row"))
        if not row_els:  # mixed-namespace fallback
            row_els = [el for el in sheet.iter() if _local(el.tag) == "row"]
        rows: list[list[str]] = []
        for row_el in row_els:
            cells: list[str] = []
            next_col = 0
            for cell in row_el:
                if _local(cell.tag) != "c":
                    continue
                ref = _attr(cell, "r")
                col = _col_index(ref) if ref else next_col
                while len(cells) < col:
                    cells.append("")
                value = _cell_value(cell, shared)
                cells.append(value)
                next_col = col + 1
            # trim trailing empty cells (excelize GetRows semantics)
            while cells and cells[-1] == "":
                cells.pop()
            rows.append(cells)
        # trim trailing fully-empty rows
        while rows and not rows[-1]:
            rows.pop()
        return rows


def convert_xlsx(text: str) -> list[Segment]:
    """excel.go:31-38 — read first sheet, render via the uniform renderer."""
    return [md(to_markdown_table(read_xlsx_rows(decode_binary_payload(text))))]
