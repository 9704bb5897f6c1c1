"""The three Markdown table renderers of the reference.

The reference implements three *mutually different* table emitters; they must
not be cross-contaminated (SURVEY.md §7.3):

1. ``to_markdown_table``      — uniform renderer used by CSV/XLSX
                                 (internal/utils/markdown.go:10-56)
2. ``docx_table``             — width-padded renderer with a synthesized empty
                                 header row (internal/converters/docx.go:449-557)
3. ``pptx_table``             — html-escaped compact renderer
                                 (internal/converters/pptx.go:381-422)
"""

from __future__ import annotations

from .runewidth import string_width


def to_markdown_table(rows: list[list[str]]) -> str:
    """Uniform pipe table. markdown.go:10-56.

    Header = row 0; every data row is padded/truncated to the header width;
    cells are trimmed and ``|`` is escaped as ``\\|``.
    """
    if not rows or not rows[0]:
        return ""

    width = len(rows[0])
    out: list[str] = []

    cells = [c.strip().replace("|", "\\|") for c in rows[0]]
    out.append("|" + "".join(f" {c} |" for c in cells))
    out.append("\n|" + " --- |" * width + "\n")

    for row in rows[1:]:
        parts = ["|"]
        for i in range(width):
            cell = row[i].strip().replace("|", "\\|") if i < len(row) else ""
            parts.append(f" {cell} |")
        parts.append("\n")
        out.append("".join(parts))

    return "".join(out)


def _escape(s: str, charset: str) -> str:
    """Backslash-escape every character of ``charset`` in ONE pass
    (Go strings.NewReplacer semantics — inserted backslashes are never
    re-escaped). docx.go:167-174."""
    if not any(c in s for c in charset):
        return s  # nothing to escape (the overwhelmingly common case)
    cs = frozenset(charset)
    return "".join("\\" + ch if ch in cs else ch for ch in s)


def docx_table(rows: list[list[str]]) -> str:
    """Width-padded table with empty synthesized header. docx.go:449-557.

    Column widths come from :func:`string_width` display widths of the *raw*
    cells (the pipe-escape backslashes are not counted — reference parity:
    docx.go:539-541 computes the width before escaping).
    """
    if not rows:
        return ""

    maxcol = max(len(r) for r in rows)
    widths = [0] * maxcol
    for row in rows:
        for i in range(maxcol):
            if i < len(row):
                w = string_width(row[i])
                if w > widths[i]:
                    widths[i] = w

    out: list[str] = []
    for i, row in enumerate(rows):
        if i == 0:
            # empty header row + dash separator sized to column widths
            out.append("".join("|" + " " * widths[j] for j in range(maxcol)) + "|\n")
            out.append("".join("|" + "-" * widths[j] for j in range(maxcol)) + "|\n")
        parts = []
        for j in range(maxcol):
            parts.append("|")
            if j < len(row):
                w = string_width(row[j])
                parts.append(_escape(row[j], "|"))
                parts.append(" " * (widths[j] - w))
            else:
                parts.append(" " * widths[j])
        parts.append("|\n")
        out.append("".join(parts))
    out.append("\n")
    return "".join(out)


def _go_html_escape(s: str) -> str:
    """Go ``html.EscapeString`` parity: escapes ``<>&'\"`` with ``&#39;``/``&#34;``."""
    return (
        s.replace("&", "&amp;")
        .replace("'", "&#39;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&#34;")
    )


def pptx_table(rows: list[list[str]]) -> str:
    """Compact html-escaped table. pptx.go:381-422.

    Row 0 is the header, separator is ``|---|`` per header cell, every cell is
    html-escaped (Go ``html.EscapeString`` semantics).
    """
    if not rows:
        return ""

    out: list[str] = []
    header = rows[0]
    out.append("|" + "".join(f" {_go_html_escape(c)} |" for c in header) + "\n")
    out.append("|" + "---|" * len(header) + "\n")
    for row in rows[1:]:
        out.append("|" + "".join(f" {_go_html_escape(c)} |" for c in row) + "\n")
    return "".join(out)


__all__ = ["to_markdown_table", "docx_table", "pptx_table", "_escape"]
