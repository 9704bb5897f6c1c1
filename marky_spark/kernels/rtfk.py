"""RTF → Markdown kernel (beyond-the-reference format).

The reference converts csv/docx/epub/xlsx/html/ipynb/pdf/pptx
(lib.go:14-21); RTF is not among them, but real crawl corpora carry
plenty of legacy ``.rtf`` — this kernel extends the registry the same
way the reference's ``RegisterConverter`` (marky.go:21-23) invites.

Written from the public RTF 1.9.1 specification (Microsoft, Word 2007
release).  Implemented subset — the constructs Word-family writers
actually emit for text content:

- the tokenizer: groups ``{}`` with full state save/restore, control
  words ``\\word[-]N`` with the optional trailing space, control
  symbols (``\\~`` nbsp, ``\\-`` soft hyphen, ``\\_``, escaped
  ``\\\\ \\{ \\}``), hex bytes ``\\'hh`` (cp1252), and ``\\uN`` unicode
  with the ``\\ucN`` fallback-skip protocol (including negative N +
  65536),
- skipped destinations: fonttbl / colortbl / stylesheet / info /
  pict / themedata / generator and every ``{\\*\\...}`` group this
  kernel does not know (the spec's ignorable-destination contract),
- paragraphs (``\\par``, ``\\pard`` reset), ``\\line``, ``\\tab``,
  ``\\page``,
- run styling ``\\b`` / ``\\i`` (group-scoped, emitted as ``**``/``*``
  with the docx kernel's escape set on text content),
- headings via ``\\outlinelevelN`` (0-8 → ``#``..``#########``),
- tables: ``\\trowd`` / ``\\cell`` / ``\\row`` accumulate rows that
  render through the reference's UNIFORM pipe-table renderer
  (mdtable.to_markdown_table — the csv/xlsx emitter, the natural
  choice for a beyond-reference format),
- hyperlink fields ``{\\field{\\*\\fldinst HYPERLINK "url"}
  {\\fldrslt text}}`` → ``[text](url)``,
- special characters: ``\\emdash`` ``\\endash`` ``\\bullet``
  ``\\lquote`` ``\\rquote`` ``\\ldblquote`` ``\\rdblquote``.

Hostile input (unbalanced groups, truncated hex, non-RTF bytes) raises
:class:`ConvertError` — the registry's poison-pill contract.
"""
from __future__ import annotations

import re

from .base import ConvertError, Segment, md, merge_markdown
from .mdtable import _escape, to_markdown_table

_SPECIALS = {
    "emdash": "\u2014",
    "endash": "\u2013",
    "bullet": "\u2022",
    "lquote": "\u2018",
    "rquote": "\u2019",
    "ldblquote": "\u201c",
    "rdblquote": "\u201d",
    "tab": "\t",
}

# groups whose content is metadata / binary, never document text
_SKIP_DESTINATIONS = frozenset({
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "themedata",
    "generator", "listtable", "listoverridetable", "latentstyles",
    "datastore", "xmlnstbl", "header", "footer", "footnote",
})

_CONTROL_RE = re.compile(r"[a-zA-Z]+")
_NUM_RE = re.compile(r"-?\d+")


class _State:
    __slots__ = ("bold", "italic", "ucskip", "skip_dest", "in_field",
                 "in_fldrslt")

    def __init__(self):
        self.bold = False
        self.italic = False
        self.ucskip = 1
        self.skip_dest = False
        self.in_field = False
        self.in_fldrslt = False

    def copy(self) -> "_State":
        s = _State.__new__(_State)
        s.bold = self.bold
        s.italic = self.italic
        s.ucskip = self.ucskip
        s.skip_dest = self.skip_dest
        s.in_field = self.in_field
        s.in_fldrslt = self.in_fldrslt
        return s


_RAW = "\x00"        # marker: run text already rendered/escaped


class _Doc:
    """Paragraph/run accumulator shared across groups."""

    def __init__(self):
        self.blocks: list[str] = []      # finished markdown blocks
        self.runs: list[tuple[str, bool, bool]] = []   # (text, b, i)
        self.heading = 0                 # 1-9 when \outlinelevelN seen
        self.in_table_row = False
        self.cell_runs: list[tuple[str, bool, bool]] = []
        self.cells: list[str] = []
        self.table_rows: list[list[str]] = []
        self.field_url: str | None = None
        self.field_text: list[str] = []

    # ---- text emission -------------------------------------------------
    def put(self, text: str, st: _State) -> None:
        if not text:
            return
        if st.in_field:
            if st.in_fldrslt:
                self.field_text.append(text)
            return
        target = self.cell_runs if self.in_table_row else self.runs
        if target and target[-1][1] == st.bold and target[-1][2] == st.italic:
            target[-1] = (target[-1][0] + text, st.bold, st.italic)
        else:
            target.append((text, st.bold, st.italic))

    @staticmethod
    def _render_runs(runs: list[tuple[str, bool, bool]]) -> str:
        out: list[str] = []
        for text, b, i in runs:
            if text.startswith(_RAW):    # pre-rendered markdown (links)
                out.append(text[1:])
                continue
            body = _escape(text, "*~\\")
            core = body.strip()
            if core and (b or i):
                # keep edge whitespace OUTSIDE the markers so adjacent
                # styled runs never glue into ambiguous ***...* runs
                lead = body[:len(body) - len(body.lstrip())]
                trail = body[len(body.rstrip()):]
                if b:
                    core = f"**{core}**"
                if i:
                    core = f"*{core}*"
                body = lead + core + trail
            out.append(body)
        return "".join(out)

    # ---- structure -----------------------------------------------------
    def flush_table(self) -> None:
        if self.table_rows:
            self.blocks.append(to_markdown_table(self.table_rows).rstrip("\n"))
            self.table_rows = []

    def end_paragraph(self) -> None:
        text = self._render_runs(self.runs).strip()
        self.runs = []
        if not text:
            self.heading = 0
            return
        self.flush_table()
        if self.heading:
            text = "#" * min(self.heading, 6) + " " + text
        self.blocks.append(text)
        self.heading = 0

    def end_cell(self) -> None:
        self.cells.append(self._render_runs(self.cell_runs).strip())
        self.cell_runs = []

    def end_row(self) -> None:
        if self.cells:
            self.table_rows.append(self.cells)
        self.cells = []
        self.in_table_row = False

    def end_field(self) -> None:
        text = "".join(self.field_text).strip()
        url = (self.field_url or "").strip()
        self.field_text = []
        self.field_url = None
        if url:
            label = _escape(text or url, "[]")
            self.put_raw(f"[{label}]({_escape(url, '()')})")
        elif text:
            self.put_raw(_escape(text, "*~\\"))

    def put_raw(self, rendered: str) -> None:
        target = self.cell_runs if self.in_table_row else self.runs
        # raw markdown rides as an un-styled pre-escaped run
        target.append((_RAW + rendered, False, False))


def _finalize(doc: _Doc) -> str:
    doc.end_paragraph()
    doc.flush_table()
    text = "\n\n".join(b for b in doc.blocks if b.strip())
    if any(0xD800 <= ord(c) <= 0xDFFF for c in text):
        # a surrogate half that never found its partner (hostile or
        # truncated \u sequences) must not poison utf-8 encoding later
        text = "".join("\ufffd" if 0xD800 <= ord(c) <= 0xDFFF else c
                       for c in text)
    return text


def convert_rtf(text: str) -> list[Segment]:
    """RTF source text → markdown segments (registry kernel)."""
    src = text
    if not src.lstrip().startswith("{\\rtf"):
        raise ConvertError("not an RTF document (missing {\\rtf header)")
    doc = _Doc()
    st = _State()
    stack: list[_State] = []
    fldinst_buf: list[str] | None = None
    pending_high: int | None = None    # \u high-surrogate half
    i = 0
    n = len(src)
    while i < n:
        c = src[i]
        if c == "{":
            stack.append(st)
            st = st.copy()
            i += 1
            continue
        if c == "}":
            if not stack:
                raise ConvertError("unbalanced RTF group (stray })")
            leaving = st
            st = stack.pop()
            if leaving.in_field and not st.in_field:
                if fldinst_buf is not None:
                    m = re.search(r'HYPERLINK\s+"?([^"\\]+)"?',
                                  "".join(fldinst_buf))
                    doc.field_url = m.group(1) if m else None
                    fldinst_buf = None
                doc.end_field()
            i += 1
            continue
        if c == "\\":
            if i + 1 >= n:
                raise ConvertError("truncated RTF control")
            nxt = src[i + 1]
            if nxt == "'":
                if i + 4 > n:
                    raise ConvertError("truncated \\'hh escape")
                try:
                    ch = bytes([int(src[i + 2:i + 4], 16)]).decode(
                        "cp1252", "replace")
                except ValueError as exc:
                    raise ConvertError(f"bad hex escape: {exc}") from exc
                if not st.skip_dest:
                    if fldinst_buf is not None and st.in_field \
                            and not st.in_fldrslt:
                        fldinst_buf.append(ch)
                    else:
                        doc.put(ch, st)
                i += 4
                continue
            if nxt in "\\{}":
                if not st.skip_dest:
                    doc.put(nxt, st)
                i += 2
                continue
            if nxt == "~":
                if not st.skip_dest:
                    doc.put("\u00a0", st)
                i += 2
                continue
            if nxt in "-_":
                i += 2      # soft hyphen / nb hyphen: drop / hyphen
                if not st.skip_dest and nxt == "_":
                    doc.put("-", st)
                continue
            if nxt == "*":
                # ignorable destination: peek the control word; skip
                # the group unless it's one we implement (fldinst)
                m = _CONTROL_RE.match(src, i + 3) if i + 2 < n else None
                word = m.group(0) if m else ""
                if word != "fldinst":
                    st.skip_dest = True
                i += 2
                continue
            m = _CONTROL_RE.match(src, i + 1)
            if m is None:
                # unknown control symbol: ignore it
                i += 2
                continue
            word = m.group(0)
            j = m.end()
            num = None
            nm = _NUM_RE.match(src, j)
            if nm:
                num = int(nm.group(0))
                j = nm.end()
            if j < n and src[j] == " ":
                j += 1
            i = j
            # ---- control word semantics ----
            if word == "bin":
                # \binN: N RAW bytes follow (may contain braces and
                # backslashes) — they must be skipped even inside a
                # skipped destination, or the tokenizer desyncs
                skip_n = max(num or 0, 0)
                if skip_n > n - i:
                    raise ConvertError("\\bin length overruns the input")
                i += skip_n
                continue
            if st.skip_dest:
                continue
            if word in _SKIP_DESTINATIONS:
                st.skip_dest = True
            elif word == "field":
                st.in_field = True
                doc.field_text = []
            elif word == "fldinst":
                fldinst_buf = []
            elif word == "fldrslt":
                st.in_fldrslt = True
            elif word == "u":
                if num is None:
                    continue
                cp = num + 65536 if num < 0 else num
                if 0xD800 <= cp <= 0xDBFF:
                    pending_high = cp        # high surrogate: wait for low
                    ch = ""
                elif 0xDC00 <= cp <= 0xDFFF:
                    if pending_high is not None:
                        ch = chr(0x10000
                                 + ((pending_high - 0xD800) << 10)
                                 + (cp - 0xDC00))
                    else:
                        ch = "\ufffd"       # lone low surrogate
                    pending_high = None
                else:
                    if pending_high is not None:
                        doc.put("\ufffd", st)   # abandoned high surrogate
                        pending_high = None
                    ch = chr(cp) if 0 <= cp < 0x110000 else "\ufffd"
                if ch and fldinst_buf is not None and st.in_field \
                        and not st.in_fldrslt:
                    fldinst_buf.append(ch)
                elif ch:
                    doc.put(ch, st)
                # the \ucN fallback characters follow — skip them
                skipped = 0
                while skipped < st.ucskip and i < n:
                    if src[i] == "\\" and i + 3 < n and src[i + 1] == "'":
                        i += 4
                    elif src[i] in "{}":
                        break
                    else:
                        i += 1
                    skipped += 1
            elif word == "uc":
                st.ucskip = num if num is not None else 1
            elif word == "par":
                if doc.in_table_row:
                    continue      # \par inside a cell: soft break
                doc.end_paragraph()
            elif word == "pard":
                doc.heading = 0
            elif word == "line":
                doc.put("\n", st)
            elif word == "page":
                doc.end_paragraph()
            elif word == "b":
                st.bold = num != 0 if num is not None else True
            elif word == "i":
                st.italic = num != 0 if num is not None else True
            elif word == "outlinelevel":
                if num is not None and 0 <= num <= 8:
                    doc.heading = num + 1
            elif word == "trowd":
                doc.end_paragraph()
                doc.in_table_row = True
            elif word == "cell":
                doc.in_table_row = True
                doc.end_cell()
            elif word == "row":
                doc.end_row()
            elif word in _SPECIALS:
                doc.put(_SPECIALS[word], st)
            # every other control word is formatting noise: ignored
            continue
        if c in "\r\n":
            i += 1
            continue
        # plain text run (up to the next delimiter)
        j = i
        while j < n and src[j] not in "\\{}\r\n":
            j += 1
        if not st.skip_dest:
            chunk = src[i:j]
            if fldinst_buf is not None and st.in_field and not st.in_fldrslt:
                fldinst_buf.append(chunk)
            else:
                doc.put(chunk, st)
        i = j
    if stack:
        raise ConvertError("unbalanced RTF group (unclosed {)")
    return merge_markdown([md(_finalize(doc))])
