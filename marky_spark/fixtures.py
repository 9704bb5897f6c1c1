"""Deterministic in-memory builders for binary-format fixtures.

Used by the golden tests and by the scaled corpus generator: every builder is
a pure function of its arguments (fixed zip timestamps, no compression
nondeterminism), so the corpus is byte-stable across runs and machines.
"""

from __future__ import annotations

import base64
import io
import zipfile
from xml.sax.saxutils import escape as _x

_ZIP_TIME = (1980, 1, 1, 0, 0, 0)


def _make_zip(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            info = zipfile.ZipInfo(name, date_time=_ZIP_TIME)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()


def b64(data: bytes) -> str:
    return base64.b64encode(data).decode("ascii")


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_R = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
_A = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'


def docx_zip(body_xml: str, rels: dict[str, str] | None = None,
             numbering_xml: str | None = None,
             media: dict[str, bytes] | None = None) -> bytes:
    """Minimal OOXML zip. ``body_xml`` goes inside <w:body>; ``rels`` maps
    rId → Target; ``media`` maps zip-member-relative target → bytes."""
    members: dict[str, bytes] = {
        "[Content_Types].xml": b"<Types/>",
        "word/document.xml": (
            f'<?xml version="1.0"?><w:document {_W} {_R} {_A}>'
            f"<w:body>{body_xml}</w:body></w:document>"
        ).encode(),
    }
    rel_items = "".join(
        f'<Relationship Id="{rid}" Type="t" Target="{target}"/>'
        for rid, target in (rels or {}).items()
    )
    members["word/_rels/document.xml.rels"] = (
        '<?xml version="1.0"?><Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{rel_items}</Relationships>"
    ).encode()
    if numbering_xml is not None:
        members["word/numbering.xml"] = numbering_xml.encode()
    for target, blob in (media or {}).items():
        members[f"word/{target}"] = blob
    return _make_zip(members)


def docx_paragraph(text: str, bold: bool = False, italic: bool = False,
                   strike: bool = False, style: str | None = None) -> str:
    rpr = ""
    if bold or italic or strike:
        rpr = ("<w:rPr>" + ("<w:b/>" if bold else "")
               + ("<w:i/>" if italic else "")
               + ("<w:strike/>" if strike else "") + "</w:rPr>")
    ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
    return f"<w:p>{ppr}<w:r>{rpr}<w:t>{_x(text)}</w:t></w:r></w:p>"


NUMBERING_XML = (
    '<?xml version="1.0"?>'
    f"<w:numbering {_W}>"
    '<w:abstractNum w:abstractNumId="0">'
    '<w:lvl w:ilvl="0"><w:start w:val="1"/><w:numFmt w:val="decimal"/>'
    '<w:pPr><w:ind w:left="360"/></w:pPr></w:lvl>'
    '<w:lvl w:ilvl="1"><w:start w:val="1"/><w:numFmt w:val="bullet"/>'
    '<w:pPr><w:ind w:left="720"/></w:pPr></w:lvl>'
    "</w:abstractNum>"
    '<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>'
    "</w:numbering>"
)


def docx_numbering(num_ids: tuple[int, ...] = (1, 2),
                   fmts: tuple[str, ...] = ("decimal", "bullet",
                                            "aiueoFullWidth")) -> str:
    """numbering.xml with one abstract definition (one level per entry of
    ``fmts``) shared by every ``num_ids`` entry — two nums over the same
    abstract numbering is exactly the shape that exercises the kernel's
    per-(numId, indent) counter restarts (docx.go:438-447)."""
    lvls = "".join(
        f'<w:lvl w:ilvl="{i}"><w:start w:val="1"/>'
        f'<w:numFmt w:val="{f}"/>'
        f'<w:pPr><w:ind w:left="{360 * (i + 1)}"/></w:pPr></w:lvl>'
        for i, f in enumerate(fmts)
    )
    nums = "".join(
        f'<w:num w:numId="{n}"><w:abstractNumId w:val="0"/></w:num>'
        for n in num_ids
    )
    return (
        '<?xml version="1.0"?>'
        f"<w:numbering {_W}>"
        f'<w:abstractNum w:abstractNumId="0">{lvls}</w:abstractNum>'
        f"{nums}</w:numbering>"
    )


def docx_indent_paragraph(text: str, left: int) -> str:
    """Paragraph with a w:ind left-indent (docx.go:321-327 two-space-per-360
    contract)."""
    return (
        f'<w:p><w:pPr><w:ind w:left="{left}"/></w:pPr>'
        f"<w:r><w:t>{_x(text)}</w:t></w:r></w:p>"
    )


def docx_list_paragraph(text: str, num_id: int = 1, ilvl: int = 0) -> str:
    return (
        "<w:p><w:pPr><w:numPr>"
        f'<w:ilvl w:val="{ilvl}"/><w:numId w:val="{num_id}"/>'
        f"</w:numPr></w:pPr><w:r><w:t>{_x(text)}</w:t></w:r></w:p>"
    )


def docx_table_xml(rows: list[list[str]]) -> str:
    trs = "".join(
        "<w:tr>" + "".join(
            f"<w:tc><w:p><w:r><w:t>{_x(c)}</w:t></w:r></w:p></w:tc>" for c in row
        ) + "</w:tr>"
        for row in rows
    )
    return f"<w:tbl>{trs}</w:tbl>"


def docx_hyperlink(text: str, rid: str) -> str:
    return (
        f'<w:p><w:hyperlink r:id="{rid}">'
        f"<w:r><w:t>{_x(text)}</w:t></w:r></w:hyperlink></w:p>"
    )


def docx_image(rid: str) -> str:
    return (
        "<w:p><w:r><w:drawing><wp:inline "
        'xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing">'
        f'<a:blip r:embed="{rid}"/></wp:inline></w:drawing></w:r></w:p>'
    )


def docx_textbox(text: str) -> str:
    return (
        "<w:p><w:r><w:pict><v:shape "
        'xmlns:v="urn:schemas-microsoft-com:vml"><v:textbox>'
        f"<w:txbxContent><w:p><w:r><w:t>{_x(text)}</w:t></w:r></w:p></w:txbxContent>"
        "</v:textbox></v:shape></w:pict></w:r></w:p>"
    )


# ---------------------------------------------------------------------------
# XLSX
# ---------------------------------------------------------------------------


def xlsx_zip(rows: list[list[str]], sheet_name: str = "Sheet1",
             extra_sheets: list[tuple[str, list[list[str]]]] | None = None,
             with_formula: tuple[str, str] | None = None) -> bytes:
    """Minimal xlsx with sharedStrings; optional extra (ignored) sheets and a
    formula cell (ref, cached_value) appended to row 1 of the first sheet."""
    shared: list[str] = []

    def cell_xml(ref: str, value: str) -> str:
        if value not in shared:
            shared.append(value)
        return f'<c r="{ref}" t="s"><v>{shared.index(value)}</v></c>'

    def col_ref(ci: int) -> str:
        # 0 -> A, 25 -> Z, 26 -> AA (bijective base-26)
        out = ""
        ci += 1
        while ci:
            ci, rem = divmod(ci - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    def sheet_xml(data: list[list[str]]) -> str:
        row_parts = []
        for ri, row in enumerate(data, start=1):
            cells = "".join(
                cell_xml(f"{col_ref(ci)}{ri}", v)
                for ci, v in enumerate(row)
            )
            row_parts.append(f'<row r="{ri}">{cells}</row>')
        return (
            '<?xml version="1.0"?><worksheet xmlns='
            '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(row_parts)}</sheetData></worksheet>"
        )

    sheets = [(sheet_name, rows)] + list(extra_sheets or [])
    sheet_xmls = [sheet_xml(data) for _, data in sheets]

    if with_formula:
        ref, cached = with_formula
        extra = f'<c r="{ref}" t="str"><f>SUM(1,2)</f><v>{cached}</v></c>'
        # append into row 1 (first closing row tag), per the docstring; an
        # empty sheet gets a synthesized row 1
        if "</row>" in sheet_xmls[0]:
            sheet_xmls[0] = sheet_xmls[0].replace(
                "</row>", f"{extra}</row>", 1)
        else:
            sheet_xmls[0] = sheet_xmls[0].replace(
                "<sheetData>", f'<sheetData><row r="1">{extra}</row>', 1)

    sheet_entries = "".join(
        f'<sheet name="{name}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, (name, _) in enumerate(sheets)
    )
    workbook = (
        '<?xml version="1.0"?><workbook xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="t" Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(sheets))
    )
    shared_xml = (
        '<?xml version="1.0"?><sst xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(f"<si><t>{_x(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    members = {
        "[Content_Types].xml": b"<Types/>",
        "xl/workbook.xml": workbook.encode(),
        "xl/_rels/workbook.xml.rels": (
            '<?xml version="1.0"?><Relationships xmlns='
            '"http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{rels}</Relationships>"
        ).encode(),
        "xl/sharedStrings.xml": shared_xml.encode(),
    }
    for i, sx in enumerate(sheet_xmls):
        members[f"xl/worksheets/sheet{i + 1}.xml"] = sx.encode()
    return _make_zip(members)


# ---------------------------------------------------------------------------
# PPTX
# ---------------------------------------------------------------------------

_P_NS = (
    'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
    'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
)


def pptx_shape(*paragraphs: str) -> str:
    paras = "".join(
        f"<a:p><a:r><a:t>{_x(p)}</a:t></a:r></a:p>" for p in paragraphs
    )
    return f"<p:sp><p:txBody>{paras}</p:txBody></p:sp>"


def pptx_pic(name: str, descr: str = "", embed: str = "rId2") -> str:
    blip = f'<a:blip r:embed="{embed}"/>' if embed else "<a:blip/>"
    return (
        f'<p:pic><p:nvPicPr><p:cNvPr id="4" name="{name}" descr="{descr}"/>'
        f"</p:nvPicPr><p:blipFill>{blip}</p:blipFill></p:pic>"
    )


def pptx_table(rows: list[list[str]]) -> str:
    trs = "".join(
        "<a:tr>" + "".join(
            f"<a:tc><a:txBody><a:p><a:r><a:t>{_x(c)}</a:t></a:r></a:p></a:txBody></a:tc>"
            for c in row
        ) + "</a:tr>"
        for row in rows
    )
    return (
        "<p:graphicFrame><a:graphic><a:graphicData>"
        f"<a:tbl>{trs}</a:tbl></a:graphicData></a:graphic></p:graphicFrame>"
    )


def pptx_group(*inner: str) -> str:
    return f"<p:grpSp>{''.join(inner)}</p:grpSp>"


def pptx_zip(slides: list[str], notes: dict[int, str] | None = None,
             media: dict[str, bytes] | None = None) -> bytes:
    """slides: spTree inner XML per slide; notes: slide index (1-based) →
    notes body text; media: zip member name → bytes."""
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>'
        for i in range(len(slides))
    )
    members: dict[str, bytes] = {
        "[Content_Types].xml": b"<Types/>",
        "ppt/presentation.xml": (
            f'<?xml version="1.0"?><p:presentation {_P_NS}>'
            f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>"
        ).encode(),
    }
    for i, tree in enumerate(slides, start=1):
        members[f"ppt/slides/slide{i}.xml"] = (
            f'<?xml version="1.0"?><p:sld {_P_NS}><p:cSld>'
            f"<p:spTree>{tree}</p:spTree></p:cSld></p:sld>"
        ).encode()
    for i, text in (notes or {}).items():
        members[f"ppt/notesSlides/notesSlide{i}.xml"] = (
            f'<?xml version="1.0"?><p:notes {_P_NS}><p:cSld><p:spTree>'
            f"<p:sp><p:txBody><a:p><a:r><a:t>{_x(text)}</a:t></a:r></a:p>"
            "</p:txBody></p:sp></p:spTree></p:cSld></p:notes>"
        ).encode()
    for name, blob in (media or {}).items():
        members[name] = blob
    return _make_zip(members)


# ---------------------------------------------------------------------------
# EPUB
# ---------------------------------------------------------------------------


def epub_zip(chapters: list[tuple[str, str]],
             title: str = "", creators: list[str] | None = None,
             language: str = "", publisher: str = "", date: str = "",
             description: str = "", identifier: str = "",
             missing_spine_ref: bool = False) -> bytes:
    """chapters: (href, xhtml body) under OEBPS/."""
    container = (
        '<?xml version="1.0"?><container xmlns='
        '"urn:oasis:names:tc:opendocument:xmlns:container" version="1.0">'
        "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" "
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    )
    meta_parts = []
    if title:
        meta_parts.append(f"<dc:title>{_x(title)}</dc:title>")
    for c in creators or []:
        meta_parts.append(f"<dc:creator>{_x(c)}</dc:creator>")
    if language:
        meta_parts.append(f"<dc:language>{_x(language)}</dc:language>")
    if publisher:
        meta_parts.append(f"<dc:publisher>{_x(publisher)}</dc:publisher>")
    if date:
        meta_parts.append(f"<dc:date>{_x(date)}</dc:date>")
    if description:
        meta_parts.append(f"<dc:description>{_x(description)}</dc:description>")
    if identifier:
        meta_parts.append(f"<dc:identifier>{_x(identifier)}</dc:identifier>")

    items = "".join(
        f'<item id="ch{i}" href="{href}" media-type="application/xhtml+xml"/>'
        for i, (href, _) in enumerate(chapters)
    )
    refs = "".join(f'<itemref idref="ch{i}"/>' for i in range(len(chapters)))
    if missing_spine_ref:
        refs += '<itemref idref="ghost"/>'
    opf = (
        '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" version="3.0">'
        f"<metadata>{''.join(meta_parts)}</metadata>"
        f"<manifest>{items}</manifest><spine>{refs}</spine></package>"
    )
    members: dict[str, bytes] = {
        "mimetype": b"application/epub+zip",
        "META-INF/container.xml": container.encode(),
        "OEBPS/content.opf": opf.encode(),
    }
    for href, body in chapters:
        members[f"OEBPS/{href}"] = (
            f"<html><body>{body}</body></html>"
        ).encode()
    return _make_zip(members)


# ---------------------------------------------------------------------------
# PDF
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def pdf_bytes(pages: list[list[tuple[float, float, str]]],
              compress: bool = True, use_tj_array: bool = False,
              encoding: str = "winansi") -> bytes:
    """Classic-xref PDF — :func:`pdf_objects` assembled."""
    return pdf_assemble(pdf_objects(pages, compress=compress,
                                    use_tj_array=use_tj_array,
                                    encoding=encoding))


def pdf_objects(pages: list[list[tuple[float, float, str]]],
                compress: bool = True, use_tj_array: bool = False,
                encoding: str = "winansi") -> dict[int, bytes]:
    """Object map behind :func:`pdf_bytes` (feed to :func:`pdf_assemble`
    or :func:`pdf_encrypt`). pages: [(x, y, text), ...] show operations.

    ``encoding`` picks the font/text wire format:
    - ``winansi``      — Type1 /WinAnsiEncoding, literal strings (default)
    - ``differences``  — Type1 with /BaseEncoding /WinAnsiEncoding and a
      /Differences array remapping 'e'→eacute and 'o'→bullet, so the
      decoded text carries é/• wherever the input had e/o (pins the
      Differences + AGL-name resolution chain)
    - ``cmap``         — Type0 subset-font shape: 2-byte codes assigned
      by first appearance, hex show strings, and a /ToUnicode CMap
      stream built from the text (pins the bfchar walk end-to-end;
      ``use_tj_array`` is ignored — hex strings carry no word breaks)
    """
    import zlib as _zlib

    objects: dict[int, bytes] = {}
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_num = 3 + 2 * n_pages
    codes: dict[str, int] = {}  # cmap flavor: char → 2-byte code

    def hex_show(text: str) -> str:
        out = []
        for ch in text:
            code = codes.setdefault(ch, len(codes) + 1)
            out.append(f"{code:04X}")
        return f"<{''.join(out)}>"

    for i, ops in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_num} 0 R "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode()
        parts = ["BT /F1 12 Tf"]
        for x, y, text in ops:
            if encoding == "cmap":
                parts.append(f"1 0 0 1 {x:g} {y:g} Tm {hex_show(text)} Tj")
            elif use_tj_array:
                words = text.split(" ")
                arr = " -240 ".join(f"({_pdf_escape(w)})" for w in words)
                parts.append(f"1 0 0 1 {x:g} {y:g} Tm [{arr}] TJ")
            else:
                parts.append(f"1 0 0 1 {x:g} {y:g} Tm ({_pdf_escape(text)}) Tj")
        parts.append("ET")
        # WinAnsi-scoped fixture format (the kernel decodes cp1252);
        # out-of-repertoire chars degrade to '?' instead of crashing the
        # builder — callers wanting CJK text should use the other formats
        stream = " ".join(parts).encode("cp1252", errors="replace")
        if compress:
            stream = _zlib.compress(stream)
            head = f"<< /Length {len(stream)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(stream)} >>"
        objects[content_num] = (
            head.encode() + b"\nstream\n" + stream + b"\nendstream"
        )
    if encoding == "cmap":
        bfchars = "\n".join(
            f"<{code:04X}> <{ch.encode('utf-16-be').hex().upper()}>"
            for ch, code in codes.items())
        cmap_body = (
            "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            f"{len(codes)} beginbfchar\n{bfchars}\nendbfchar\n"
            "endcmap\nCMap currentdict /CMap defineresource pop\nend end"
        ).encode("ascii")
        objects[font_num] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /SYNTH+Sub "
            f"/Encoding /Identity-H /ToUnicode {font_num + 1} 0 R >>"
        ).encode()
        objects[font_num + 1] = (
            f"<< /Length {len(cmap_body)} >>".encode()
            + b"\nstream\n" + cmap_body + b"\nendstream"
        )
    elif encoding == "differences":
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding "
            b"/Differences [ 101 /eacute 111 /bullet ] >> >>"
        )
    else:
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"
        )

    return objects


def pdf_assemble(objects: dict[int, bytes],
                 trailer_extra: str = "") -> bytes:
    """Object-number → body map → a classic-xref PDF (/Root is object 1).
    The low-level builder behind :func:`pdf_bytes`; tests use it directly
    to compose fonts with ToUnicode CMaps / /Differences encodings.
    ``trailer_extra`` splices additional trailer entries (e.g.
    ``/Encrypt N 0 R /ID [...]``)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_off = len(out)
    max_num = max(objects)
    out += f"xref\n0 {max_num + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    out += (
        f"trailer\n<< /Size {max_num + 1} /Root 1 0 R "
        f"{trailer_extra}>>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


def pdf_encrypt(objects: dict[int, bytes], variant: str = "rc4-128",
                password_required: bool = False) -> bytes:
    """Encrypt a :func:`pdf_assemble` object map with the standard
    security handler (empty user password) — the fixture inverse of
    kernels/pdfcrypt. Variants: ``rc4-40`` (V1 R2), ``rc4-128``
    (V2 R3), ``aesv2`` (V4 R4, AES-128-CBC), ``aes256`` (V5 R6,
    ISO 32000-2 2.B KDF). ``password_required=True`` writes a /U that
    does NOT validate against the empty password (simulating a real
    user password), so readers must produce the typed error."""
    import hashlib as _hl
    import re as _re
    import struct as _struct

    from .kernels.pdfcrypt import (
        _PAD,
        StdSecurityHandler,
        _hash_2b,
        aes_cbc_encrypt,
        rc4,
    )

    fid = _hl.md5(f"fixture-id-{variant}".encode()).digest()
    o32 = _hl.md5(b"owner-a").digest() + _hl.md5(b"owner-b").digest()
    p_val = -4
    p32 = _struct.pack("<I", p_val & 0xFFFFFFFF)
    enc: dict = {"/Filter": "/Standard", "/P": p_val, "/O": o32}
    if variant == "rc4-40":
        enc.update({"/V": 1, "/R": 2, "/Length": 40})
        key = _hl.md5(_PAD + o32 + p32 + fid).digest()[:5]
        u = rc4(key, _PAD)
    elif variant in ("rc4-128", "aesv2"):
        r = 3 if variant == "rc4-128" else 4
        enc.update({"/V": 2 if r == 3 else 4, "/R": r, "/Length": 128})
        key = _hl.md5(_PAD + o32 + p32 + fid).digest()
        for _ in range(50):
            key = _hl.md5(key[:16]).digest()
        key = key[:16]
        tmp = _hl.md5(_PAD + fid).digest()
        out = rc4(key, tmp)
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key), out)
        u = out + b"\x00" * 16
        if r == 4:
            enc["/CF"] = {"/StdCF": {"/CFM": "/AESV2", "/Length": 16}}
            enc["/StmF"] = "/StdCF"
            enc["/StrF"] = "/StdCF"
    elif variant == "aes256":
        enc.update({"/V": 5, "/R": 6, "/Length": 256})
        vsalt = _hl.md5(b"vs").digest()[:8]
        ksalt = _hl.md5(b"ks").digest()[:8]
        u = _hash_2b(b"", vsalt) + vsalt + ksalt
        inter = _hash_2b(b"", ksalt)
        file_key = _hl.sha256(b"file-key").digest()
        enc["/UE"] = aes_cbc_encrypt(inter, b"\x00" * 16, file_key)
        enc["/O"] = _hl.sha256(b"oo").digest() + b"\x00" * 16
        enc["/OE"] = b"\x00" * 32
    else:
        raise ValueError(f"unknown variant {variant}")
    enc["/U"] = u

    handler = StdSecurityHandler(enc, fid)

    def enc_payload(num: int, payload: bytes) -> bytes:
        key = handler.object_key(num, 0)
        if handler.aes:
            iv = _hl.md5(f"iv{num}".encode()).digest()
            padn = 16 - len(payload) % 16
            return iv + aes_cbc_encrypt(key, iv,
                                        payload + bytes([padn]) * padn)
        return rc4(key, payload)

    out_objects: dict[int, bytes] = {}
    for num, body in objects.items():
        at = body.find(b"\nstream\n")
        if at < 0:
            out_objects[num] = body  # fixture bodies carry no strings
            continue
        head, payload = body[:at], body[at + 8:]
        if not payload.endswith(b"\nendstream"):
            raise ValueError(f"object {num} stream not terminated")
        payload = payload[:-10]
        ct = enc_payload(num, payload)
        head = _re.sub(rb"/Length \d+",
                       f"/Length {len(ct)}".encode(), head)
        out_objects[num] = head + b"\nstream\n" + ct + b"\nendstream"

    if password_required:
        u = bytes([u[0] ^ 0xFF]) + u[1:]

    def hexs(b: bytes) -> str:
        return "<" + b.hex().upper() + ">"

    parts = [f"/Filter /Standard /V {enc['/V']} /R {enc['/R']} "
             f"/Length {enc['/Length']} /P {p_val} "
             f"/O {hexs(enc['/O'])} /U {hexs(u)}"]
    if "/CF" in enc:
        parts.append("/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                     "/StmF /StdCF /StrF /StdCF")
    if "/UE" in enc:
        parts.append(f"/UE {hexs(enc['/UE'])} /OE {hexs(enc['/OE'])}")
    enc_num = max(objects) + 1
    out_objects[enc_num] = ("<< " + " ".join(parts) + " >>").encode()
    trailer = (f"/Encrypt {enc_num} 0 R "
               f"/ID [{hexs(fid)} {hexs(fid)}] ")
    return pdf_assemble(out_objects, trailer_extra=trailer)


# ---------------------------------------------------------------------------
# ODT (OpenDocument Text) — beyond-the-reference kernel fixtures
# ---------------------------------------------------------------------------

_ODT_NS = (
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
    'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0" '
    'xmlns:style="urn:oasis:names:tc:opendocument:xmlns:style:1.0" '
    'xmlns:fo="urn:oasis:names:tc:opendocument:xmlns:'
    'xsl-fo-compatible:1.0" '
    'xmlns:xlink="http://www.w3.org/1999/xlink"'
)


def odt_styles(bold: tuple[str, ...] = ("B1",),
               italic: tuple[str, ...] = ("I1",),
               both: tuple[str, ...] = ()) -> str:
    out = []
    for name in bold:
        out.append(f'<style:style style:name="{name}">'
                   '<style:text-properties fo:font-weight="bold"/>'
                   '</style:style>')
    for name in italic:
        out.append(f'<style:style style:name="{name}">'
                   '<style:text-properties fo:font-style="italic"/>'
                   '</style:style>')
    for name in both:
        out.append(f'<style:style style:name="{name}">'
                   '<style:text-properties fo:font-weight="bold" '
                   'fo:font-style="italic"/></style:style>')
    return "".join(out)


def odt_zip(body_xml: str, styles_xml: str = "",
            media: dict[str, bytes] | None = None) -> bytes:
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content {_ODT_NS}>'
        f'<office:automatic-styles>{styles_xml}</office:automatic-styles>'
        f'<office:body><office:text>{body_xml}</office:text></office:body>'
        '</office:document-content>'
    )
    members: dict[str, bytes] = {
        "mimetype": b"application/vnd.oasis.opendocument.text",
        "META-INF/manifest.xml": (
            b'<?xml version="1.0" encoding="UTF-8"?>'
            b'<manifest:manifest xmlns:manifest="urn:oasis:names:tc:'
            b'opendocument:xmlns:manifest:1.0"/>'),
        "content.xml": content.encode("utf-8"),
    }
    if media:
        members.update(media)
    return _make_zip(members)


def _od_zip(body_tag: str, body_xml: str, mimetype: str,
            styles_xml: str = "",
            media: dict[str, bytes] | None = None) -> bytes:
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content {_ODT_NS} '
        'xmlns:presentation="urn:oasis:names:tc:opendocument:xmlns:'
        'presentation:1.0">'
        f'<office:automatic-styles>{styles_xml}</office:automatic-styles>'
        f'<office:body><office:{body_tag}>{body_xml}</office:{body_tag}>'
        '</office:body></office:document-content>'
    )
    members: dict[str, bytes] = {
        "mimetype": mimetype.encode("ascii"),
        "META-INF/manifest.xml": (
            b'<?xml version="1.0" encoding="UTF-8"?>'
            b'<manifest:manifest xmlns:manifest="urn:oasis:names:tc:'
            b'opendocument:xmlns:manifest:1.0"/>'),
        "content.xml": content.encode("utf-8"),
    }
    if media:
        members.update(media)
    return _make_zip(members)


def ods_zip(rows: list[list[str]], styles_xml: str = "",
            repeats: dict[tuple[int, int], int] | None = None) -> bytes:
    """First-sheet ODS; ``repeats[(r, c)]`` sets
    table:number-columns-repeated on that cell."""
    body = ['<table:table table:name="Sheet1">']
    for r, row in enumerate(rows):
        body.append("<table:table-row>")
        for c, cell in enumerate(row):
            rep = (repeats or {}).get((r, c), 1)
            attr = (f' table:number-columns-repeated="{rep}"'
                    if rep != 1 else "")
            body.append(f"<table:table-cell{attr}>"
                        f"<text:p>{cell}</text:p></table:table-cell>")
        body.append("</table:table-row>")
    body.append("</table:table>")
    # a second sheet that must be IGNORED (xlsx first-sheet parity)
    body.append('<table:table table:name="Sheet2"><table:table-row>'
                '<table:table-cell><text:p>IGNORED</text:p>'
                '</table:table-cell></table:table-row></table:table>')
    return _od_zip("spreadsheet", "".join(body),
                   "application/vnd.oasis.opendocument.spreadsheet",
                   styles_xml)


def odp_zip(pages: list[dict], styles_xml: str = "") -> bytes:
    """Pages: [{'title': str|None, 'paras': [str xml], 'table':
    [[cells]]|None}] — draw:page / draw:frame / draw:text-box layout."""
    body = []
    for pg in pages:
        body.append('<draw:page>')
        if pg.get("title"):
            body.append('<draw:frame presentation:class="title">'
                        '<draw:text-box><text:p>'
                        f'{pg["title"]}</text:p></draw:text-box>'
                        '</draw:frame>')
        if pg.get("paras"):
            body.append('<draw:frame><draw:text-box>'
                        + "".join(pg["paras"]) + '</draw:text-box>'
                        '</draw:frame>')
        if pg.get("table"):
            body.append('<table:table>' + ''.join(
                '<table:table-row>' + ''.join(
                    f'<table:table-cell><text:p>{c}</text:p>'
                    f'</table:table-cell>' for c in row)
                + '</table:table-row>' for row in pg["table"])
                + '</table:table>')
        body.append('</draw:page>')
    return _od_zip("presentation", "".join(body),
                   "application/vnd.oasis.opendocument.presentation",
                   styles_xml)
