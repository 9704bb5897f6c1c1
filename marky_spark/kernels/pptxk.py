"""PPTX → Markdown kernel (reference parity: internal/converters/pptx.go).

Slide pipeline (pptx.go:36-47, 60-79, 184-449):

- slide count from ``ppt/presentation.xml`` sldIdLst (slides addressed as
  ``ppt/slides/slide{i}.xml``; missing/corrupt slides skipped — :219-231);
- per slide: ``<!-- Slide number: N -->`` separator; shapes processed **by
  type group** (all sp, then pics, then tables, then groups — the Go structs
  split the shape tree by type, :104-110), first textful shape = ``# title``;
- pictures: alt from ``descr`` else ``name``, ``[\\r\\n\\[\\]]``→space,
  whitespace collapsed; image data = the *first* ``ppt/media/*`` member
  (simplified getImageData, :424-444) as a base64 data URI, else
  ``sanitized.jpg`` placeholder;
- tables: html-escaped compact renderer (third renderer, :381-422);
- notes: regex ``<a:t>([^<]*)</a:t>`` space-joined under ``### Notes:``;
- whole output trimmed (:77).
"""

from __future__ import annotations

import base64
import re
from xml.etree import ElementTree as ET

from .base import ConvertError, Segment, decode_binary_payload, image, md, merge_markdown
from .base import local_name as _local
from .fastzip import BadZip, open_zip
from .mdtable import pptx_table

_Part = str | tuple[str, str, str]

_ALT_CLEAN = re.compile(r"[\r\n\[\]]")
_WS = re.compile(r"\s+")
_NON_WORD = re.compile(r"\W")
_NOTES_RUN = re.compile(r"<a:t>([^<]*)</a:t>")




def _find_all(el: ET.Element, *path: str) -> list[ET.Element]:
    """Descend by local names; last component collects all matches."""
    current = [el]
    for i, name in enumerate(path):
        nxt: list[ET.Element] = []
        for node in current:
            for child in node:
                if _local(child.tag) == name:
                    nxt.append(child)
        current = nxt
    return current


def _text_body_text(tx_body: ET.Element) -> str:
    """Paragraph runs concatenated; paragraphs joined '\\n'; trimmed
    (pptx.go:368-379)."""
    paras = []
    for p in tx_body:
        if _local(p.tag) != "p":
            continue
        runs = []
        for r in p:
            if _local(r.tag) != "r":
                continue
            for t in r:
                if _local(t.tag) == "t":
                    runs.append("".join(t.itertext()))
        paras.append("".join(runs))
    return "\n".join(paras).strip()


def _shape_text(sp: ET.Element) -> str:
    for child in sp:
        if _local(child.tag) == "txBody":
            return _text_body_text(child)
    return ""


def _first_media_member(zf) -> str | None:
    for name in zf.namelist():
        if name.startswith("ppt/media/"):
            return name
    return None


class _SlideRenderer:
    def __init__(self, zf):
        self.zf = zf
        self._media_cache: tuple[str, bytes] | None | bool = False  # unloaded

    def _media(self) -> tuple[str, bytes] | None:
        if self._media_cache is False:
            member = _first_media_member(self.zf)
            self._media_cache = (
                (member, self.zf.read(member)) if member else None
            )
        return self._media_cache  # type: ignore[return-value]

    def shapes(self, shapes: list[ET.Element], out: list[_Part],
               is_title: bool) -> None:
        for sp in shapes:
            text = _shape_text(sp)
            if not text:
                continue
            if is_title:
                out.append(f"# {text.strip()}\n")
                is_title = False
            else:
                out.append(f"{text}\n")

    def pics(self, pics: list[ET.Element], out: list[_Part]) -> None:
        for pic in pics:
            alt = ""
            embed = ""
            for nv in _find_all(pic, "nvPicPr", "cNvPr"):
                alt = nv.get("descr") or nv.get("name") or ""
            for blip in _find_all(pic, "blipFill", "blip"):
                for k, v in blip.attrib.items():
                    if _local(k) == "embed":
                        embed = v
            alt = _WS.sub(" ", _ALT_CLEAN.sub(" ", alt)).strip()
            if embed:
                media = self._media()
                if media is not None:
                    member, blob = media
                    b64 = base64.b64encode(blob).decode("ascii")
                    out.append("\n")
                    out.append(
                        ("img", f"![{alt}](data:image/png;base64,{b64})", member)
                    )
                    out.append("\n")
                    continue
            filename = _NON_WORD.sub("", alt) + ".jpg"
            out.append("\n")
            out.append(("img", f"![{alt}]({filename})", filename))
            out.append("\n")

    def tables(self, frames: list[ET.Element], out: list[_Part]) -> None:
        for frame in frames:
            for tbl in _find_all(frame, "graphic", "graphicData", "tbl"):
                rows: list[list[str]] = []
                for tr in tbl:
                    if _local(tr.tag) != "tr":
                        continue
                    cells = []
                    for tc in tr:
                        if _local(tc.tag) != "tc":
                            continue
                        body = ""
                        for tx in tc:
                            if _local(tx.tag) == "txBody":
                                body = _text_body_text(tx)
                        cells.append(body)
                    rows.append(cells)
                out.append(pptx_table(rows))

    def groups(self, groups: list[ET.Element], out: list[_Part]) -> None:
        for grp in groups:
            self.shapes([c for c in grp if _local(c.tag) == "sp"], out, False)
            self.pics([c for c in grp if _local(c.tag) == "pic"], out)
            self.tables([c for c in grp if _local(c.tag) == "graphicFrame"], out)


def convert_pptx(text: str) -> list[Segment]:
    data = decode_binary_payload(text)
    try:
        zf = open_zip(data)
    except BadZip as exc:
        raise ConvertError(f"failed to open PPTX file: {exc}") from exc

    with zf:
        names = zf.names
        if "ppt/presentation.xml" not in names:
            raise ConvertError("presentation.xml not found")
        try:
            pres = ET.fromstring(zf.read("ppt/presentation.xml"))
        except ET.ParseError as exc:
            raise ConvertError(f"failed to parse presentation: {exc}") from exc

        n_slides = len(_find_all(pres, "sldIdLst", "sldId"))
        renderer = _SlideRenderer(zf)
        parts: list[_Part] = []
        slide_no = 0
        for i in range(1, n_slides + 1):
            member = f"ppt/slides/slide{i}.xml"
            if member not in names:
                continue
            try:
                slide = ET.fromstring(zf.read(member))
            except ET.ParseError:
                continue  # skip corrupt slide (pptx.go:227-231)
            slide_no += 1
            parts.append(f"\n\n<!-- Slide number: {slide_no} -->\n")

            sp_tree = _find_all(slide, "cSld", "spTree")
            if sp_tree:
                tree = sp_tree[0]
                renderer.shapes(
                    [c for c in tree if _local(c.tag) == "sp"], parts, True
                )
                renderer.pics(
                    [c for c in tree if _local(c.tag) == "pic"], parts
                )
                renderer.tables(
                    [c for c in tree if _local(c.tag) == "graphicFrame"], parts
                )
                renderer.groups(
                    [c for c in tree if _local(c.tag) == "grpSp"], parts
                )

            notes_member = f"ppt/notesSlides/notesSlide{i}.xml"
            if notes_member in names:
                raw = zf.read(notes_member).decode("utf-8", errors="replace")
                runs = _NOTES_RUN.findall(raw)
                notes = "".join(r + " " for r in runs).strip()
                if notes:
                    parts.append(f"\n\n### Notes:\n{notes}")

    return _trimmed_segments(parts)


def _trimmed_segments(parts: list[_Part]) -> list[Segment]:
    """Whole-output TrimSpace (pptx.go:77) applied across part boundaries."""
    # trim leading whitespace
    while parts and isinstance(parts[0], str) and not parts[0].strip():
        parts.pop(0)
    while parts and isinstance(parts[-1], str) and not parts[-1].strip():
        parts.pop()
    if parts and isinstance(parts[0], str):
        parts[0] = parts[0].lstrip()
    if parts and isinstance(parts[-1], str):
        parts[-1] = parts[-1].rstrip()

    segments: list[Segment] = []
    for p in parts:
        if isinstance(p, str):
            segments.append(md(p))
        else:
            segments.append(image(p[1], p[2]))
    return merge_markdown(segments)
