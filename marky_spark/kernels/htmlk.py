r"""HTML → Markdown kernel, built from scratch on ``html.parser``.

Replaces the reference's html-to-markdown v2 dependency (html.go:26-38) with
a three-stage stdlib pipeline, per the north rule ("tokenize HTML
byte-streams, strip boilerplate via DOM-tree heuristics"):

1. **Tokenize → DOM**: tolerant ``html.parser.HTMLParser`` subclass builds a
   lightweight element tree (malformed HTML never errors —
   html_test.go:260-286 contract).
2. **Boilerplate strip**: hard tag blacklist (script/style/head/nav/footer/
   aside/form/svg/…) plus link-density pruning of container blocks
   (Kohlschütter et al., WSDM 2010 shallow-text-features lineage): a
   container whose linked-text ratio ≥ 0.66 with ≥ 2 links and ≤ 40% of the
   document text is chrome, not content. If pruning would leave no text the
   original tree is kept (small-fixture safety).
3. **Markdown emit** matching the reference test contract (html_test.go):
   ``hN→#×N`` (:91-93), ``em→*…*`` (:94-96), ``strong→**…**``,
   ``a→[t](u)`` (:97-99), ``code→\`…\``` + ``pre→fence`` (:220-226), entity
   decode (:188-195), pipe tables (:159-165), ``ul/ol→*/N.``,
   ``blockquote→>``, Unicode preserved (:288-322). Images become standalone
   ``kind='image'`` segments carrying ``media_ref=src`` (FIXTURES.md §3).
"""

from __future__ import annotations

import re
from html import unescape as _html_unescape
from html.parser import HTMLParser

from .base import Segment, image, md, merge_markdown

# ---------------------------------------------------------------------------
# Stage 1 — tolerant DOM builder
# ---------------------------------------------------------------------------

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# cap DOM depth (browsers cap around 512): deeper elements attach flat at
# the cap, which bounds recursion in every downstream tree walk — without it
# adversarial nesting ("<b>"*3000) exceeds Python's recursion limit
_MAX_DEPTH = 240

# start of tag X implicitly closes an open tag Y (simplified HTML5 rules)
_IMPLIED_CLOSE = {
    "p": {"p"},
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "dd": {"dd", "dt"},
    "dt": {"dd", "dt"},
    "option": {"option"},
}


class Element:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element | str] = []


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        closes = _IMPLIED_CLOSE.get(tag)
        while closes and len(self.stack) > 1 and self.stack[-1].tag in closes:
            self.stack.pop()
        el = Element(tag, {k: (v or "") for k, v in attrs})
        self.stack[-1].children.append(el)
        if tag not in _VOID_TAGS and len(self.stack) < _MAX_DEPTH:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        el = Element(tag, {k: (v or "") for k, v in attrs})
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag: str) -> None:
        # close the nearest matching open element; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)


def parse_html_stdlib(text: str) -> Element:
    """Reference tokenizer: stdlib html.parser (kept as the differential
    baseline for the fast tokenizer below; tests assert identical output on
    goldens, real pages, and a tricky-snippet corpus)."""
    builder = _DomBuilder()
    builder.feed(text)
    builder.close()
    return builder.root


# -- fast tokenizer ----------------------------------------------------------

# one pass, one regex: comments / doctype-decls / end tags / start tags / text
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                 # comment (unterminated → to EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"       # CDATA
    r"|<![^>]*>?"                        # doctype / other declarations
    r"|<\?[^>]*>?"                       # processing instruction
    r"|</\s*([a-zA-Z][-a-zA-Z0-9:._]*)\s*>"      # end tag   (group 1)
    r"|<([a-zA-Z][-a-zA-Z0-9:._]*)"              # start tag (group 2) …
    r"((?:\s+[^\s=/>]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"  # attrs (3)
    r"\s*(/?)>?",                                 # self-closing flag (group 4)
    re.DOTALL,
)

_ATTR_RE = re.compile(
    r"([^\s=/>]+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)

# content of these runs verbatim until the matching close tag (HTML rawtext)
# exactly html.parser's CDATA_CONTENT_ELEMENTS: the differential contract
# (fast tree == stdlib tree) requires the same rawtext set; textarea/title
# are RCDATA in HTML5 but html.parser tokenizes them normally.
# Scope note: rawtext suppression applies to ACTUAL script/style elements.
# A '<script' swallowed into a malformed preceding tag's attribute soup
# (e.g. '<p <script>x') never opens an element — matching the HTML5
# tokenizer's attribute-name state, where '<' is a plain attr char — so 'x'
# is genuinely text in the DOM, not script content (fuzz-verified: every
# such case is attr-soup swallowing, identical to browser semantics).
_RAWTEXT_TAGS = frozenset(("script", "style"))

_RAWTEXT_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in _RAWTEXT_TAGS
}

_AMP = "&"


def _decode(text: str) -> str:
    """Entity decode only when an ampersand is present (html.unescape is
    surprisingly expensive on entity-free text)."""
    if _AMP in text:
        return _html_unescape(text)
    return text


def parse_html(text: str) -> Element:
    """Fast tolerant tokenizer → same DOM as :func:`parse_html_stdlib`.

    html.parser's pure-Python goahead() was ~45% of the HTML kernel; this
    single-regex scanner produces the same Element tree for the tolerant
    subset we emit from (verified differentially in tests/test_html.py)."""
    root = Element("#root", {})
    stack = [root]
    pos = 0
    n = len(text)

    def flush(upto: int, start: int) -> None:
        if start < upto:
            chunk = text[start:upto]
            stack[-1].children.append(_decode(chunk))

    while pos < n:
        m = _TOKEN_RE.search(text, pos)
        if m is None:
            flush(n, pos)
            break
        flush(m.start(), pos)
        pos = m.end()
        end_tag, start_tag = m.group(1), m.group(2)
        if end_tag is not None:
            tag = end_tag.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        if start_tag is None:
            continue  # comment / doctype / PI
        tag = start_tag.lower()
        attrs: dict[str, str] = {}
        raw_attrs = m.group(3)
        if raw_attrs:
            for am in _ATTR_RE.finditer(raw_attrs):
                name = am.group(1).lower()
                value = am.group(2)
                if value is None:
                    attrs[name] = ""
                elif value[:1] in "\"'" and value[:1] == value[-1:] and len(value) >= 2:
                    attrs[name] = _decode(value[1:-1])
                else:
                    attrs[name] = _decode(value)
        self_closing = m.group(4) == "/"

        closes = _IMPLIED_CLOSE.get(tag)
        while closes and len(stack) > 1 and stack[-1].tag in closes:
            stack.pop()
        el = Element(tag, attrs)
        stack[-1].children.append(el)
        if self_closing or tag in _VOID_TAGS or len(stack) >= _MAX_DEPTH:
            continue
        if tag in _RAWTEXT_TAGS:
            cm = _RAWTEXT_CLOSE[tag].search(text, pos)
            raw_end = cm.start() if cm else n
            if raw_end > pos:
                el.children.append(text[pos:raw_end])
            pos = cm.end() if cm else n
            continue
        stack.append(el)

    return root


# ---------------------------------------------------------------------------
# Stage 2 — boilerplate strip
# ---------------------------------------------------------------------------

_DROP_TAGS = frozenset(
    (
        "script style noscript template head title meta link base nav footer "
        "aside form button svg iframe object embed canvas select input "
        "textarea audio video dialog"
    ).split()
)

_PRUNE_CANDIDATES = frozenset("div section header ul ol table menu".split())

_WS_RE = re.compile(r"\s+")


def _text_stats(node: Element | str, in_link: bool = False,
                memo: dict[int, tuple[int, int, int, int]] | None = None
                ) -> tuple[int, int, int, int]:
    """(total_text_chars, linked_text_chars, n_links, n_elements) of a
    subtree.

    One bottom-up pass with per-element memoization — strip_boilerplate
    queries stats for every candidate container, which without the memo is
    quadratic in tree depth (measured: ~40% of the whole HTML kernel)."""
    if isinstance(node, str):
        # collapsed-and-stripped length; split() is whitespace-identical to
        # \s+ (verified over the BMP) and ~1.6x cheaper than regex sub
        words = node.split()
        n = sum(len(w) for w in words) + len(words) - 1 if words else 0
        return n, n if in_link else 0, 0, 0
    if memo is not None and not in_link:
        cached = memo.get(id(node))
        if cached is not None:
            return cached
    if node.tag in _DROP_TAGS:
        return 0, 0, 0, 1
    total = linked = links = 0
    elements = 1
    is_link = in_link or node.tag == "a"
    if node.tag == "a":
        links += 1
    for child in node.children:
        t, l, k, e = _text_stats(child, is_link, memo)
        total += t
        linked += l
        links += k
        elements += e
    if memo is not None and not in_link:
        memo[id(node)] = (total, linked, links, elements)
    return total, linked, links, elements


def strip_boilerplate(root: Element) -> Element:
    memo: dict[int, tuple[int, int, int, int]] = {}
    doc_text, _, _, _ = _text_stats(root, memo=memo)

    def prune(node: Element) -> Element | None:
        """Non-destructive: returns the ORIGINAL node when its subtree is
        untouched (no allocation, memo stays valid), a rebuilt copy only on
        the path to a dropped descendant — the original tree stays intact so
        the safety net below can genuinely fall back to it."""
        if node.tag in _DROP_TAGS:
            return None
        if node.tag in _PRUNE_CANDIDATES and doc_text > 0:
            total, linked, links, elements = _text_stats(node, memo=memo)
            small_share = total <= 0.4 * doc_text
            link_density = linked / total if total else 1.0
            # shallow-text-feature scoring (Kohlschütter WSDM'10 lineage):
            # (a) link-dominated block: most of its text is anchor text
            if total > 0 and links >= 2 and link_density >= 0.66 and small_share:
                return None
            # (b) low text density + substantial link share: markup-heavy
            # chrome (menus, tag clouds, pagination) — few chars per element
            text_density = total / elements if elements else 0.0
            if (
                links >= 3
                and link_density >= 0.5
                and text_density < 12.0
                and small_share
            ):
                return None
        changed = False
        kept: list[Element | str] = []
        for ch in node.children:
            if isinstance(ch, Element):
                p = prune(ch)
                if p is not ch:
                    changed = True
                if p is not None:
                    kept.append(p)
            else:
                kept.append(ch)
        if not changed:
            return node
        new = Element(node.tag, node.attrs)
        new.children = kept
        return new

    pruned = prune(root)
    # safety-net check reuses the memo: shared (unchanged) subtrees resolve
    # instantly, only rebuilt spine nodes are re-walked
    if pruned is None or (doc_text > 0 and _text_stats(pruned, memo=memo)[0] == 0):
        # density pruning nuked everything — fall back to the original tree
        # minus the hard-blacklist subtrees (script/style/nav/... must never
        # leak into output, even on the safety path)
        return _drop_tags_only(root)
    return pruned


def _drop_tags_only(node: Element) -> Element:
    new = Element(node.tag, node.attrs)
    new.children = [
        (_drop_tags_only(c) if isinstance(c, Element) else c)
        for c in node.children
        if not (isinstance(c, Element) and c.tag in _DROP_TAGS)
    ]
    return new


# ---------------------------------------------------------------------------
# Stage 3 — Markdown emitter
# ---------------------------------------------------------------------------

# parts: str = markdown text, tuple = ('img', alt, src)
_Part = str | tuple[str, str, str]

_BLOCK_TAGS = frozenset(
    (
        "p h1 h2 h3 h4 h5 h6 ul ol table pre blockquote hr div section "
        "article main body html figure figcaption address details summary "
        "center dl dd dt li tr"
    ).split()
)

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


def _collapse(text: str) -> str:
    return _WS_RE.sub(" ", text)


def _raw_text(node: Element | str) -> str:
    """Verbatim text content (for <pre>/<code>)."""
    if isinstance(node, str):
        return node
    return "".join(_raw_text(c) for c in node.children)


class _Emitter:
    def __init__(self) -> None:
        self.blocks: list[list[_Part]] = []

    # -- inline ------------------------------------------------------------

    def inline(self, node: Element | str) -> list[_Part]:
        if isinstance(node, str):
            return [_collapse(node)]
        tag = node.tag
        if tag == "br":
            return ["\n"]
        if tag == "img":
            alt = _collapse(node.attrs.get("alt", "")).strip()
            src = node.attrs.get("src", "")
            return [("img", alt, src)]
        if tag in ("em", "i"):
            return self._wrap(node, "*")
        if tag in ("strong", "b"):
            return self._wrap(node, "**")
        if tag in ("del", "s", "strike"):
            return self._wrap(node, "~~")
        if tag == "code":
            return [f"`{_raw_text(node)}`"]
        if tag == "a":
            parts = self._children_inline(node)
            text = _parts_strip(parts)
            href = node.attrs.get("href", "")
            if not _parts_text(text).strip() and not href:
                return []
            if href:
                return ["["] + text + [f"]({href})"]
            return text
        return self._children_inline(node)

    def _wrap(self, node: Element, marker: str) -> list[_Part]:
        parts = _parts_strip(self._children_inline(node))
        if not _parts_text(parts):
            return []
        return [marker] + parts + [marker]

    def _children_inline(self, node: Element) -> list[_Part]:
        out: list[_Part] = []
        for child in node.children:
            out.extend(self.inline(child))
        return out

    # -- blocks ------------------------------------------------------------

    def block(self, node: Element | str) -> None:
        if isinstance(node, str):
            if node.strip():
                self._add([_collapse(node)])
            return
        tag = node.tag
        if tag in _HEADINGS:
            parts = _parts_strip(self._children_inline(node))
            if parts:
                self._add(["#" * _HEADINGS[tag] + " "] + parts)
            return
        if tag == "p":
            parts = _parts_strip(self._children_inline(node))
            if parts:
                self._add(parts)
            return
        if tag == "hr":
            self._add(["---"])
            return
        if tag == "pre":
            body = _raw_text(node).strip("\n")
            self._add([f"```\n{body}\n```"])
            return
        if tag in ("ul", "ol"):
            parts = self._list(node, depth=0)
            if parts:
                self._add(parts)
            return
        if tag == "table":
            self._table(node)
            return
        if tag == "blockquote":
            sub = _Emitter()
            for child in node.children:
                sub.dispatch(child)
            parts = _blocks_join(sub.blocks)
            if parts:
                self._add(_quote(parts))
            return
        # generic containers: recurse block-wise, flushing inline runs
        self._container(node)

    def _container(self, node: Element) -> None:
        run: list[_Part] = []

        def flush() -> None:
            nonlocal run
            parts = _parts_strip(run)
            if parts:
                self._add(parts)
            run = []

        for child in node.children:
            if isinstance(child, Element) and (
                child.tag in _BLOCK_TAGS or child.tag in ("#root",)
            ):
                flush()
                self.dispatch(child)
            else:
                run.extend(self.inline(child))
        flush()

    def dispatch(self, node: Element | str) -> None:
        if isinstance(node, str):
            if node.strip():
                self._add([_collapse(node).strip()])
            return
        self.block(node)

    # -- list / table helpers ------------------------------------------------

    def _list(self, node: Element, depth: int) -> list[_Part]:
        ordered = node.tag == "ol"
        out: list[_Part] = []
        counter = 0
        for child in node.children:
            if not (isinstance(child, Element) and child.tag == "li"):
                continue
            counter += 1
            marker = f"{counter}. " if ordered else "* "
            item: list[_Part] = []
            nested: list[_Part] = []
            for sub in child.children:
                if isinstance(sub, Element) and sub.tag in ("ul", "ol"):
                    nested.extend(self._list(sub, depth + 1))
                else:
                    item.extend(self.inline(sub))
            line = _parts_strip(item)
            if out:
                out.append("\n")
            out.append("  " * depth + marker)
            out.extend(line)
            if nested:
                out.append("\n")
                out.extend(nested)
        return out

    def _table(self, node: Element) -> None:
        from .mdtable import to_markdown_table

        rows: list[list[str]] = []

        def walk_rows(el: Element) -> None:
            for child in el.children:
                if not isinstance(child, Element):
                    continue
                if child.tag == "tr":
                    cells = [
                        _parts_text(self._children_inline(c))
                        .replace("\n", " ").strip()
                        for c in child.children
                        if isinstance(c, Element) and c.tag in ("td", "th")
                    ]
                    if cells:
                        rows.append(cells)
                elif child.tag in ("thead", "tbody", "tfoot"):
                    walk_rows(child)

        walk_rows(node)
        table = to_markdown_table(rows).rstrip("\n")
        if table:
            self._add([table])

    def _add(self, parts: list[_Part]) -> None:
        if parts:
            self.blocks.append(parts)


def _parts_text(parts: list[_Part]) -> str:
    return "".join(
        p if isinstance(p, str) else f"![{p[1]}]({p[2]})" for p in parts
    )


def _parts_strip(parts: list[_Part]) -> list[_Part]:
    """Trim leading/trailing whitespace across part boundaries; drop empties."""
    out = [p for p in parts if not (isinstance(p, str) and p == "")]
    while out and isinstance(out[0], str) and not out[0].strip():
        out.pop(0)
    while out and isinstance(out[-1], str) and not out[-1].strip():
        out.pop()
    if out and isinstance(out[0], str):
        out[0] = out[0].lstrip()
    if out and isinstance(out[-1], str):
        out[-1] = out[-1].rstrip()
    # merge adjacent string parts created by tag boundaries
    merged: list[_Part] = []
    for p in out:
        if isinstance(p, str) and merged and isinstance(merged[-1], str):
            merged[-1] += p
        else:
            merged.append(p)
    return merged


def _blocks_join(blocks: list[list[_Part]]) -> list[_Part]:
    out: list[_Part] = []
    for i, b in enumerate(blocks):
        if i:
            out.append("\n\n")
        out.extend(b)
    return out


def _quote(parts: list[_Part]) -> list[_Part]:
    """Prefix every line with '> ' (images kept inline on their line)."""
    out: list[_Part] = ["> "]
    for p in parts:
        if isinstance(p, str):
            out.append(p.replace("\n", "\n> ").replace("> \n", ">\n"))
        else:
            out.append(p)
    return out


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def convert_html(text: str,
                 strip: bool | str = True) -> list[Segment]:
    """Full HTML→Markdown conversion to ordered segments.

    ``strip``: True → blacklist + density/link-density pruning (web pages,
    where chrome heuristics earn their keep); ``"blacklist"`` → drop only
    the hard-blacklist subtrees (script/style/nav/…) without density
    pruning — for trusted book-like content (EPUB chapters) where a
    link-dense page IS the content (TOC, index) and the reference's
    html-to-markdown keeps it; False → raw tree (tests only).
    """
    root = parse_html(text)
    if strip == "blacklist":
        root = _drop_tags_only(root)
    elif strip:
        root = strip_boilerplate(root)
    emitter = _Emitter()
    emitter.dispatch(root)
    parts = _blocks_join(emitter.blocks)

    segments: list[Segment] = []
    for p in parts:
        if isinstance(p, str):
            segments.append(md(p))
        else:
            _, alt, src = p
            segments.append(image(f"![{alt}]({src})", src))
    return merge_markdown(segments)


def html_to_markdown(text: str, strip: bool = True) -> str:
    from .base import segments_text

    return segments_text(convert_html(text, strip=strip))
