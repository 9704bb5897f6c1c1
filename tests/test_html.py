"""HTML kernel contract, ported from html_test.go plus FIXTURES.md §3.

The reference delegates to html-to-markdown v2 (html.go:32); its tests are
substring/property assertions, which we port, plus exact-string goldens we
pin ourselves (we own the fixtures — SURVEY.md §2.3).
"""

from marky_spark.kernels.base import IMAGE, segments_text
from marky_spark.kernels.htmlk import convert_html, html_to_markdown


def test_simple_html():
    # html_test.go:91-99
    got = html_to_markdown(
        '<h2>Title</h2>\n<p>Simple paragraph with <em>emphasis</em>.</p>\n'
        '<a href="https://example.com">Link</a>'
    )
    assert got == "## Title\n\nSimple paragraph with *emphasis*.\n\n[Link](https://example.com)"


def test_headings_all_levels():
    got = html_to_markdown("<h1>a</h1><h3>b</h3><h6>c</h6>")
    assert got == "# a\n\n### b\n\n###### c"


def test_strong_and_nested_inline():
    got = html_to_markdown("<p>This is a <strong>test</strong> paragraph.</p>")
    assert got == "This is a **test** paragraph."


def test_lists():
    # FIXTURES.md: ul→'* ', ol→'N. '
    got = html_to_markdown("<ul><li>Item 1</li><li>Item 2</li></ul>")
    assert got == "* Item 1\n* Item 2"
    got = html_to_markdown("<ol><li>One</li><li>Two</li></ol>")
    assert got == "1. One\n2. Two"


def test_nested_list():
    got = html_to_markdown(
        "<ul><li>a<ul><li>b</li></ul></li><li>c</li></ul>"
    )
    assert got == "* a\n  * b\n* c"


def test_table():
    # html_test.go:124-166 — thead/tbody table content preserved as pipe table
    got = html_to_markdown(
        "<table><thead><tr><th>Name</th><th>Age</th></tr></thead>"
        "<tbody><tr><td>John</td><td>30</td></tr></tbody></table>"
    )
    assert got == "| Name | Age |\n| --- | --- |\n| John | 30 |"


def test_entities_decoded():
    # html_test.go:168-195
    got = html_to_markdown("<p>&lt;tag&gt; &amp; &quot;quoted&quot;</p>")
    assert got == '<tag> & "quoted"'


def test_inline_code_and_pre():
    # html_test.go:197-227
    got = html_to_markdown("<p>Use <code>x = 1</code> here.</p>")
    assert got == "Use `x = 1` here."
    got = html_to_markdown("<pre><code>line1\nline2</code></pre>")
    assert got == "```\nline1\nline2\n```"


def test_blockquote():
    got = html_to_markdown("<blockquote><p>quoted text</p></blockquote>")
    assert got == "> quoted text"


def test_hr_and_br():
    assert html_to_markdown("<p>a<br>b</p><hr>") == "a\nb\n\n---"


def test_malformed_html_tolerated():
    # html_test.go:260-286 — unclosed tags never error
    got = html_to_markdown("<p>Unclosed <b>bold <p>next para")
    assert "Unclosed" in got and "next para" in got


def test_unicode_preserved():
    # html_test.go:288-322
    got = html_to_markdown("<p>中文 emoji 😀 العربية</p>")
    assert got == "中文 emoji 😀 العربية"


def test_image_becomes_media_span():
    # FIXTURES.md §3: <img> → kind='image' span with media_ref=src
    segs = convert_html('<p>before <img alt="a" src="x.png"> after</p>')
    kinds = [s[0] for s in segs]
    assert IMAGE in kinds
    img = next(s for s in segs if s[0] == IMAGE)
    assert img == ("image", "![a](x.png)", "x.png")
    assert segments_text(segs) == "before ![a](x.png) after"


def test_boilerplate_stripped_docusaurus_style():
    # test_files/test.html motivating case: nav/footer/aside chrome dropped
    page = """
    <html><head><title>t</title><script>var x=1;</script>
    <style>.a{color:red}</style></head>
    <body>
    <nav><a href="/">Home</a><a href="/blog">Blog</a><a href="/docs">Docs</a></nav>
    <div class="sidebar"><a href="/p1">Post 1</a> <a href="/p2">Post 2</a> <a href="/p3">Post 3</a></div>
    <article>
      <h1>Real Article</h1>
      <p>This is the actual content of the page, long enough to dominate the
      text mass of the document and therefore survive density pruning.</p>
      <p>Second paragraph with a <a href="https://example.com">real link</a>
      inside flowing prose that keeps the link density low.</p>
    </article>
    <footer><a href="/tos">Terms</a><a href="/privacy">Privacy</a></footer>
    </body></html>
    """
    got = html_to_markdown(page)
    assert "# Real Article" in got
    assert "actual content" in got
    assert "Home" not in got          # nav dropped
    assert "Post 1" not in got        # link-dense sidebar pruned
    assert "Terms" not in got         # footer dropped
    assert "var x=1" not in got       # script dropped
    assert "color:red" not in got     # style dropped


def test_small_fixture_survives_pruning():
    # a standalone link must NOT be treated as boilerplate
    got = html_to_markdown('<a href="https://example.com">Link</a>')
    assert got == "[Link](https://example.com)"


def test_empty_html():
    # html_test.go:103-124 — empty input → minimal output
    assert html_to_markdown("") == ""


def test_div_soup_paragraphs():
    got = html_to_markdown("<div><div>first</div><div>second</div></div>")
    assert got == "first\n\nsecond"


def test_whitespace_collapsed():
    got = html_to_markdown("<p>a\n   b\t c</p>")
    assert got == "a b c"


# --- differential: fast tokenizer vs stdlib html.parser baseline ---

TRICKY_SNIPPETS = [
    "<p>a<p>b<p>c",                                   # implied closes
    "<ul><li>x<li>y</ul>",
    "<div><span>unclosed",
    "text only, no tags at all & an entity",
    '<a href="x?a=1&amp;b=2">q</a>',
    "<br/><hr /><img src='s.png' alt=unquoted>",
    "<script>if (a<b && c>d) {}</script><p>after</p>",
    "<style>p>a{color:red}</style><p>ok</p>",
    "<!-- comment with <p>fake tags</p> --><p>real</p>",
    "<!DOCTYPE html><html><body><p>x</p></body></html>",
    "<P>UPPER<B>case</B> tags</P>",
    "<td>stray table cell</td>",
    "<p title='it&#39;s'>entity in attr</p>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    "<pre>  keep   spaces  </pre>",
    "<p>emoji 😀 &amp; CJK 中文</p>",
    "<input type=checkbox checked><p>after void</p>",
    "<div a b=2 c='3'>attr soup</div>",
    "<p>trailing <",
    "<>< p>< /p>",
]


def test_fast_tokenizer_matches_stdlib_on_snippets():
    from marky_spark.kernels.htmlk import parse_html, parse_html_stdlib

    def render(tree):
        # compare through the public behavior: emitted markdown segments
        from marky_spark.kernels.htmlk import _Emitter, _blocks_join

        em = _Emitter()
        em.dispatch(tree)
        return _blocks_join(em.blocks)

    for snippet in TRICKY_SNIPPETS:
        fast = render(parse_html(snippet))
        ref = render(parse_html_stdlib(snippet))
        assert fast == ref, f"divergence on {snippet!r}:\n{fast}\nvs\n{ref}"


def test_fast_tokenizer_matches_stdlib_on_real_page():
    from marky_spark.kernels.htmlk import (
        _Emitter,
        _blocks_join,
        parse_html,
        parse_html_stdlib,
        strip_boilerplate,
    )

    raw = open("/root/reference/test_files/test.html", encoding="utf-8").read()

    def md_of(parser):
        em = _Emitter()
        em.dispatch(strip_boilerplate(parser(raw)))
        return _blocks_join(em.blocks)

    assert md_of(parse_html) == md_of(parse_html_stdlib)


def test_fast_tokenizer_golden_inputs_identical():
    from marky_spark.corpus import GOLDEN_CASES
    from marky_spark.kernels.htmlk import convert_html, parse_html_stdlib
    import marky_spark.kernels.htmlk as H

    html_cases = [
        c for c in GOLDEN_CASES
        if c["spans"][0][0] == "html"
    ]
    for case in html_cases:
        text = case["spans"][0][1]
        fast = convert_html(text)
        orig_parse = H.parse_html
        H.parse_html = parse_html_stdlib
        try:
            ref = convert_html(text)
        finally:
            H.parse_html = orig_parse
        assert fast == ref, case["doc_id"]


def test_adversarial_deep_nesting_bounded():
    # 3000 nested <b> must not blow the recursion limit (depth cap)
    out = html_to_markdown("a<b>" * 3000)
    assert isinstance(out, str) and "a" in out
    out = html_to_markdown("<div>" * 5000 + "text")
    assert "text" in out


# --- property-based differential: random structured HTML ---

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _TAGS = ["p", "div", "span", "em", "strong", "ul", "li", "h2",
             "blockquote", "code", "pre", "table", "tr", "td", "a"]
    _texts = st.text(
        alphabet=st.characters(
            blacklist_characters="<>&",
            blacklist_categories=("Cs",),
        ),
        max_size=20,
    )

    @st.composite
    def _html_tree(draw, depth=0):
        if depth >= 3 or draw(st.booleans()):
            return draw(_texts)
        tag = draw(st.sampled_from(_TAGS))
        n = draw(st.integers(min_value=0, max_value=3))
        inner = "".join(draw(_html_tree(depth + 1)) for _ in range(n))
        attr = ""
        if tag == "a" and draw(st.booleans()):
            href = draw(st.text(alphabet="abcxyz:/.", max_size=12))
            attr = f' href="{href}"'
        return f"<{tag}{attr}>{inner}</{tag}>"

    @given(_html_tree())
    @settings(max_examples=300, deadline=None)
    def test_fast_tokenizer_matches_stdlib_on_random_trees(doc):
        from marky_spark.kernels.htmlk import (
            _Emitter,
            _blocks_join,
            _parts_text,
            parse_html,
            parse_html_stdlib,
        )

        def md_of(parser):
            em = _Emitter()
            em.dispatch(parser(doc))
            return _parts_text(_blocks_join(em.blocks))

        assert md_of(parse_html) == md_of(parse_html_stdlib)
except ImportError:  # pragma: no cover
    pass


def test_unclosed_cells_keep_all_table_rows():
    """<tr> after an unclosed <td> must close both td AND tr (legacy HTML)."""
    from marky_spark.kernels.htmlk import html_to_markdown

    out = html_to_markdown(
        "<table><tr><td>a<td>b<tr><td>c<td>d</table>", strip=False)
    assert out == "| a | b |\n| --- | --- |\n| c | d |"


def test_br_inside_cell_keeps_row_on_one_line():
    from marky_spark.kernels.htmlk import html_to_markdown

    out = html_to_markdown(
        "<table><tr><td>a<br>b</td><td>x</td></tr></table>", strip=False)
    assert out.splitlines()[0] == "| a b | x |"


def test_safety_net_fallback_never_leaks_script():
    """When density pruning removes all text, the raw-tree fallback must
    still drop blacklist subtrees."""
    from marky_spark.kernels.htmlk import html_to_markdown

    links = "<a href='u'>link</a>" * 9
    page = ("<html><body><script>var secret=1;</script>"
            + "".join("<div>" + links + "</div>" for _ in range(4))
            + "</body></html>")
    assert "secret" not in html_to_markdown(page)


def test_real_script_style_elements_never_leak_under_soup():
    """Any ACTUAL script/style element's content must be suppressed even
    amid surrounding malformed markup (the blacklist + rawtext contract).
    '<script' swallowed into another tag's attribute soup is out of scope —
    per the HTML5 tokenizer that text is not script content."""
    import random

    from marky_spark.kernels.htmlk import convert_html

    rng = random.Random(3)
    noise = ["<p>", "</div>", "<", ">", "<!--", "text ", "</b>", "<br>",
             "<li>", "</table>", "<em>ok</em>"]
    for _ in range(2000):
        pre = "".join(rng.choice(noise) for _ in range(rng.randint(0, 6)))
        post = "".join(rng.choice(noise) for _ in range(rng.randint(0, 6)))
        # the script element starts at top level (not inside a tag's attrs)
        doc = pre + ("" if pre.endswith("<") else "") + \
            "<p>x</p><script>ZZSECRETZZ</script>" + post
        out = "".join(s[1] for s in convert_html(doc))
        assert "ZZSECRETZZ" not in out, doc
