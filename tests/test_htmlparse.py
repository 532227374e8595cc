"""HTML tree / CSS subset / span extraction tests.

Selector + NodeSet semantics from the reference's test.html fixtures
(/root/reference/test/test.html, test_nokogiri_ext.rb:5-9) and recipe
selectors (test/recipes/noko.sinew, xml.sinew).
"""

from pathlib import Path

from sinew_spark.functions.htmlparse import (
    css_select,
    extract_links,
    extract_spans,
    nodeset_inner_html,
    nodeset_text,
    parse_html,
)

TEST_HTML = Path("/root/reference/test/test.html").read_text()

MOBY = "<body>\n  <h1>Herman Melville - Moby-Dick</h1>\n</body>\n"
SLIDESHOW = """<!--   A SAMPLE set of slides   -->
<slideshow>
  <slide type="all">
    <title>Wake up to WonderWidgets!</title>
  </slide>
  <slide type="all">
    <title>Overview</title>
  </slide>
</slideshow>
"""


def test_css_id_class():
    root = parse_html(TEST_HTML)
    assert nodeset_text(css_select(root, "#element")) == "text"
    # NodeSet join with SPACE (test_nokogiri_ext.rb:5-9)
    assert nodeset_text(css_select(root, ".e")) == "text1 text2"
    lis = css_select(root, "#nokogiri_ext ul li")
    assert [n.text() for n in lis] == ["hello", "world"]


def test_css_descendant_and_tag():
    root = parse_html(SLIDESHOW)
    titles = css_select(root, "slide title")
    assert [n.text() for n in titles] == ["Wake up to WonderWidgets!", "Overview"]
    h1 = css_select(parse_html(MOBY), "h1")
    assert [n.text() for n in h1] == ["Herman Melville - Moby-Dick"]


def test_css_attr():
    root = parse_html(SLIDESHOW)
    assert len(css_select(root, "slide[type=all]")) == 2
    assert len(css_select(root, "slide[type=none]")) == 0


def test_nodeset_inner_html():
    root = parse_html("<ul><li>a</li><li>b</li></ul>")
    assert nodeset_inner_html(css_select(root, "li")) == "a b"


def test_spans_interleaved():
    body = (
        '<body><h1>Top</h1><p>hello <a href="/x">link x</a> world</p>'
        '<img src="/i.png" alt="pic"><p>tail</p></body>'
    )
    spans = extract_spans(body)
    assert spans == [
        ("title", "Top", "", 0),
        ("text", "hello", "", 1),
        ("link", "link x", "/x", 2),
        ("text", "world", "", 3),
        ("image", "pic", "/i.png", 4),
        ("text", "tail", "", 5),
    ]


def test_spans_moby():
    assert extract_spans(MOBY) == [("title", "Herman Melville - Moby-Dick", "", 0)]


def test_extract_links():
    body = '<a href="/a">1</a><a href="http://y.com/b">2</a><a href="#top">3</a>'
    assert extract_links(body, "http://x.com/base/") == [
        "http://x.com/a",
        "http://y.com/b",
    ]


def test_script_text_skipped():
    root = parse_html(TEST_HTML)
    spans = extract_spans(TEST_HTML)
    assert not any("alert" in s[1] for s in spans)
    assert css_select(root, "title")[0].text() == "Title"
