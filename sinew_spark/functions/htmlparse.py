"""HTML/XML parsing, CSS selection, and interleaved span extraction.

Replaces the reference's Nokogiri views (/root/reference/lib/sinew/
response.rb:37-44) and recipe-level CSS extraction (test/recipes/
noko.sinew, xml.sinew) with a dependency-free tree parser designed to run
inside Arrow-batched pandas UDFs (mapInPandas) — one parse per document,
vectorized across a batch, no per-row Python crossing the JVM boundary.

Semantics matched to the reference:
- parsing happens over the *cleaned* html (html_cleanup_str), so node
  ``.text`` values have squished whitespace exactly like Nokogiri over
  Response#html (response.rb:10-24).
- NodeSet text joins with a single SPACE, not '' (nokogiri_ext.rb:10-17,
  proven by test_nokogiri_ext.rb:5-9).
- CSS subset: tag, #id, .class, tag.class, [attr], [attr=val], '*', and
  descendant combinator — covers every selector in the reference's recipe
  suite ('h1', 'slide title', '#element', '.e', '#nokogiri_ext ul li').

Span extraction implements the interleaved text+media document model
(BASELINE.json input_hint): each document becomes an ordered
array<struct<kind,text,media_ref,offset>> — kinds: title / text / link /
image — offset is 0-based document order.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .normalize import html_cleanup_str

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}
_SKIP_TEXT = {"script", "style"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag, attrs=None, parent=None):
        self.tag = tag  # None for text nodes (tag in attrs['#text'])
        self.attrs = attrs or {}
        self.children = []
        self.parent = parent

    @property
    def is_text(self):
        return self.tag is None

    def text(self) -> str:
        """Concatenated descendant text (Nokogiri Node#text semantics)."""
        if self.is_text:
            return self.attrs.get("#text", "")
        return "".join(c.text() for c in self.children)

    def inner_html(self) -> str:
        return "".join(c.to_html() for c in self.children)

    def to_html(self) -> str:
        if self.is_text:
            return self.attrs.get("#text", "")
        a = "".join(
            f' {k}="{v}"' if v is not None else f" {k}"
            for k, v in self.attrs.items()
        )
        if self.tag in VOID_TAGS and not self.children:
            return f"<{self.tag}{a}>"
        return f"<{self.tag}{a}>{self.inner_html()}</{self.tag}>"

    def iter(self):
        """Document-order traversal of element nodes."""
        for c in self.children:
            if not c.is_text:
                yield c
                yield from c.iter()

    def get(self, attr, default=None):
        return self.attrs.get(attr, default)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            parent = self.stack[-1]
            parent.children.append(Node(None, {"#text": data}, parent=parent))


def parse_html(body: str, clean: bool = True) -> Node:
    """Parse an HTML/XML string into a Node tree.

    clean=True applies the reference's Response#html whitespace cleanup
    first (response.rb:10-24) so extracted .text matches Nokogiri-over-html.
    """
    if clean:
        body = html_cleanup_str(body or "")
    p = _TreeBuilder()
    p.feed(body or "")
    p.close()
    return p.root


# --- CSS subset -------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<attr>\[[\w-]+(?:=[^\]]*)?\])?$"
)


def _compile_simple(sel: str):
    m = _SIMPLE_RE.match(sel)
    if not m:
        raise ValueError(f"unsupported CSS selector component: {sel!r}")
    tag = m.group("tag")
    tag = None if tag in (None, "*") else tag.lower()
    nid = m.group("id")[1:] if m.group("id") else None
    classes = [c for c in (m.group("classes") or "").split(".") if c]
    attr = None
    if m.group("attr"):
        inner = m.group("attr")[1:-1]
        if "=" in inner:
            k, v = inner.split("=", 1)
            attr = (k, v.strip("\"'"))
        else:
            attr = (inner, None)

    def match(node: Node) -> bool:
        if node.is_text:
            return False
        if tag and node.tag != tag:
            return False
        if nid and node.attrs.get("id") != nid:
            return False
        if classes:
            have = (node.attrs.get("class") or "").split()
            if any(c not in have for c in classes):
                return False
        if attr:
            k, v = attr
            if k not in node.attrs:
                return False
            if v is not None and node.attrs.get(k) != v:
                return False
        return True

    return match


def css_select(root: Node, selector: str) -> list[Node]:
    """Descendant-combinator CSS select, document order (Nokogiri css())."""
    parts = [_compile_simple(p) for p in selector.split()]
    out = []
    for node in root.iter():
        if parts[-1](node):
            # walk ancestors for the remaining parts right-to-left
            idx = len(parts) - 2
            anc = node.parent
            while idx >= 0 and anc is not None:
                if not anc.is_text and anc.tag != "#root" and parts[idx](anc):
                    idx -= 1
                anc = anc.parent
            if idx < 0:
                out.append(node)
    return out


def nodeset_text(nodes: list[Node]) -> str:
    """NodeSet#inner_text — join with SPACE (nokogiri_ext.rb:10-13)."""
    return " ".join(n.text() for n in nodes)


def nodeset_inner_html(nodes: list[Node]) -> str:
    """NodeSet#inner_html — join with SPACE (nokogiri_ext.rb:15-17)."""
    return " ".join(n.inner_html() for n in nodes)


# --- interleaved span extraction ---------------------------------------------

TITLE_TAGS = {"title", "h1", "h2", "h3", "h4", "h5", "h6"}
_BLOCK_TAGS = {"p", "div", "li", "td", "th", "section", "article", "body"}


def extract_spans_and_links(
    body: str, content_type: str = "text/html", base_url: str = ""
) -> tuple[list[tuple], list[str]]:
    """Single-parse extraction of both the span sequence and resolved
    outlinks (one tree walk; parsing twice doubles the hot-path cost)."""
    from urllib.parse import urljoin

    spans = extract_spans(body, content_type)
    links = []
    if body and content_type and ("html" in content_type or "xml" in content_type):
        for k, _t, m, _o in spans:
            if k == "link" and m and not m.startswith(("javascript:", "mailto:", "#")):
                links.append(urljoin(base_url, m))
    return spans, links


def extract_spans(body: str, content_type: str = "text/html") -> list[tuple]:
    """Extract the interleaved (kind, text, media_ref, offset) span sequence
    from one document (BASELINE.json input_hint shape).

    kinds: 'title' (title/h1-h6), 'link' (<a href>), 'image' (<img src>),
    'text' (block-level text not under a more specific span). offset is
    0-based document order.
    """
    if body is None:
        return []
    if content_type and "json" in content_type:
        return [("text", html_cleanup_str(body), "", 0)]
    root = parse_html(body)
    spans: list[tuple] = []

    def walk(node: Node):
        for c in node.children:
            if c.is_text:
                txt = c.attrs.get("#text", "").strip()
                if txt and (node.tag in _BLOCK_TAGS or node.tag == "#root"):
                    spans.append(("text", txt, ""))
                continue
            if c.tag in _SKIP_TEXT:
                continue
            if c.tag in TITLE_TAGS:
                spans.append(("title", c.text().strip(), ""))
                continue
            if c.tag == "a" and c.get("href"):
                spans.append(("link", c.text().strip(), c.get("href")))
                walk_images_only(c)
                continue
            if c.tag == "img" and c.get("src"):
                spans.append(("image", (c.get("alt") or "").strip(), c.get("src")))
                continue
            walk(c)

    def walk_images_only(node: Node):
        for c in node.children:
            if not c.is_text and c.tag == "img" and c.get("src"):
                spans.append(("image", (c.get("alt") or "").strip(), c.get("src")))

    walk(root)
    return [(k, t, m, i) for i, (k, t, m) in enumerate(spans)]


def extract_links(body: str, base_url: str) -> list[str]:
    """All outgoing hrefs resolved against base_url, document order."""
    from urllib.parse import urljoin

    root = parse_html(body)
    out = []
    for node in root.iter():
        if node.tag == "a" and node.get("href"):
            href = node.get("href")
            if href.startswith(("javascript:", "mailto:", "#")):
                continue
            out.append(urljoin(base_url, href))
    return out
