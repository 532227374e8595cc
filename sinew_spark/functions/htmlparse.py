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
- CSS subset (tier 2): tag, #id, .class, tag.class, '*', attribute
  selectors with operators ([attr], [a=v], ^= $= *= ~= |=), structural
  pseudo-classes (:first-child, :last-child, :only-child,
  :nth-child(an+b|odd|even|N), :nth-of-type, :first-of-type), descendant
  and child ('>') combinators, and comma groups — covers the reference's
  recipe suite plus the real-world shapes Nokogiri accepts
  (`td.title > a`, README.md:52-62).

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


_RAW_TAG_RE = re.compile(r"<\s*([^\s/>]+)")
_RAW_ATTR_NAME_RE = re.compile(
    r"""([^\s=/>'"]+)\s*(?:=\s*(?:"[^"]*"|'[^']*'|[^\s>]*))?"""
)


class _TreeBuilder(HTMLParser):
    """xml=True preserves tag/attribute-name CASE (Nokogiri::XML is
    case-sensitive, reference response.rb:42-44, while Nokogiri::HTML
    lowercases — stdlib HTMLParser always lowercases, so xml mode
    recovers the original names from the raw start-tag text)."""

    def __init__(self, xml: bool = False):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]
        self.xml = xml

    def _orig_names(self, tag, attrs):
        """Recover original-case tag + attr names from the raw start tag;
        values come from HTMLParser (already entity-decoded)."""
        raw = self.get_starttag_text() or ""
        m = _RAW_TAG_RE.match(raw)
        if m:
            tag = m.group(1)
            rest = raw[m.end():]
            names = [
                n for n in _RAW_ATTR_NAME_RE.findall(rest)
                if n not in ("/", ">") and not n.endswith("/>") and n != ""
            ]
            names = [n.rstrip("/>") for n in names if n.rstrip("/>")]
            if len(names) == len(attrs):
                attrs = [(n, v) for n, (_lc, v) in zip(names, attrs)]
        return tag, attrs

    def handle_starttag(self, tag, attrs):
        if self.xml:
            tag, attrs = self._orig_names(tag, attrs)
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)
        # XML has no void elements — every tag closes explicitly or is
        # handled by handle_startendtag
        if self.xml or tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self.xml:
            tag, attrs = self._orig_names(tag, attrs)
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            t = self.stack[i].tag
            if t == tag or (self.xml and t is not None and t.lower() == tag):
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            parent = self.stack[-1]
            parent.children.append(Node(None, {"#text": data}, parent=parent))


def parse_html(body: str, clean: bool = True, xml: bool = False) -> Node:
    """Parse an HTML/XML string into a Node tree.

    clean=True applies the reference's Response#html whitespace cleanup
    first (response.rb:10-24) so extracted .text matches Nokogiri-over-html.
    xml=True preserves tag/attribute case (Nokogiri::XML parity,
    response.rb:42-44); pair it with ``css_select(..., xml=True)`` for
    case-sensitive selector matching.
    """
    if clean:
        body = html_cleanup_str(body or "")
    p = _TreeBuilder(xml=xml)
    p.feed(body or "")
    p.close()
    return p.root


# --- CSS subset -------------------------------------------------------------
#
# Tier-2+3 grammar (Nokogiri css(), lib/sinew/response.rb:37-39; real-world
# recipe selectors like `td.title > a` per reference README.md:52-62):
#   compound:   tag? #id? .class* [attr op value]* :pseudo*
#   attr ops:   [a] [a=v] [a^=v] [a$=v] [a*=v] [a~=v] [a|=v]
#   pseudos:    :first-child :last-child :only-child
#               :nth-child(an+b | odd | even | N)  :nth-of-type(...)
#               :not(simple-selector)  (argument may not itself carry a
#               parenthesized pseudo — CSS3 :not takes a simple selector)
#   combinators: descendant (space), child (>), adjacent sibling (+),
#                general sibling (~)
#   groups:     comma-separated selector list, document-order union

_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<attrs>(?:\[[\w-]+(?:[~^$*|]?=[^\]]*)?\])*)"
    r"(?P<pseudos>(?::[\w-]+(?:\([^)]*\))?)*)$"
)
_ATTR_RE = re.compile(r"\[([\w-]+)(?:([~^$*|]?=)([^\]]*))?\]")
_PSEUDO_RE = re.compile(r":([\w-]+)(?:\(([^)]*)\))?")
_NTH_RE = re.compile(r"^([+-]?\d*)n([+-]\d+)?$")


def _parse_nth(expr: str) -> tuple[int, int]:
    """Parse a CSS an+b expression → (a, b)."""
    expr = expr.strip().lower().replace(" ", "")
    if expr == "odd":
        return (2, 1)
    if expr == "even":
        return (2, 0)
    m = _NTH_RE.match(expr)
    if m:
        a_s = m.group(1)
        a = 1 if a_s in ("", "+") else (-1 if a_s == "-" else int(a_s))
        b = int(m.group(2)) if m.group(2) else 0
        return (a, b)
    return (0, int(expr))


def _nth_matches(a: int, b: int, i: int) -> bool:
    """True iff 1-based index i == a*n + b for some integer n >= 0."""
    if a == 0:
        return i == b
    return (i - b) % a == 0 and (i - b) // a >= 0


def _elem_siblings(node: Node) -> list[Node]:
    if node.parent is None:
        return [node]
    return [c for c in node.parent.children if not c.is_text]


def _attr_match(op: str, have: str, want: str) -> bool:
    if op == "=":
        return have == want
    if op == "^=":
        return bool(want) and have.startswith(want)
    if op == "$=":
        return bool(want) and have.endswith(want)
    if op == "*=":
        return bool(want) and want in have
    if op == "~=":
        return want in have.split()
    if op == "|=":
        return have == want or have.startswith(want + "-")
    raise ValueError(f"unsupported attribute operator: {op!r}")


def _compile_simple(sel: str, xml: bool = False):
    m = _SIMPLE_RE.match(sel)
    if not m or not sel:
        raise ValueError(f"unsupported CSS selector component: {sel!r}")
    tag = m.group("tag")
    # HTML matching is case-insensitive (the tree is lowercased); XML
    # matching is exact (Nokogiri::XML parity, response.rb:42-44)
    tag = None if tag in (None, "*") else (tag if xml else tag.lower())
    nid = m.group("id")[1:] if m.group("id") else None
    classes = [c for c in (m.group("classes") or "").split(".") if c]
    attrs = []
    for k, op, v in _ATTR_RE.findall(m.group("attrs") or ""):
        attrs.append((k if xml else k.lower(), op or None, v.strip("\"'") if op else None))
    pseudos = []
    for name, arg in _PSEUDO_RE.findall(m.group("pseudos") or ""):
        name = name.lower()
        if name == "first-child":
            pseudos.append(("nth-child", (0, 1)))
        elif name == "last-child":
            pseudos.append(("last-child", None))
        elif name == "only-child":
            pseudos.append(("only-child", None))
        elif name in ("nth-child", "nth-of-type"):
            pseudos.append((name, _parse_nth(arg or "")))
        elif name == "first-of-type":
            pseudos.append(("nth-of-type", (0, 1)))
        elif name == "not":
            if not (arg or "").strip():
                raise ValueError(f"empty :not() argument in: {sel!r}")
            pseudos.append(("not", _compile_simple(arg.strip(), xml=xml)))
        else:
            raise ValueError(f"unsupported CSS pseudo-class: :{name}")

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
        for k, op, v in attrs:
            if k not in node.attrs:
                return False
            if op is not None and not _attr_match(op, node.attrs.get(k) or "", v):
                return False
        for kind, arg in pseudos:
            if kind == "not":
                if arg(node):
                    return False
                continue
            sibs = _elem_siblings(node)
            if kind == "last-child":
                if not sibs or sibs[-1] is not node:
                    return False
            elif kind == "only-child":
                if len(sibs) != 1:
                    return False
            elif kind == "nth-child":
                if not _nth_matches(*arg, sibs.index(node) + 1):
                    return False
            else:  # nth-of-type
                typed = [s for s in sibs if s.tag == node.tag]
                if not _nth_matches(*arg, typed.index(node) + 1):
                    return False
        return True

    return match


def _split_top(sel: str, seps: str) -> list[str]:
    """Split on separator chars outside [...] / (...) nesting; '>' is kept
    as its own token, whitespace runs collapse to token boundaries."""
    tokens, buf, depth = [], [], 0
    for ch in sel:
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        if depth == 0 and ch in seps:
            if buf:
                tokens.append("".join(buf))
                buf = []
            if ch not in " \t":
                tokens.append(ch)
        else:
            buf.append(ch)
    if buf:
        tokens.append("".join(buf))
    return tokens


def _compile_compound(compound: str, xml: bool = False):
    """Compile one comma-group member into [(combinator, pred), ...] where
    combinator is the relation to the PREVIOUS part: descendant ' ',
    child '>', adjacent sibling '+', general sibling '~'."""
    parts = []
    comb = " "
    for tok in _split_top(compound, " \t>+~"):
        if tok in (">", "+", "~"):
            if not parts:
                raise ValueError(
                    f"selector may not start with {tok!r}: {compound!r}"
                )
            if comb in (">", "+", "~"):
                raise ValueError(f"doubled combinator in: {compound!r}")
            comb = tok
            continue
        parts.append((comb, _compile_simple(tok, xml=xml)))
        comb = " "
    if comb in (">", "+", "~") or not parts:
        raise ValueError(f"empty CSS selector component in: {compound!r}")
    return parts


def _match_chain(node: Node, parts, idx: int) -> bool:
    """node matched parts[idx]; check the left context with backtracking."""
    if idx == 0:
        return True
    comb = parts[idx][0]
    pred = parts[idx - 1][1]
    if comb in ("+", "~"):
        sibs = _elem_siblings(node)
        i = sibs.index(node)
        if comb == "+":
            return (
                i > 0 and pred(sibs[i - 1]) and _match_chain(sibs[i - 1], parts, idx - 1)
            )
        return any(
            pred(s) and _match_chain(s, parts, idx - 1) for s in sibs[:i]
        )
    anc = node.parent
    if comb == ">":
        if anc is None or anc.is_text or anc.tag == "#root":
            return False
        return pred(anc) and _match_chain(anc, parts, idx - 1)
    while anc is not None and anc.tag != "#root":
        if not anc.is_text and pred(anc) and _match_chain(anc, parts, idx - 1):
            return True
        anc = anc.parent
    return False


def css_select(root: Node, selector: str, xml: bool = False) -> list[Node]:
    """CSS select in document order (Nokogiri css() subset): descendant,
    child, and sibling (+/~) combinators, comma groups, attribute
    operators, structural pseudo-classes and :not(). One document-order
    traversal; a node is emitted once even if several group members match
    it. xml=True matches tag/attr names case-sensitively (pair with
    ``parse_html(..., xml=True)``)."""
    groups = [
        _compile_compound(g, xml=xml)
        for g in _split_top(selector, ",")
        if g != ","
    ]
    if not groups:
        raise ValueError(f"empty CSS selector: {selector!r}")
    out = []
    for node in root.iter():
        for parts in groups:
            if parts[-1][1](node) and _match_chain(node, parts, len(parts) - 1):
                out.append(node)
                break
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


def _make_link_resolver(base_url: str):
    """Per-document link resolver: urljoin semantics, but the dominant link
    forms (absolute, protocol-relative, root-relative without dot segments)
    resolve with string concatenation — one urlsplit per DOCUMENT instead of
    one urljoin (≈2 urlparse calls) per LINK. urljoin passes absolute and
    protocol-relative refs through without dot-segment resolution and
    resolves dots only for root-relative paths, so the fast branches guard
    on '/.' and fall back to urljoin for exact parity."""
    from urllib.parse import urljoin, urlsplit

    try:
        parts = urlsplit(base_url)
        scheme, netloc = parts.scheme, parts.netloc
    except ValueError:
        scheme, netloc = "", ""
    if not scheme or not netloc:
        return lambda m: urljoin(base_url, m)
    prefix = scheme + ":"
    origin = scheme + "://" + netloc

    def resolve(m: str) -> str:
        # urljoin drops empty '?'/'#' markers and resolves '/.' segments in
        # root-relative refs — those forms take the slow path
        if "#" in m or m.endswith("?"):
            return urljoin(base_url, m)
        if m.startswith(("http://", "https://")):
            return m
        if m.startswith("//"):
            # empty-authority refs ('///p', '//?q', '//#f', bare '//')
            # resolve against the base host in urljoin — only a ref with a
            # real host char after '//' may take the concat fast path
            if m[2:3] in ("", "/", "?", "#"):
                return urljoin(base_url, m)
            return prefix + m
        if m.startswith("/") and "/." not in m:
            return origin + m
        return urljoin(base_url, m)

    return resolve


def extract_spans_and_links(
    body: str, content_type: str = "text/html", base_url: str = "",
    nofollow: bool = True,
) -> tuple[list[tuple], list[str]]:
    """Single-parse extraction of both the span sequence and resolved
    outlinks (one tree walk; parsing twice doubles the hot-path cost).

    ``nofollow=True`` (the crawler default) honors ``rel=nofollow`` on
    the anchor and page-level ``<meta name=robots content=nofollow|none>``
    when building the OUTLINK list — gated hrefs never reach the frontier.
    The span sequence is untouched either way (the anchor text/href span
    still archives; only FOLLOWING is gated), so the golden span contract
    and the BASELINE span-equality invariant are unaffected. Set False to
    harvest every href (link-graph analysis)."""
    if body is None:
        return [], []
    if content_type and "json" in content_type:
        return [("text", html_cleanup_str(body), "", 0)], []
    p = _stream_spans(body)
    spans = [(k, t, m, i) for i, (k, t, m) in enumerate(p.spans)]
    links: list[str] = []
    if content_type and ("html" in content_type or "xml" in content_type):
        resolve = _make_link_resolver(base_url)
        gate_all = nofollow and p.meta_nofollow
        for k, _t, m, o in spans:
            if k == "link" and m and not m.startswith(("javascript:", "mailto:", "#")):
                if gate_all or (nofollow and o in p.nofollow_idx):
                    continue
                links.append(resolve(m))
    return spans, links


def page_robots_flags(body: str, content_type: str = "text/html") -> tuple[bool, bool]:
    """(noindex, nofollow) from ``<meta name=robots>`` (``none`` implies
    both). ``noindex`` is surfaced for pipeline-side filtering (exclude
    the page's content from training exports while its links still
    expand); ``nofollow`` is what extract_spans_and_links already honors
    in the crawl loop."""
    if not body or not content_type or (
        "html" not in content_type and "xml" not in content_type
    ):
        return False, False
    p = _stream_spans(body)
    return p.meta_noindex, p.meta_nofollow


def page_canonical(
    body: str, base_url: str = "", content_type: str = "text/html"
) -> str | None:
    """The page's declared canonical URL (``<link rel=canonical href=…>``,
    RFC 6596), resolved against ``base_url`` when relative. ``None`` when
    absent or non-HTML. The first declaration wins (conflicting
    canonicals are treated as untrustworthy by consumers; taking the
    first keeps extraction deterministic). Feeds
    operators/dedup.collapse_by_canonical — the crawl-side URL-identity
    collapse real corpora need before content-level dedup."""
    if not body or not content_type or (
        "html" not in content_type and "xml" not in content_type
    ):
        return None
    p = _stream_spans(body)
    if p.canonical is None:
        return None
    return _make_link_resolver(base_url)(p.canonical) if base_url else p.canonical


class _SpanStream(HTMLParser):
    """Single-pass span extraction — no tree, no Node allocation.

    Emits exactly the same span sequence as the tree walk it replaced
    (verified by the golden suite): parsing 100k small docs allocates
    millions of Node objects under the tree model, and the allocation + GC
    churn dominated the crawl's parse stage. Streaming extraction is the
    hot path; the Node tree remains for recipe CSS selection (css_select).

    State machine mirroring the tree walk:
    - inside <script>/<style>: drop everything
    - inside a title tag (title/h1-h6): accumulate descendant text; nested
      links/images contribute text only (the walk did not recurse into
      titles)
    - inside <a href>: accumulate descendant text for the link span; only
      DIRECT-child <img src> emit image spans (after the link span)
    - bare text: emitted as a 'text' span only when its immediate parent is
      a block tag or document root
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.spans: list[tuple] = []
        self.stack: list[str] = ["#root"]
        self.skip_depth = 0  # script/style nesting
        self.title_tag = None  # open title-capture tag
        self.title_depth = 0
        self.title_buf: list[str] = []
        self.a_depth = 0  # depth within an open <a href> capture (0 = not in one)
        self.a_buf: list[str] = []
        self.a_href = None
        self.a_imgs: list[tuple] = []
        # robots link-gating metadata (REP §2.5 / rel=nofollow microformat).
        # Never alters the span sequence — the crawl's link expansion reads
        # it to exclude hrefs from the frontier while the anchor span stays.
        self.a_nofollow = False
        self.nofollow_idx: set[int] = set()  # span indexes of nofollow links
        self.meta_nofollow = False  # <meta name=robots content=...nofollow...>
        self.meta_noindex = False
        self.canonical = None  # first <link rel=canonical href=...>, raw

    def _start(self, tag, attrs, self_closing):
        if self.skip_depth:
            if tag in _SKIP_TEXT and not self_closing:
                self.skip_depth += 1
            return
        if tag in _SKIP_TEXT:
            if not self_closing:
                self.skip_depth = 1
            return
        if self.title_tag is not None:
            # inside a title: structure is ignored, only text accumulates
            if not self_closing and tag not in VOID_TAGS:
                self.title_depth += 1
            return
        if self.a_depth:
            if tag == "img" and self.a_depth == 1:
                d = dict(attrs)
                if d.get("src"):
                    self.a_imgs.append(("image", (d.get("alt") or "").strip(), d["src"]))
            if not self_closing and tag not in VOID_TAGS:
                self.a_depth += 1
            return
        if tag in TITLE_TAGS:
            self.title_tag = tag
            self.title_depth = 0 if (self_closing or tag in VOID_TAGS) else 1
            self.title_buf = []
            if self.title_depth == 0:  # degenerate <h1/>
                self.spans.append(("title", "", ""))
                self.title_tag = None
            return
        if tag == "a":
            d = dict(attrs)
            if d.get("href"):
                self.a_href = d["href"]
                self.a_nofollow = "nofollow" in (d.get("rel") or "").lower().split()
                self.a_buf = []
                self.a_imgs = []
                if self_closing:
                    if self.a_nofollow:
                        self.nofollow_idx.add(len(self.spans))
                    self.spans.append(("link", "", self.a_href))
                    self.a_href = None
                else:
                    self.a_depth = 1
                return
        if tag == "link":
            d = dict(attrs)
            rel = (d.get("rel") or "").lower().split()
            # first canonical wins (conflicting declarations: search engines
            # distrust later ones; deterministic either way)
            if "canonical" in rel and d.get("href") and self.canonical is None:
                self.canonical = d["href"]
            return
        if tag == "meta":
            d = dict(attrs)
            if (d.get("name") or "").lower() == "robots":
                toks = {
                    t.strip()
                    for t in (d.get("content") or "").lower().replace(";", ",").split(",")
                }
                self.meta_nofollow |= bool(toks & {"nofollow", "none"})
                self.meta_noindex |= bool(toks & {"noindex", "none"})
            return
        if tag == "img":
            d = dict(attrs)
            if d.get("src"):
                self.spans.append(("image", (d.get("alt") or "").strip(), d["src"]))
                return
        if not self_closing and tag not in VOID_TAGS:
            self.stack.append(tag)

    def handle_starttag(self, tag, attrs):
        self._start(tag, attrs, False)

    def handle_startendtag(self, tag, attrs):
        self._start(tag, attrs, True)

    def handle_endtag(self, tag):
        if self.skip_depth:
            if tag in _SKIP_TEXT:
                self.skip_depth -= 1
            return
        if self.title_tag is not None:
            self.title_depth -= 1
            if self.title_depth <= 0:
                self.spans.append(("title", "".join(self.title_buf).strip(), ""))
                self.title_tag = None
            return
        if self.a_depth:
            self.a_depth -= 1
            if self.a_depth == 0:
                if self.a_nofollow:
                    self.nofollow_idx.add(len(self.spans))
                self.spans.append(("link", "".join(self.a_buf).strip(), self.a_href))
                self.spans.extend(self.a_imgs)
                self.a_href = None
                self.a_nofollow = False
            return
        # mirror the tree builder's pop-to-matching-tag rule
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i] == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if self.skip_depth or not data:
            return
        if self.title_tag is not None:
            self.title_buf.append(data)
            return
        if self.a_depth:
            self.a_buf.append(data)
            return
        txt = data.strip()
        if txt and (self.stack[-1] in _BLOCK_TAGS or self.stack[-1] == "#root"):
            self.spans.append(("text", txt, ""))

    def close(self):
        super().close()
        # unclosed captures at EOF flush like the tree walk would
        if self.title_tag is not None:
            self.spans.append(("title", "".join(self.title_buf).strip(), ""))
            self.title_tag = None
        if self.a_depth:
            if self.a_nofollow:
                self.nofollow_idx.add(len(self.spans))
            self.spans.append(("link", "".join(self.a_buf).strip(), self.a_href))
            self.spans.extend(self.a_imgs)
            self.a_depth = 0


def _stream_spans(body: str) -> "_SpanStream":
    """Feed one document through the streaming span parser and return the
    parser (spans + nofollow/meta-robots metadata). The ONE shared parse
    used by extract_spans, extract_spans_and_links, and page_robots_flags
    — the span sequence those three see must stay identical (golden
    contract), so there is exactly one copy of the feed logic."""
    p = _SpanStream()
    p.feed(html_cleanup_str(body))
    p.close()
    return p


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
    return [(k, t, m, i) for i, (k, t, m) in enumerate(_stream_spans(body).spans)]


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
