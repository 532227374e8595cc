"""Synthetic web fixture — the deterministic no-network "internet".

Models the reference's webmock fake-httpbingo test double
(/root/reference/test/test_helper.rb:36-77) as data:

- /html          -> the Moby-Dick page
- /xml           -> the slideshow doc
- /redirect/:n   -> 302 chain ending at /get
- /test.html     -> the reference's test.html fixture
- anything else  -> JSON echo {args, body, headers, method, rand} where
                    `rand` is a seeded deterministic value per
                    (url, method, body) — the cache-hit sentinel
- http://cafe    -> ISO-8859-1 body 'café' (utf8 transcode test,
                    test_base.rb:130-138)
- http://error/* -> status 500 (retry amplification, test_base.rb:57-61)
- http://flaky/:n-> 500 for the first n-1 attempts, then 200 (needs a
                    stateful fetcher; FixtureFetcher models attempt count)

The fixture is consumed by FixtureFetcher (sources/fetch.py) via a broadcast
dict at test scale, or generated on the fly (body = f(url, seed)) at bench
scale so no giant broadcast is needed.
"""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path

MOBY = "<body>\n  <h1>Herman Melville - Moby-Dick</h1>\n</body>\n"
SLIDESHOW = (
    "<!--   A SAMPLE set of slides   -->\n"
    "<slideshow>\n"
    '  <slide type="all">\n'
    "    <title>Wake up to WonderWidgets!</title>\n"
    "  </slide>\n"
    '  <slide type="all">\n'
    "    <title>Overview</title>\n"
    "  </slide>\n"
    "</slideshow>\n"
)

_TEST_HTML_PATH = Path(__file__).resolve().parents[2] / "tests" / "fixtures" / "test_page.html"

_REDIRECT_RE = re.compile(r"^/redirect/(\d+)$")


def det_rand(url: str, method: str, body: str, seed: int = 42) -> float:
    """Deterministic stand-in for the reference's `rand` cache sentinel."""
    h = hashlib.sha256(f"{seed}|{method}|{url}|{body}".encode()).hexdigest()
    return int(h[:13], 16) / 16**13


class SyntheticWeb:
    """Resolve (url, method, body, params) -> (status, content_type, body,
    redirect_to). Pure function of its inputs + seed; safe to instantiate
    inside executor UDFs."""

    def __init__(self, seed: int = 42, extra_pages: dict | None = None):
        self.seed = seed
        self.extra = dict(extra_pages or {})

    def resolve(self, url: str, method: str = "GET", body: str = "") -> tuple:
        """Returns (status:int, content_type:str, body:str, redirect_to:str|None)."""
        from urllib.parse import parse_qsl, urlsplit

        if url in self.extra:
            page = self.extra[url]
            if isinstance(page, tuple):
                return page
            return (200, "text/html", page, None)

        parts = urlsplit(url)
        host, path = parts.hostname or "", parts.path or "/"

        if host == "error":
            return (500, "text/plain", "boom", None)
        if host == "cafe":
            # served as ISO-8859-1; fetcher transcodes to UTF-8 (utf8 option)
            return (200, "text/html; charset=iso-8859-1", "café", None)

        m = _REDIRECT_RE.match(path)
        if m:
            n = int(m.group(1))
            loc = f"/redirect/{n - 1}" if n > 1 else "/get"
            return (302, "text/html", "", f"{parts.scheme}://{parts.netloc}{loc}")
        if path == "/html":
            return (200, "text/html", MOBY, None)
        if path == "/xml":
            return (200, "application/xml", SLIDESHOW, None)
        if path == "/test.html" and _TEST_HTML_PATH.exists():
            return (200, "text/html", _TEST_HTML_PATH.read_text(), None)

        # JSON echo (the reference's fallback endpoint)
        payload: dict = {}
        if parts.query:
            args: dict = {}
            for k, v in parse_qsl(parts.query, keep_blank_values=True):
                args[k] = f"{args[k]},{v}" if k in args else v
            payload["args"] = args
        if body:
            payload["body"] = body
        payload["method"] = method
        payload["rand"] = det_rand(url, method, body, self.seed)
        return (200, "application/json", json.dumps(payload, indent=1), None)


def synthetic_body(url: str, seed: int = 42, n_links: int = 8, n_hosts: int = 1000) -> str:
    """Bench-scale page generator: deterministic HTML with outlinks, no
    broadcast table needed (body = f(url, seed)). Produces an interleaved
    text+link+image page so the parse stage does real work."""
    h = int(hashlib.sha256(f"{seed}|{url}".encode()).hexdigest()[:15], 16)
    parts = [f"<html><head><title>page {h % 99991}</title></head><body>"]
    parts.append(f"<h1>Synthetic {h % 1009}</h1>")
    for i in range(n_links):
        hh = (h + i * 0x9E3779B9) % (1 << 40)
        target_host = f"host{hh % n_hosts}.test"
        parts.append(f"<p>para {i} word{hh % 271} content</p>")
        parts.append(f'<a href="http://{target_host}/p/{hh % 100000}">link {i}</a>')
        if i % 3 == 0:
            parts.append(f'<img src="http://{target_host}/img/{hh % 1000}.png" alt="im{i}">')
    parts.append("</body></html>")
    return "".join(parts)
