"""RSS / Atom feed ingestion — seed the frontier from syndication feeds.

The reference crawls feeds like any other XML document (recipes call
``xml``/``css`` on them by hand — reference README.md idiom space); at
frontier scale feeds are the standard *change-discovery* surface next to
sitemaps: poll the feed, enqueue only entries you haven't seen. Two
layers, mirroring sources/sitemap.py:

- ``feed_entries``: pure-Catalyst extraction of entries from a DataFrame
  of feed bodies. Handles RSS 2.0 ``<item>`` and Atom ``<entry>`` blocks
  (auto-detected per document), optional CDATA wrappers, XML entity
  unescape, and Atom's attribute-carried links (``rel="alternate"``
  preferred, attribute order insensitive). Block regexp + per-block
  ``transform`` + ``posexplode`` keeps document order; no Python.
- ``discover_feed_links``: HTML autodiscovery (``<link rel="alternate"
  type="application/rss+xml|atom+xml" href=...>``) so a page crawl can
  find the feeds to poll.

Compose with the frontier exactly like sitemaps: ``feed_entries`` →
anti-join seen on the entry link (or guid) → ``crawler.seed_df``.
Scale shape: map-only (regexp + explode) — no shuffle until the caller's
dedup join, which is url-hashed like every frontier join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sitemap import _xml_unescape

# entry blocks; (?:\s[^>]*)? tolerates attributes on the opening tag
_RSS_ITEM = r"(?is)<item(?:\s[^>]*)?>(.*?)</item\s*>"
_ATOM_ENTRY = r"(?is)<entry(?:\s[^>]*)?>(.*?)</entry\s*>"

# simple-content children: optional attrs, optional CDATA wrapper
_TITLE_IN = r"(?is)<title(?:\s[^>]*)?>\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</title\s*>"
_RSS_LINK_IN = r"(?is)<link(?:\s[^>]*)?>\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</link\s*>"
_GUID_IN = r"(?is)<guid(?:\s[^>]*)?>\s*(.*?)\s*</guid\s*>"
_PUBDATE_IN = r"(?is)<pubdate(?:\s[^>]*)?>\s*(.*?)\s*</pubdate\s*>"
_ATOM_ID_IN = r"(?is)<id(?:\s[^>]*)?>\s*(.*?)\s*</id\s*>"
_PUBLISHED_IN = r"(?is)<published(?:\s[^>]*)?>\s*(.*?)\s*</published\s*>"
_UPDATED_IN = r"(?is)<updated(?:\s[^>]*)?>\s*(.*?)\s*</updated\s*>"

# Atom link: href in an attribute; rel="alternate" preferred, either
# attribute order; a REL-LESS <link href=...> (implied alternate per RFC
# 4287 §4.2.7.2) as fallback — NOT any link: grabbing the first href of a
# rel="self"/"enclosure" link would enqueue the feed's own URL or a media
# file as the entry page. Quotes: ["'] on both sides — single-quoted
# attributes are legal XML and common in the wild.
_ATOM_LINK_REL_HREF = (
    r"(?is)<link\s[^>]*rel\s*=\s*[\"']alternate[\"'][^>]*href\s*=\s*[\"']([^\"']*)[\"']"
)
_ATOM_LINK_HREF_REL = (
    r"(?is)<link\s[^>]*href\s*=\s*[\"']([^\"']*)[\"'][^>]*rel\s*=\s*[\"']alternate[\"']"
)
_ATOM_LINK_ANY = r"(?is)<link\s(?![^>]*\brel\s*=)[^>]*href\s*=\s*[\"']([^\"']*)[\"']"


def is_atom_feed(body_col: F.Column) -> F.Column:
    """True when the document is an Atom feed (``<feed`` root)."""
    return body_col.rlike(r"(?i)<([\w.-]+:)?feed[\s>]")


def is_rss_feed(body_col: F.Column) -> F.Column:
    """True for RSS 2.0 (``<rss``) or RSS 1.0 RDF (``<rdf:RDF``) roots."""
    return body_col.rlike(r"(?i)<rss[\s>]|<rdf:rdf[\s>]")


def _nonempty(col: F.Column) -> F.Column:
    return F.when(col != "", col)


def _first_nonempty(*cols: F.Column) -> F.Column:
    return F.coalesce(*[_nonempty(c) for c in cols])


def feed_entries(
    feeds: DataFrame, body_col: str = "resp_body", id_cols: tuple = ("seq",)
) -> DataFrame:
    """One row per feed entry, in document order: ``(*id_cols,
    entry_idx, title, link, eid, published, feed_type)``.

    - ``eid`` — RSS ``<guid>`` / Atom ``<id>`` (the dedup identity;
      feeds re-date entries, guids are stable).
    - ``published`` — RSS ``<pubDate>`` / Atom ``<published>`` falling
      back to ``<updated>``; raw string (RFC 822 vs RFC 3339 — parsing
      to timestamps is the caller's policy).
    - Missing fields are NULL, titles/links are CDATA-stripped and
      entity-unescaped (sitemap parity).

    Catalyst-only and map-only: block ``regexp_extract_all`` + one
    ``transform`` + ``posexplode`` — zero shuffle, fuses into the scan
    stage's WholeStageCodegen.
    """
    body = F.col(body_col)
    atom = is_atom_feed(body)
    blocks = F.when(
        atom, F.regexp_extract_all(body, F.lit(_ATOM_ENTRY), F.lit(1))
    ).otherwise(F.regexp_extract_all(body, F.lit(_RSS_ITEM), F.lit(1)))

    def _fields(b: F.Column) -> F.Column:
        return F.struct(
            F.regexp_extract(b, _TITLE_IN, 1).alias("title"),
            F.regexp_extract(b, _RSS_LINK_IN, 1).alias("rss_link"),
            F.regexp_extract(b, _ATOM_LINK_REL_HREF, 1).alias("a1"),
            F.regexp_extract(b, _ATOM_LINK_HREF_REL, 1).alias("a2"),
            F.regexp_extract(b, _ATOM_LINK_ANY, 1).alias("a3"),
            F.regexp_extract(b, _GUID_IN, 1).alias("guid"),
            F.regexp_extract(b, _ATOM_ID_IN, 1).alias("aid"),
            F.regexp_extract(b, _PUBDATE_IN, 1).alias("pubdate"),
            F.regexp_extract(b, _PUBLISHED_IN, 1).alias("pub"),
            F.regexp_extract(b, _UPDATED_IN, 1).alias("upd"),
        )

    out = feeds.select(
        *[F.col(c) for c in id_cols],
        F.when(atom, F.lit("atom")).otherwise(F.lit("rss")).alias("feed_type"),
        F.posexplode(F.transform(blocks, _fields)).alias("entry_idx", "_e"),
    )
    e = F.col("_e")
    is_atom = F.col("feed_type") == "atom"
    link = F.when(
        is_atom, _first_nonempty(e.a1, e.a2, e.a3)
    ).otherwise(_nonempty(e.rss_link))
    return out.select(
        *id_cols,
        "entry_idx",
        _nonempty(_xml_unescape(e.title)).alias("title"),
        _xml_unescape(link).alias("link"),
        F.when(is_atom, _nonempty(e.aid)).otherwise(_nonempty(e.guid)).alias("eid"),
        F.when(is_atom, _first_nonempty(e.pub, e.upd))
        .otherwise(_nonempty(e.pubdate))
        .alias("published"),
        "feed_type",
    )


# HTML autodiscovery: <link rel="alternate" type="application/rss+xml"
# href=...> in either attribute order, quoted or unquoted href
_DISCOVER = (
    r'(?is)<link\s[^>]*(?:rel\s*=\s*["\']?alternate["\']?[^>]*'
    r'type\s*=\s*["\']?application/(?:rss|atom)\+xml["\']?'
    r'|type\s*=\s*["\']?application/(?:rss|atom)\+xml["\']?[^>]*'
    r'rel\s*=\s*["\']?alternate["\']?)[^>]*>'
)
_HREF = r'(?is)href\s*=\s*(?:"([^"]*)"|\'([^\']*)\'|([^\s"\'>]+))'


def discover_feed_links(
    pages: DataFrame, body_col: str = "resp_body", id_cols: tuple = ("seq",)
) -> DataFrame:
    """Feed autodiscovery over HTML pages: one row per advertised feed
    ``(*id_cols, feed_idx, feed_url)`` from ``<link rel="alternate"
    type="application/rss+xml|atom+xml">`` tags, in document order.
    Map-only Catalyst (tag regexp + href extraction); resolve relative
    hrefs against the page URL with functions.urls.resolve_url."""
    tags = F.regexp_extract_all(F.col(body_col), F.lit(_DISCOVER), F.lit(0))
    href = lambda t: _first_nonempty(  # noqa: E731 — transform lambda
        F.regexp_extract(t, _HREF, 1),
        F.regexp_extract(t, _HREF, 2),
        F.regexp_extract(t, _HREF, 3),
    )
    out = pages.select(
        *[F.col(c) for c in id_cols],
        F.posexplode(F.transform(tags, href)).alias("feed_idx", "_h"),
    )
    return out.where(F.col("_h").isNotNull()).select(
        *id_cols, "feed_idx", _xml_unescape(F.col("_h")).alias("feed_url")
    )
