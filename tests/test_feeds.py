"""RSS/Atom feed extraction (sources/feeds.py) — parse fidelity pins.

Reference scope: sinew recipes crawl feeds as plain XML by hand
(README.md idiom space); this is the engine's first-class feed surface.
"""
from pyspark.sql import functions as F

from sinew_spark.sources.feeds import (
    discover_feed_links,
    feed_entries,
    is_atom_feed,
    is_rss_feed,
)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Example Blog</title><link>https://ex.com/</link>
<item>
  <title>Plain &amp; simple</title>
  <link>https://ex.com/a?x=1&amp;y=2</link>
  <guid isPermaLink="false">tag:ex,1</guid>
  <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
</item>
<item>
  <title><![CDATA[CDATA & raw <b>]]></title>
  <link>https://ex.com/b</link>
</item>
<item><description>no title, link, guid or date</description></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>Example Feed</title>
<link rel="self" href="https://ex.com/feed.xml"/>
<entry>
  <title type="text">First</title>
  <link rel="alternate" href="https://ex.com/1?a=1&amp;b=2"/>
  <id>tag:ex,e1</id>
  <published>2024-01-01T00:00:00Z</published>
  <updated>2024-02-01T00:00:00Z</updated>
</entry>
<entry>
  <title>Second</title>
  <link href="https://ex.com/2" rel="alternate"/>
  <id>tag:ex,e2</id>
  <updated>2024-02-02T00:00:00Z</updated>
</entry>
<entry>
  <title>Third</title>
  <link href="https://ex.com/3"/>
</entry>
</feed>"""

HTML_DISCOVERY = """<html><head>
<link rel="alternate" type="application/rss+xml" href="https://ex.com/rss.xml">
<link type="application/atom+xml" rel="alternate" href='/atom.xml'>
<link rel="alternate" type="application/rss+xml" href=/bare.xml>
<link rel="stylesheet" type="text/css" href="/nope.css">
<link rel="alternate" type="text/html" href="/nope.html">
</head><body></body></html>"""


def _df(spark, *bodies):
    return spark.createDataFrame(
        [(i, b) for i, b in enumerate(bodies)], "seq long, resp_body string"
    )


def test_feed_type_detection(spark):
    df = _df(spark, RSS, ATOM, HTML_DISCOVERY).select(
        "seq",
        is_rss_feed(F.col("resp_body")).alias("r"),
        is_atom_feed(F.col("resp_body")).alias("a"),
    )
    got = {x.seq: (x.r, x.a) for x in df.collect()}
    assert got == {0: (True, False), 1: (False, True), 2: (False, False)}


def test_rss_items(spark):
    rows = feed_entries(_df(spark, RSS)).orderBy("entry_idx").collect()
    assert len(rows) == 3
    r0, r1, r2 = rows
    assert r0.title == "Plain & simple"  # entity-unescaped
    assert r0.link == "https://ex.com/a?x=1&y=2"
    assert r0.eid == "tag:ex,1"
    assert r0.published == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert r0.feed_type == "rss"
    assert r1.title == "CDATA & raw <b>"  # CDATA body untouched
    assert r1.eid is None and r1.published is None
    assert (r2.title, r2.link, r2.eid, r2.published) == (None, None, None, None)


def test_atom_entries(spark):
    rows = feed_entries(_df(spark, ATOM)).orderBy("entry_idx").collect()
    assert len(rows) == 3
    r0, r1, r2 = rows
    assert r0.link == "https://ex.com/1?a=1&b=2"  # rel-then-href
    assert r0.published == "2024-01-01T00:00:00Z"  # published beats updated
    assert r1.link == "https://ex.com/2"  # href-then-rel
    assert r1.published == "2024-02-02T00:00:00Z"  # updated fallback
    assert r2.link == "https://ex.com/3"  # bare link = implied alternate
    assert r2.eid is None and r2.published is None
    assert all(r.feed_type == "atom" for r in rows)
    assert (r0.eid, r1.eid) == ("tag:ex,e1", "tag:ex,e2")


def test_entry_order_is_document_order(spark):
    rows = feed_entries(_df(spark, RSS, ATOM)).collect()
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r.seq, []).append(r.entry_idx)
    assert by_seq == {0: [0, 1, 2], 1: [0, 1, 2]}


def test_autodiscovery(spark):
    rows = (
        discover_feed_links(_df(spark, HTML_DISCOVERY))
        .orderBy("feed_idx")
        .collect()
    )
    assert [r.feed_url for r in rows] == [
        "https://ex.com/rss.xml",  # double-quoted, rel-first
        "/atom.xml",  # single-quoted, type-first
        "/bare.xml",  # unquoted href
    ]


def test_non_feed_document_yields_no_entries(spark):
    assert feed_entries(_df(spark, HTML_DISCOVERY)).count() == 0


def test_atom_single_quotes_and_rel_fallback(spark):
    """Single-quoted attributes are legal XML; and the any-link fallback
    must only fire for REL-LESS links (implied alternate) — never grab a
    rel='self'/'enclosure' href as the entry page."""
    from sinew_spark.sources.feeds import feed_entries

    body = (
        "<feed xmlns='http://www.w3.org/2005/Atom'>"
        "<entry><title>sq</title>"
        "<link rel='alternate' href='http://e.test/sq'/>"
        "<id>tag:1</id><updated>2024-01-01</updated></entry>"
        "<entry><title>selfonly</title>"
        '<link rel="self" href="http://e.test/feed.xml"/>'
        '<link rel="enclosure" href="http://e.test/a.mp3"/>'
        "<id>tag:2</id><updated>2024-01-02</updated></entry>"
        "<entry><title>bare</title>"
        "<link href='http://e.test/bare'/>"
        "<id>tag:3</id><updated>2024-01-03</updated></entry>"
        "</feed>"
    )
    df = spark.createDataFrame(
        [("http://e.test/feed.xml", body)], "url string, resp_body string"
    )
    out = {r.title: r.link for r in feed_entries(df, id_cols=("url",)).collect()}
    assert out["sq"] == "http://e.test/sq"          # single-quoted alternate
    assert out["bare"] == "http://e.test/bare"      # rel-less implied alternate
    assert not out["selfonly"]                      # no alternate -> no page URL
