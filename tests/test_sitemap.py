"""Sitemap ingestion: <loc> extraction, entity unescape, index detection,
and end-to-end frontier seeding through the crawler."""

from pyspark.sql import functions as F

from sinew_spark.sources.sitemap import is_sitemap_index, sitemap_locs

URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>http://ex.test/a</loc><lastmod>2026-01-01</lastmod></url>"
    "<url><loc>\n  http://ex.test/b?x=1&amp;y=2\n</loc></url>"
    "<url><loc>http://ex.test/&quot;q&quot;&amp;lt;</loc></url>"
    "</urlset>"
)
INDEX = (
    '<?xml version="1.0"?><sitemapindex>'
    "<sitemap><loc>http://ex.test/sitemap1.xml</loc></sitemap>"
    "<sitemap><loc>http://ex.test/sitemap2.xml</loc></sitemap>"
    "</sitemapindex>"
)


def test_sitemap_locs_order_trim_unescape(spark):
    df = spark.createDataFrame([(1, URLSET)], "seq long, resp_body string")
    rows = sitemap_locs(df).orderBy("loc_idx").collect()
    assert [(r.loc_idx, r.loc) for r in rows] == [
        (0, "http://ex.test/a"),
        (1, "http://ex.test/b?x=1&y=2"),
        # &quot; -> ", &amp;lt; -> literal &lt; (double-escape decodes once)
        (2, 'http://ex.test/"q"&lt;'),
    ]


def test_sitemap_index_detection(spark):
    df = spark.createDataFrame(
        [(1, URLSET), (2, INDEX)], "seq long, resp_body string"
    )
    got = df.select("seq", is_sitemap_index(F.col("resp_body")).alias("idx")).collect()
    assert {r.seq: r.idx for r in got} == {1: False, 2: True}


def test_empty_and_locless_bodies(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "<urlset></urlset>"), (3, None)],
        "seq long, resp_body string",
    )
    assert sitemap_locs(df).count() == 0


def test_seed_frontier_from_sitemap(spark, tmpdir_path):
    """End-to-end: crawl the sitemap URL, extract locs from the fetched
    body, seed them, run a round — every sitemap URL gets fetched exactly
    once."""
    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.sources.fetch import FixtureFetcher

    sm_url = "http://ex.test/sitemap.xml"
    pages = {sm_url: (200, "application/xml", URLSET, None)}
    for p in ("a", "b?x=1&y=2", '"q"&lt;'):
        pages[f"http://ex.test/{p}"] = (200, "text/html", f"<p>page {p}</p>", None)
    c = Crawler(
        spark, str(tmpdir_path), FixtureFetcher(extra_pages=pages),
        CrawlOptions(rate_limit=0.0, retries=0, max_rounds=1),
    )
    c.seed([sm_url])
    c.run()
    fetched = c.fetched_t.read().where(F.col("canonical_url").contains("sitemap"))
    locs = sitemap_locs(fetched, body_col="resp_body", id_cols=("seq",))
    urls = [r.loc for r in locs.orderBy("loc_idx").collect()]
    assert len(urls) == 3
    c.seed(urls)
    c.run()
    seen = {r.url for r in c.seen_t.read().collect()}
    assert "http://ex.test/a" in seen
    assert any("b?x=1" in u for u in seen)
    assert c.seen_t.read().count() == 4  # sitemap + 3 pages, exactly once


def test_cdata_case_and_namespace_variants(spark):
    """Sitemap-spec permitted forms: CDATA-wrapped locs, uppercase tags,
    namespace-prefixed tags and index elements."""
    body = (
        '<?xml version="1.0"?><sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sm:sitemap><sm:loc><![CDATA[http://ex.test/s1.xml?a=1&b=2]]></sm:loc></sm:sitemap>"
        "<sm:sitemap><LOC>HTTP://EX.TEST/S2.XML</LOC></sm:sitemap>"
        "</sm:sitemapindex>"
    )
    df = spark.createDataFrame([(0, body)], "seq long, resp_body string")
    locs = [r.loc for r in sitemap_locs(df).orderBy("loc_idx").collect()]
    assert locs == ["http://ex.test/s1.xml?a=1&b=2", "HTTP://EX.TEST/S2.XML"]
    flags = df.select(is_sitemap_index(F.col("resp_body")).alias("ix")).collect()
    assert flags[0].ix is True


def test_expand_sitemap_frontier_index_to_pages(spark, tmpdir_path):
    """Index -> two urlsets -> page URLs, expanded level-by-level through
    the crawler (one round per level, exactly-once on sitemaps), emerging
    in nested sitemap order, seed_df-ready."""
    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.sources.fetch import FixtureFetcher
    from sinew_spark.sources.sitemap import expand_sitemap_frontier

    def urlset(*urls):
        return (
            "<urlset>" + "".join(f"<url><loc>{u}</loc></url>" for u in urls) + "</urlset>"
        )

    pages = {
        "http://ex.test/sitemap.xml": (
            200, "application/xml",
            "<sitemapindex><sitemap><loc>http://ex.test/s1.xml</loc></sitemap>"
            "<sitemap><loc>http://ex.test/s2.xml</loc></sitemap></sitemapindex>",
            None,
        ),
        "http://ex.test/s1.xml": (
            200, "application/xml", urlset("http://ex.test/p1", "http://ex.test/p2"), None,
        ),
        "http://ex.test/s2.xml": (
            200, "application/xml", urlset("http://ex.test/p3"), None,
        ),
    }
    c = Crawler(
        spark, str(tmpdir_path), FixtureFetcher(extra_pages=pages),
        CrawlOptions(rate_limit=0.0, retries=0),
    )
    out = expand_sitemap_frontier(c, ["http://ex.test/sitemap.xml"])
    rows = out.orderBy("seq").collect()
    assert [r.url for r in rows] == [
        "http://ex.test/p1", "http://ex.test/p2", "http://ex.test/p3",
    ]
    # both sitemap levels were fetched exactly once each
    fetched = c.fetched_t.read().select("canonical_url").collect()
    assert sorted(r.canonical_url for r in fetched) == [
        "http://ex.test/s1.xml", "http://ex.test/s2.xml", "http://ex.test/sitemap.xml",
    ]


def test_sitemap_entries_lastmod_optional(spark):
    """<url> blocks parse to (loc, lastmod) with lastmod NULL when
    absent; CDATA, namespace prefixes, and entity escapes still apply."""
    from sinew_spark.sources.sitemap import sitemap_entries

    body = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://e.test/a&amp;x</loc><lastmod>2024-02-01</lastmod></url>"
        "<url><loc><![CDATA[http://e.test/b]]></loc></url>"
        "<sm:url><sm:loc>http://e.test/c</sm:loc>"
        "<sm:lastmod>2024-03-05T10:00:00+00:00</sm:lastmod></sm:url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(0, body)], "seq long, resp_body string")
    rows = sitemap_entries(df).orderBy("loc_idx").collect()
    assert [(r.loc, r.lastmod) for r in rows] == [
        ("http://e.test/a&x", "2024-02-01"),
        ("http://e.test/b", None),
        ("http://e.test/c", "2024-03-05T10:00:00+00:00"),
    ]


def test_sitemap_stale_gate(spark):
    """new / unknown / modified refetch; provably-unchanged dropped;
    same-day lastmod refetches (conservative)."""
    from sinew_spark.sources.sitemap import sitemap_stale

    day = 86400.0
    entries = spark.createDataFrame(
        [
            ("http://e.test/new", "2024-01-01"),
            ("http://e.test/nolm", None),
            ("http://e.test/changed", "2024-01-10"),
            ("http://e.test/sameday", "2024-01-05"),
            ("http://e.test/unchanged", "2024-01-02"),
        ],
        "loc string, lastmod string",
    )
    seen = spark.createDataFrame(
        [
            ("http://e.test/nolm", 19700 * day),
            ("http://e.test/changed", 19725 * day),   # 2024-01-03
            ("http://e.test/sameday", 19727 * day),   # 2024-01-05
            ("http://e.test/unchanged", 19730 * day), # 2024-01-08
        ],
        "url string, fetched_at double",
    )
    out = {r.loc: r.reason for r in sitemap_stale(entries, seen).collect()}
    assert out == {
        "http://e.test/new": "new",
        "http://e.test/nolm": "unknown",
        "http://e.test/changed": "modified",
        "http://e.test/sameday": "modified",
    }


def test_sitemap_stale_plan_shape(spark):
    """Seen side pre-aggregates (1 shuffle) then joins; entries side never
    shuffles more than the join requires (<=2 exchanges total, and the
    small seen side may broadcast instead)."""
    from sinew_spark.sources.sitemap import sitemap_stale

    entries = spark.createDataFrame([("u", "2024-01-01")], "loc string, lastmod string")
    seen = spark.createDataFrame([("u", 0.0)], "url string, fetched_at double")
    plan = (
        sitemap_stale(entries, seen)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2


def test_sitemap_stale_malformed_lastmod_is_unknown(spark):
    """A malformed <lastmod> (common in real sitemaps) must neither abort
    the job under Spark 4 ANSI mode (try_to_date, ADVICE r4) nor be
    trusted: it falls into the conservative 'unknown' refetch bucket."""
    from sinew_spark.sources.sitemap import sitemap_stale

    day = 86400.0
    entries = spark.createDataFrame(
        [
            ("http://e.test/bad", "TBD-soon"),
            ("http://e.test/also-bad", "2024-13-45"),
            ("http://e.test/good-old", "2024-01-02"),
        ],
        "loc string, lastmod string",
    )
    seen = spark.createDataFrame(
        [
            ("http://e.test/bad", 19730 * day),
            ("http://e.test/also-bad", 19730 * day),
            ("http://e.test/good-old", 19730 * day),  # 2024-01-08: unchanged
        ],
        "url string, fetched_at double",
    )
    out = {r.loc: r.reason for r in sitemap_stale(entries, seen).collect()}
    assert out == {
        "http://e.test/bad": "unknown",
        "http://e.test/also-bad": "unknown",
    }


def test_extension_locs_not_extracted_as_pages(spark):
    """A Google image-sitemap <image:loc> (or video:/news:) must not be
    extracted as a page <loc> — media URLs would get seeded and crawled
    as pages, and document-order seqs for real pages would shift."""
    from sinew_spark.sources.sitemap import sitemap_locs

    body = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9" '
        'xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">'
        "<url><loc>http://s.test/page1</loc>"
        "<image:image><image:loc>http://s.test/photo.jpg</image:loc></image:image>"
        "</url>"
        "<url><sm:loc>http://s.test/page2</sm:loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(1, body)], "seq long, resp_body string")
    locs = [r.loc for r in sitemap_locs(df).orderBy("loc_idx").collect()]
    assert locs == ["http://s.test/page1", "http://s.test/page2"]


def test_sitemap_stale_canonicalized_join(spark):
    """The seen table stores CANONICAL urls; a raw loc the canonicalizer
    rewrites must still match (else every poll refetches it as 'new')."""
    from pyspark.sql import functions as F

    from sinew_spark.sources.sitemap import sitemap_stale

    entries = spark.createDataFrame(
        [("http://s.test/p?b=2&a=1", "2020-01-01")], "loc string, lastmod string"
    )
    seen = spark.createDataFrame(
        [("http://s.test/p?a=1&b=2", 2_000_000_000.0)], "url string, fetched_at double"
    )

    def canon(c):  # stand-in for crawler.canonicalize: sort query params
        return F.concat(
            F.substring_index(c, "?", 1),
            F.lit("?"),
            F.array_join(F.array_sort(F.split(F.substring_index(c, "?", -1), "&")), "&"),
        )

    # raw join: no match -> wrongly 'new'; canonical join: provably
    # unchanged (old lastmod vs recent fetch) -> dropped entirely
    raw = sitemap_stale(entries, seen).collect()
    assert len(raw) == 1 and raw[0].reason == "new"
    assert sitemap_stale(entries, seen, canonicalize=canon).count() == 0
