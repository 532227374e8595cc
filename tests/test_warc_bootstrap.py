"""Bootstrap a crawler from a WARC archive (sinks/warc.py
bootstrap_crawl_from_warc): archived pages count as fetched — the
exactly-once guarantee extends across the archive boundary — and their
span documents serve from the documents view without refetching."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sinew_spark.crawl import Crawler, CrawlOptions
from sinew_spark.sinks.warc import bootstrap_crawl_from_warc, write_warc
from sinew_spark.sources.fetch import FixtureFetcher

URLS = [f"http://site{i % 4}.test/p/{i}" for i in range(10)]


@pytest.fixture
def archive(spark, tmp_path):
    """Crawl 10 pages, export the fetched table as a WARC archive."""
    c = Crawler(spark, str(tmp_path / "a"), FixtureFetcher(seed=42),
                CrawlOptions(retries=0))
    c.seed(URLS)
    c.run_round()
    src = (
        c.fetched_t.read()
        .select(
            F.col("canonical_url").alias("url"),
            F.col("resp_body").alias("body"),
            F.lit("2024-01-01T00:00:00Z").alias("date"),
            "status",
            "content_type",
        )
        .repartition(2, "url")
        .sortWithinPartitions("url")
    )
    out = str(tmp_path / "warc")
    write_warc(src, out).count()
    return out


def test_bootstrap_extends_exactly_once(spark, archive, tmp_path):
    b = Crawler(spark, str(tmp_path / "b"), FixtureFetcher(seed=42),
                CrawlOptions(retries=0))
    n = bootstrap_crawl_from_warc(b, archive)
    assert n == 10
    # archived pages answer cache probes
    assert b.cached(URLS[0])
    st = b.status(URLS[3])
    assert st["status"] == 200  # a hit returns the archived HTTP status
    # a seed list overlapping the archive fetches only the NEW urls
    extra = [f"http://new{i}.test/x/{i}" for i in range(5)]
    b.seed(URLS + extra)
    stats = b.run_round()
    assert stats["selected"] == 5
    fetched_urls = {
        r.url for r in b.seen_t.read().where(F.col("round") >= 0).select("url").collect()
    }
    assert fetched_urls == set(extra)


def test_bootstrap_serves_documents(spark, archive, tmp_path):
    b = Crawler(spark, str(tmp_path / "b"), FixtureFetcher(seed=42),
                CrawlOptions(retries=0))
    bootstrap_crawl_from_warc(b, archive)
    docs = b.documents_t.read()
    assert docs.count() == 10
    assert docs.where(F.col("round") == -1).count() == 10
    # spans parsed through the same extract path as a live crawl: the
    # fixture's JSON-echo pages yield one text span each
    one = docs.where(F.size("spans") > 0).count()
    assert one == 10


def test_bootstrap_skips_binary_records(spark, tmp_path):
    """Non-textual records (image/PDF) are skipped entirely — neither
    imported (string resp_body would mojibake them) nor marked seen (a
    live crawl can still fetch them)."""
    rows = [
        ("http://a.test/page", "hello", "2024-01-01T00:00:00Z", 200, "text/html"),
        ("http://a.test/pic.png", "\x89PNG\x00fake", "2024-01-01T00:00:00Z", 200,
         "image/png"),
        ("http://a.test/doc.pdf", "%PDF-fake", "2024-01-01T00:00:00Z", 200,
         "application/pdf"),
    ]
    src = spark.createDataFrame(
        rows, "url string, body string, date string, status int, content_type string"
    ).repartition(1)
    out = str(tmp_path / "warc")
    write_warc(src, out).count()
    b = Crawler(spark, str(tmp_path / "b"), FixtureFetcher(seed=42),
                CrawlOptions(retries=0))
    n = bootstrap_crawl_from_warc(b, out)
    assert n == 1
    assert b.cached("http://a.test/page")
    assert not b.cached("http://a.test/pic.png")  # still live-fetchable
    # gate off: everything imports
    c = Crawler(spark, str(tmp_path / "c"), FixtureFetcher(seed=42),
                CrawlOptions(retries=0))
    assert bootstrap_crawl_from_warc(c, out, content_types=()) == 3


def test_bootstrap_dedups_archive_duplicates(spark, tmp_path):
    """Incremental archives re-store changed pages; the latest WARC-Date
    wins the import."""
    rows = [
        ("http://a.test/p", "old body", "2024-01-01T00:00:00Z", 200, "text/plain"),
        ("http://a.test/p", "new body", "2024-02-01T00:00:00Z", 200, "text/plain"),
        ("http://b.test/q", "only", "2024-01-01T00:00:00Z", 200, "text/plain"),
    ]
    src = spark.createDataFrame(
        rows, "url string, body string, date string, status int, content_type string"
    ).repartition(1)
    out = str(tmp_path / "warc")
    write_warc(src, out).count()
    b = Crawler(spark, str(tmp_path / "b"), FixtureFetcher(seed=42),
                CrawlOptions(retries=0))
    n = bootstrap_crawl_from_warc(b, out)
    assert n == 2
    body = (
        b.fetched_t.read()
        .where(F.col("canonical_url") == "http://a.test/p")
        .select("resp_body")
        .collect()[0][0]
    )
    assert body == "new body"
