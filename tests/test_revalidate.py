"""Crawler-level HTTP revalidation (CrawlOptions.revalidate): a recrawl
sends stored validators (If-None-Match / If-Modified-Since); unchanged
pages answer 304 — no body transfer, no re-parse, no new document row —
while changed pages refetch in full. The recrawl-bandwidth analog of the
WARC revisit sink (sinks/warc.py): at the 10^10-URL design point a TTL
recrawl re-reads the whole corpus, and validators make unchanged pages
cost ~200 bytes instead of body + parse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sinew_spark.crawl import Crawler, CrawlOptions
from sinew_spark.sources.fetch import FixtureFetcher

URLS = [f"http://site{i}.test/page" for i in range(8)]
CHANGED = URLS[3]


@pytest.fixture
def first_crawl(spark, tmp_path):
    wd = str(tmp_path / "crawl")
    c = Crawler(spark, wd, FixtureFetcher(seed=42), CrawlOptions(retries=0))
    c.seed(URLS)
    c.run_round()
    return wd


def test_recrawl_revalidates_unchanged_pages(spark, first_crawl, tmp_path):
    wd = first_crawl
    # the first crawl stored validators (fixture ETag = md5(body))
    c1_fetched = Crawler(
        spark, wd, FixtureFetcher(seed=42), CrawlOptions()
    ).fetched_t.read().toPandas()
    assert c1_fetched["etag"].notna().all()
    assert (c1_fetched["status"] == 200).all()

    # second crawl: one page's content changed at the origin
    fetcher2 = FixtureFetcher(
        seed=42, extra_pages={CHANGED: "<html><body>NEW CONTENT</body></html>"}
    )
    c2 = Crawler(
        spark, wd, fetcher2, CrawlOptions(retries=0, force=True, revalidate=True)
    )
    c2.seed(URLS)
    stats = c2.run_round()
    assert stats["selected"] == len(URLS)
    assert stats["not_modified"] == len(URLS) - 1

    rnd2 = c2.fetched_t.read().where(F.col("round") == stats["round"]).toPandas()
    rnd2 = rnd2.set_index("canonical_url")
    changed_key = [u for u in rnd2.index if CHANGED in u]
    assert len(changed_key) == 1
    assert rnd2.loc[changed_key[0], "status"] == 200
    assert "NEW CONTENT" in rnd2.loc[changed_key[0], "resp_body"]
    unchanged = rnd2.drop(index=changed_key)
    assert (unchanged["status"] == 304).all()
    assert unchanged["resp_body"].isna().all()  # no body re-transferred
    # 304 rows still carry the validator for the NEXT revalidation
    assert unchanged["etag"].notna().all()


def test_304_rows_excluded_from_documents_view(spark, first_crawl):
    wd = first_crawl
    c2 = Crawler(
        spark, wd, FixtureFetcher(seed=42),
        CrawlOptions(retries=0, force=True, revalidate=True),
    )
    c2.seed(URLS)
    stats = c2.run_round()
    assert stats["not_modified"] == len(URLS)  # nothing changed
    # documents view: a 304 is not a new document — round-2 delta is empty
    docs2 = c2.documents_t.read().where(F.col("round") == stats["round"])
    assert docs2.count() == 0
    # but seen was refreshed (TTL clock restarts, page confirmed alive)
    seen2 = c2.seen_t.read().where(F.col("round") == stats["round"])
    assert seen2.count() == len(URLS)
    assert seen2.where(F.col("status") == 304).count() == len(URLS)


def test_ttl_recrawl_uses_validators(spark, first_crawl):
    """expires=0: every seen page re-offers; with revalidate they all 304."""
    wd = first_crawl
    c2 = Crawler(
        spark, wd, FixtureFetcher(seed=42),
        CrawlOptions(retries=0, expires=0.0, revalidate=True),
    )
    c2.seed(URLS)
    stats = c2.run_round()
    assert stats["selected"] == len(URLS)
    assert stats["not_modified"] == len(URLS)


def test_revalidate_off_by_default(spark, first_crawl):
    """Without the option nothing changes: a forced recrawl re-transfers
    full bodies (no conditional headers sent)."""
    wd = first_crawl
    c2 = Crawler(
        spark, wd, FixtureFetcher(seed=42), CrawlOptions(retries=0, force=True)
    )
    c2.seed(URLS)
    stats = c2.run_round()
    assert stats["not_modified"] == 0
    rnd2 = c2.fetched_t.read().where(F.col("round") == stats["round"])
    assert rnd2.where(F.col("status") == 200).count() == len(URLS)


def test_latest_validators_per_field_non_null(spark):
    """RFC 9110 §15.4.5: a 304 may re-send only one validator — the other
    stored one stays valid. latest_validators must keep the latest
    NON-NULL value per field, not the latest row's (etag, lm) pair."""
    from sinew_spark.crawl import latest_validators

    rows = [
        # key 1: full pair at t=10, then a 304 that re-sent only LM at t=20
        (1, '"e1"', "Mon, 01 Jan 2024 00:00:00 GMT", 10.0),
        (1, None, "Tue, 02 Jan 2024 00:00:00 GMT", 20.0),
        # key 2: etag-only origin
        (2, '"e2"', None, 5.0),
        # key 3: no validators at all -> filtered out entirely
        (3, None, None, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "key long, etag string, last_modified string, fetched_at double"
    )
    got = {r.key: (r.etag, r.last_modified) for r in latest_validators(df).collect()}
    assert got == {
        1: ('"e1"', "Tue, 02 Jan 2024 00:00:00 GMT"),  # etag survives the LM-only 304
        2: ('"e2"', None),
    }


def test_synthetic_epoch_churn_deterministic():
    """FixtureFetcher.synthetic_epoch: a stable ~frac of URLs change body
    between epoch 0 and epoch 1; the rest are byte-identical (the recrawl
    bench's deterministic origin churn)."""
    f0 = FixtureFetcher(seed=42, synthetic=True)
    f1 = FixtureFetcher(seed=42, synthetic=True, synthetic_epoch=1,
                        synthetic_change_frac=0.1)
    urls = [f"http://h{i % 50}.test/p/{i}" for i in range(2000)]
    changed = [
        u for u in urls
        if f0.resolve(u, "GET", "", 0)[2] != f1.resolve(u, "GET", "", 0)[2]
    ]
    assert 120 < len(changed) < 280  # ~10% +/- sampling noise
    # determinism: same fetcher params -> same changed set
    f1b = FixtureFetcher(seed=42, synthetic=True, synthetic_epoch=1,
                         synthetic_change_frac=0.1)
    changed_b = [
        u for u in urls
        if f0.resolve(u, "GET", "", 0)[2] != f1b.resolve(u, "GET", "", 0)[2]
    ]
    assert changed == changed_b


def test_validator_refresh_uses_latest(spark, tmp_path):
    """After content changes once (round 2 refetch), round 3 revalidates
    against the NEW etag and 304s again — max_by(fetched_at) picks the
    latest stored validator, not the first."""
    wd = str(tmp_path / "crawl")
    c1 = Crawler(spark, wd, FixtureFetcher(seed=42), CrawlOptions(retries=0))
    c1.seed(URLS)
    c1.run_round()

    new_body = "<html><body>V2</body></html>"
    f2 = FixtureFetcher(seed=42, extra_pages={CHANGED: new_body})
    c2 = Crawler(spark, wd, f2, CrawlOptions(retries=0, force=True, revalidate=True))
    c2.seed(URLS)
    s2 = c2.run_round()
    assert s2["not_modified"] == len(URLS) - 1

    # round 3 against the SAME v2 content: everything 304s now
    c3 = Crawler(spark, wd, f2, CrawlOptions(retries=0, force=True, revalidate=True))
    c3.seed(URLS)
    s3 = c3.run_round()
    assert s3["not_modified"] == len(URLS)
