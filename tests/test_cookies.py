"""C11 cookie sessions: jar threads through redirects within a round and
persists per host across rounds via the host_state table (the distributed
generalization of the reference's process-wide faraday cookie_jar,
/root/reference/lib/sinew/base.rb:204)."""

import json

from sinew_spark.crawl import Crawler, CrawlOptions
from sinew_spark.sources.fetch import FixtureFetcher


def _body(c, url):
    df = c.fetched_t.read()
    rows = df.where(df.canonical_url == url).collect()
    assert len(rows) == 1, rows
    return rows[0].resp_body


def test_cookie_set_and_echo_same_round(spark, tmpdir_path):
    """/cookies/set redirects to /cookies which must see the jar — the jar
    threads through the redirect hop inside one request."""
    c = Crawler(spark, tmpdir_path, FixtureFetcher(seed=1), CrawlOptions(rate_limit=0, retries=0))
    c.seed(["http://a.test/cookies/set?tok=abc"])
    c.run(1)
    fetched = c.fetched_t.read().collect()
    assert len(fetched) == 1
    echo = json.loads(fetched[0].resp_body)
    assert echo["cookies"] == {"tok": "abc"}
    # jar recorded on the row and in host_state
    assert json.loads(fetched[0].cookies) == {"tok": "abc"}
    hs = {r.host: json.loads(r.cookies) for r in c.host_state_t.read().collect()}
    assert hs == {"a.test": {"tok": "abc"}}


def test_cookie_persists_across_rounds(spark, tmpdir_path):
    """Round 0 sets the cookie; a LATER round's /cookies echo on the same
    host sees it via host_state (state survives between rounds + restarts)."""
    f = FixtureFetcher(seed=2)
    c = Crawler(spark, tmpdir_path, f, CrawlOptions(rate_limit=0, retries=0))
    c.seed(["http://b.test/cookies/set?sid=42"])
    c.run(1)
    # fresh Crawler over the same workdir (restart) — host_state persisted
    # distinct probe URL — the bare /cookies redirect target is already
    # seen (each hop/final is cached as its own entry, base.rb:209-211)
    c2 = Crawler(spark, tmpdir_path, f, CrawlOptions(rate_limit=0, retries=0))
    c2.seed(["http://b.test/cookies?probe=2"])
    c2.run(1)
    echo = json.loads(_body(c2, "http://b.test/cookies?probe=2"))
    assert echo["cookies"] == {"sid": "42"}


def test_cookie_jar_is_per_host(spark, tmpdir_path):
    """Host jars are independent: a.test's cookie never leaks to b.test."""
    f = FixtureFetcher(seed=3)
    c = Crawler(spark, tmpdir_path, f, CrawlOptions(rate_limit=0, retries=0))
    c.seed(["http://a.test/cookies/set?who=a"])
    c.run(1)
    c2 = Crawler(spark, tmpdir_path, f, CrawlOptions(rate_limit=0, retries=0))
    c2.seed(["http://a.test/cookies?p=1", "http://b.test/cookies?p=1"])
    c2.run(1)
    assert json.loads(_body(c2, "http://a.test/cookies?p=1"))["cookies"] == {"who": "a"}
    assert json.loads(_body(c2, "http://b.test/cookies?p=1"))["cookies"] == {}


def test_cookie_paced_path(spark, tmpdir_path):
    """rate_limit > 0 takes the per-host applyInPandas path; the jar threads
    across sequential requests within the host group."""
    f = FixtureFetcher(seed=4)
    c = Crawler(
        spark, tmpdir_path, f, CrawlOptions(rate_limit=0.01, retries=0)
    )
    c.seed(["http://p.test/cookies/set?k=v", "http://p.test/cookies?probe=1"])
    c.run(1)
    echo = json.loads(_body(c, "http://p.test/cookies?probe=1"))
    assert echo["cookies"] == {"k": "v"}
