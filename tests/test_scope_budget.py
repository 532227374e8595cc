"""Crawl scoping (url_allow/url_deny regex lists) and lifetime per-host
fetch budgets (host_budget) — both zero-shuffle frontier guards:
apply_url_scope is a Catalyst rlike fold, the budget is an O(hosts)
broadcast ledger folded into the per-host cap window."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sinew_spark.crawl import Crawler, CrawlOptions
from sinew_spark.operators.frontier import apply_url_scope, per_host_cap
from sinew_spark.sources.fetch import FixtureFetcher


def test_apply_url_scope_unit(spark):
    df = spark.createDataFrame(
        [(f"http://h.test/{p}",) for p in
         ("docs/a", "docs/b", "login?next=1", "cart/3", "docs/c.pdf")],
        "canonical_url string",
    )
    kept = apply_url_scope(df, allow=(r"/docs/",), deny=(r"\.pdf$",))
    assert sorted(r.canonical_url for r in kept.collect()) == [
        "http://h.test/docs/a", "http://h.test/docs/b",
    ]
    # no allow list = allow everything, deny still applies
    kept2 = apply_url_scope(df, deny=(r"login", r"cart"))
    assert kept2.count() == 3
    # no filters = identity
    assert apply_url_scope(df).count() == 5


def test_per_host_cap_with_remaining(spark):
    rows = [
        (f"http://{h}.test/{i}", h + ".test", 0.0, i)
        for h in ("a", "b", "c") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "canonical_url string, host string, priority double, seq long")
    remaining = spark.createDataFrame(
        [("a.test", 2), ("b.test", 0)], "host string, remaining int"
    )
    # c.test absent from the ledger -> default_remaining (full budget)
    out = per_host_cap(df, 3, host_remaining=remaining, default_remaining=10)
    got = {h: n for h, n in out.groupBy("host").count().collect()}
    assert got == {"a.test": 2, "c.test": 3}  # b exhausted, a clipped, c per-round cap
    # budget-only (cap=None) first round: default_remaining limits
    out2 = per_host_cap(df, None, host_remaining=None, default_remaining=4)
    assert {h: n for h, n in out2.groupBy("host").count().collect()} == {
        "a.test": 4, "b.test": 4, "c.test": 4,
    }
    # neither cap nor budget: identity
    assert per_host_cap(df, None) is df


URLS = [f"http://site{i % 2}.test/p/{i}" for i in range(12)]


def test_url_deny_scopes_crawl(spark, tmp_path):
    c = Crawler(
        spark, str(tmp_path / "c"), FixtureFetcher(seed=42),
        CrawlOptions(retries=0, url_deny=(r"/p/(3|7|11)$",)),
    )
    c.seed(URLS)
    stats = c.run_round()
    assert stats["selected"] == 9
    seen = {r.url for r in c.seen_t.read().select("url").collect()}
    assert not any(u.endswith(("/p/3", "/p/7", "/p/11")) for u in seen)


def test_url_allow_scopes_links(spark, tmp_path):
    """follow_links + allow list: discovered links outside the scope never
    enter the frontier, so the crawl drains within scope."""
    pages = {
        "http://a.test/docs/start": (
            '<a href="/docs/next">in</a><a href="http://other.test/x">out</a>'
            '<a href="/blog/y">out2</a>'
        ),
        "http://a.test/docs/next": "<p>leaf</p>",
    }
    c = Crawler(
        spark, str(tmp_path / "c"), FixtureFetcher(seed=42, extra_pages=pages),
        CrawlOptions(retries=0, follow_links=True, max_rounds=4,
                     url_allow=(r"^http://a\.test/docs/",)),
    )
    c.seed(["http://a.test/docs/start"])
    c.run()
    seen = sorted(r.url for r in c.seen_t.read().select("url").collect())
    assert seen == ["http://a.test/docs/next", "http://a.test/docs/start"]
    assert c.frontier_t.read().count() == 0  # out-of-scope rows left the frontier


def test_host_budget_lifetime_cap(spark, tmp_path):
    """Budget 3/host across rounds: 12 URLs on 2 hosts fetch exactly 3
    each, the rest leave the frontier and the crawl drains."""
    c = Crawler(
        spark, str(tmp_path / "c"), FixtureFetcher(seed=42),
        CrawlOptions(retries=0, host_budget=3, max_rounds=5),
    )
    c.seed(URLS)
    out = c.run()
    fetched = c.seen_t.read()
    per_host = {
        r.host: r.n
        for r in fetched.withColumn(
            "host", F.regexp_extract("url", r"^http://([^/]+)", 1)
        ).groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_host == {"site0.test": 3, "site1.test": 3}
    assert out[-1]["done"] or c.frontier_t.read().count() == 0
    # selection is deterministic: lowest seq per host wins the budget
    seen = sorted(r.url for r in fetched.select("url").collect())
    assert seen == sorted(f"http://site{i % 2}.test/p/{i}" for i in range(6))


def test_host_budget_composes_with_per_round_cap(spark, tmp_path):
    """per_host_cap 2/round + budget 3 lifetime: rounds fetch 2 then 1."""
    c = Crawler(
        spark, str(tmp_path / "c"), FixtureFetcher(seed=42),
        CrawlOptions(retries=0, host_budget=3, per_host_cap=2, max_rounds=5),
    )
    c.seed(URLS)
    c.run()
    m = c.metrics_t.read().orderBy("round").toPandas()
    assert list(m["selected"][:2]) == [4, 2]  # 2 hosts x (2 then 1)
    assert c.seen_t.read().count() == 6


# --- adaptive throttling (auto_throttle) ---

def test_throttle_delays_unit(spark, tmp_path):
    """Hosts with 429/5xx/errors last round get the throttle delay; robots
    Crawl-delay asks compose via per-host max."""
    c = Crawler(
        spark, str(tmp_path / "c"),
        FixtureFetcher(seed=42, flaky={"err.test": 999}),
        CrawlOptions(retries=0, auto_throttle=0.5),
    )
    # round 0: err.test always 500s; ok.test fine
    c.seed(["http://err.test/a", "http://err.test/b", "http://ok.test/a"])
    c.run_round()
    d = c._throttle_delays(1).toPandas().set_index("host")
    assert list(d.index) == ["err.test"] and d.loc["err.test", "crawl_delay"] == 0.5
    # robots ask composes: the larger delay wins per host
    c.crawl_delays = spark.createDataFrame(
        [("err.test", 2.0), ("slow.test", 1.0)], "host string, crawl_delay double"
    )
    d2 = c._throttle_delays(1).toPandas().set_index("host")
    assert d2.loc["err.test", "crawl_delay"] == 2.0
    assert d2.loc["slow.test", "crawl_delay"] == 1.0


def test_throttle_off_and_empty_keep_fast_path(spark, tmp_path):
    c = Crawler(
        spark, str(tmp_path / "c"), FixtureFetcher(seed=42),
        CrawlOptions(retries=0, auto_throttle=0.5),
    )
    assert c._throttle_delays(0) is None  # no fetched history yet
    c.seed(["http://ok.test/a", "http://ok.test/b"])
    c.run_round()
    assert c._throttle_delays(1) is None  # clean round -> unpaced path
    c2 = Crawler(spark, str(tmp_path / "c2"), FixtureFetcher(seed=42),
                 CrawlOptions(retries=0))
    assert c2._throttle_delays(1) is None  # knob off


def test_throttle_paces_next_round_end_to_end(spark, tmp_path):
    """Round 1 re-offers of a 500-ing host are actually PACED (grouped
    fetch path with the per-host delay), like the robots crawl-delay."""
    import time as _t

    c = Crawler(
        spark, str(tmp_path / "c"),
        FixtureFetcher(seed=42, flaky={"err.test": 999}),
        CrawlOptions(retries=0, auto_throttle=0.2, force_errors=True,
                     max_rounds=1),
    )
    c.seed([f"http://err.test/p{i}" for i in range(4)])
    c.run_round()
    # re-offer the same errored URLs: force_errors lets them through, and
    # the throttle paces 4 requests at 0.2s -> >= 0.6s wall
    c2 = Crawler(
        spark, str(tmp_path / "c"),
        FixtureFetcher(seed=42, flaky={"err.test": 999}),
        CrawlOptions(retries=0, auto_throttle=0.2, force_errors=True,
                     max_rounds=1),
    )
    c2.seed([f"http://err.test/p{i}" for i in range(4)])
    t0 = _t.time()
    c2.run_round()
    assert _t.time() - t0 >= 0.6


def test_host_report_after_crawl(spark, tmp_path):
    """Crawler.host_report e2e: one row per fetched host, pages/ok counts
    consistent with the round's fetch set."""
    from sinew_spark.crawl import host_report as host_report_fn

    c = Crawler(spark, str(tmp_path / "c"), FixtureFetcher(seed=42),
                CrawlOptions(retries=0))
    c.seed(URLS)
    c.run_round()
    rep = {r.host: r for r in c.host_report().collect()}
    fetched = c.fetched_t.read()
    assert sum(r.pages for r in rep.values()) == fetched.count()
    for host, r in rep.items():
        assert r.ok + r.redirects + r.http_errors + r.transport_errors <= r.pages + r.redirects
        assert r.pages >= 1 and r.last_round >= r.first_round
    # module function agrees with the method
    direct = {r.host: r.pages for r in host_report_fn(fetched).collect()}
    assert direct == {h: r.pages for h, r in rep.items()}


def test_adaptive_politeness_paces_from_observed_latency(spark, tmp_path):
    """Latency-adaptive pacing e2e: with adaptive_politeness set, round 1
    paces every host at a delay derived from round 0's observed request
    latencies — at minimum adaptive_host_delay's 250 ms floor. Round 1
    seeds five NEW paths on the observed host (previously-seen 200s
    would be seen-suppressed and fetch nothing — pacing only applies to
    rows that actually fetch), so the in-group sleeps alone cost
    >= 4 x 0.25 s wall; round 0 itself is unpaced."""
    import time as _t

    opts = CrawlOptions(retries=0, adaptive_politeness=2.0, max_rounds=1)
    c = Crawler(spark, str(tmp_path / "c"), FixtureFetcher(seed=42), opts)
    c.seed([f"http://a.test/p{i}" for i in range(4)])
    # round 0: no previous round -> no latency table -> unpaced fast path
    assert c._throttle_delays(0) is None
    c.run_round()
    c2 = Crawler(spark, str(tmp_path / "c"), FixtureFetcher(seed=42), opts)
    delays = c2._throttle_delays(c2.current_round())
    rows = {r.host: r.crawl_delay for r in delays.collect()}
    assert "a.test" in rows and rows["a.test"] >= 0.25
    c2.seed([f"http://a.test/new{i}" for i in range(5)])
    t0 = _t.time()
    stats = c2.run_round()
    wall = _t.time() - t0
    assert stats["fetched"] == 5
    assert wall >= 1.0, wall


def test_adaptive_politeness_composes_with_robots_and_throttle(spark, tmp_path):
    """All three ask sources (robots Crawl-delay, auto_throttle errors,
    adaptive latency) merge by per-host max."""
    opts = CrawlOptions(retries=0, auto_throttle=5.0, adaptive_politeness=2.0,
                        force_errors=True, max_rounds=1)
    c = Crawler(
        spark, str(tmp_path / "c"),
        FixtureFetcher(seed=42, flaky={"err.test": 999}), opts,
    )
    c.seed(["http://err.test/p0", "http://ok.test/p0"])
    c.run_round()
    c2 = Crawler(
        spark, str(tmp_path / "c"),
        FixtureFetcher(seed=42, flaky={"err.test": 999}), opts,
    )
    rows = {r.host: r.crawl_delay for r in
            c2._throttle_delays(c2.current_round()).collect()}
    # errored host: max(auto_throttle 5.0, adaptive) = 5.0 (fixture
    # latencies are far below 1.25s even after the 4x error backoff)
    assert rows["err.test"] == 5.0
    # healthy host: adaptive floor only
    assert 0.25 <= rows["ok.test"] < 5.0
