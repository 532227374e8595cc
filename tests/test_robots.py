"""robots.txt parsing + end-to-end gating through the crawler."""

from sinew_spark.functions.robots import parse_robots_txt

SIMPLE = """
# comments ignored
User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /tmp
"""

GROUPED = """
User-agent: googlebot
Disallow: /nogoogle/

User-agent: *
Disallow: /noall/

User-agent: sinew
User-agent: other
Disallow: /nosinew/
"""


def test_parse_simple():
    assert parse_robots_txt(SIMPLE) == ["/private/"]  # Allow cancels /tmp


def test_parse_agent_groups():
    assert parse_robots_txt(GROUPED, "googlebot") == ["/nogoogle/"]
    assert parse_robots_txt(GROUPED, "sinew") == ["/nosinew/"]
    assert parse_robots_txt(GROUPED, "other") == ["/nosinew/"]
    assert parse_robots_txt(GROUPED, "unknown") == ["/noall/"]
    assert parse_robots_txt(GROUPED) == ["/noall/"]


def test_parse_empty_and_missing():
    assert parse_robots_txt("") == []
    assert parse_robots_txt(None) == []
    assert parse_robots_txt("Disallow: /orphan/") == []  # rules before any agent


def test_robots_rules_df_and_gating(spark, tmpdir_path):
    """Fetch robots.txt through the crawler, build rules, re-crawl gated."""
    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.functions.robots import robots_rules
    from sinew_spark.sources.fetch import FixtureFetcher

    pages = {
        "http://a.test/robots.txt": (200, "text/plain", "User-agent: *\nDisallow: /blocked/", None),
        "http://b.test/robots.txt": (404, "text/plain", "not found", None),
        "http://a.test/blocked/x": (200, "text/html", "<p>secret</p>", None),
        "http://a.test/open/x": (200, "text/html", "<p>ok</p>", None),
        "http://b.test/blocked/x": (200, "text/html", "<p>b not gated</p>", None),
    }
    fetcher = FixtureFetcher(seed=7, extra_pages=pages)

    # phase 1: fetch robots
    c1 = Crawler(spark, f"{tmpdir_path}/robots", fetcher, CrawlOptions(rate_limit=0, retries=0))
    c1.seed(["http://a.test/robots.txt", "http://b.test/robots.txt"])
    c1.run(1)
    rules = robots_rules(c1.fetched_t.read())
    got = {(r.host, r.disallow_prefix) for r in rules.collect()}
    assert got == {("a.test", "/blocked/")}

    # phase 2: crawl gated by those rules
    c2 = Crawler(
        spark, f"{tmpdir_path}/crawl", fetcher,
        CrawlOptions(rate_limit=0, retries=0), robots=rules,
    )
    c2.seed(["http://a.test/blocked/x", "http://a.test/open/x", "http://b.test/blocked/x"])
    c2.run(1)
    fetched = {r.url for r in c2.seen_t.read().collect()}
    assert fetched == {"http://a.test/open/x", "http://b.test/blocked/x"}


def test_bootstrap_robots_end_to_end(spark, tmpdir_path):
    """One call fetches robots.txt per host through an exactly-once round,
    parses rules, and the rules gate a subsequent crawl."""
    from pyspark.sql import functions as F

    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.functions.robots import bootstrap_robots
    from sinew_spark.operators.frontier import apply_robots, prepare_frontier
    from sinew_spark.sources.fetch import FixtureFetcher

    pages = {
        "http://a.test/robots.txt": (
            200, "text/plain", "User-agent: *\nDisallow: /private\n", None,
        ),
        "http://b.test/robots.txt": (404, "text/plain", "", None),
    }
    fetcher = FixtureFetcher(extra_pages=pages)
    boot = Crawler(
        spark, f"{tmpdir_path}/boot", fetcher, CrawlOptions(rate_limit=0, retries=0)
    )
    hosts = spark.createDataFrame([("a.test",), ("b.test",)], "host string")
    rules = bootstrap_robots(boot, hosts)
    got = [(r.host, r.disallow_prefix) for r in rules.collect()]
    assert got == [("a.test", "/private")]  # 404 robots -> allow-all

    frontier = prepare_frontier(
        spark.createDataFrame(
            [
                ("http://a.test/private/x", "GET", "", 0.0, 0, 0, 0),
                ("http://a.test/public/y", "GET", "", 0.0, 0, 1, 0),
                ("http://b.test/private/z", "GET", "", 0.0, 0, 2, 0),
            ],
            "url string, method string, body string, priority double, depth int, seq long, attempt int",
        ),
        boot.canonicalize,
    )
    kept = sorted(r.canonical_url for r in apply_robots(frontier, rules).collect())
    assert kept == ["http://a.test/public/y", "http://b.test/private/z"]


DELAYED = """
User-agent: fastbot
Crawl-delay: 0.05

User-agent: *
Crawl-delay: 2.5
Disallow: /x/

User-agent: brokenbot
Crawl-delay: soon
"""


def test_parse_crawl_delay_groups():
    from sinew_spark.functions.robots import parse_robots_crawl_delay

    assert parse_robots_crawl_delay(DELAYED, "fastbot") == 0.05
    assert parse_robots_crawl_delay(DELAYED, "*") == 2.5
    assert parse_robots_crawl_delay(DELAYED, "somebot") == 2.5  # '*' fallback
    # unparseable value ignored -> group has no delay
    assert parse_robots_crawl_delay(DELAYED, "brokenbot") is None
    assert parse_robots_crawl_delay("", "*") is None
    # case-insensitive field name, negative rejected
    assert parse_robots_crawl_delay("User-Agent: *\nCRAWL-DELAY: 1", "*") == 1.0
    assert parse_robots_crawl_delay("User-agent: *\nCrawl-delay: -3", "*") is None


def test_crawl_delay_does_not_disturb_disallow():
    from sinew_spark.functions.robots import parse_robots_txt

    assert parse_robots_txt(DELAYED, "*") == ["/x/"]


def test_robots_crawl_delays_df(spark):
    from sinew_spark.functions.robots import robots_crawl_delays

    fetched = spark.createDataFrame(
        [
            ("slow.test", 200, "User-agent: *\nCrawl-delay: 1.5"),
            ("fast.test", 200, "User-agent: *\nDisallow: /x/"),
            ("err.test", 503, "User-agent: *\nCrawl-delay: 9"),
        ],
        "host string, status int, resp_body string",
    )
    got = {r.host: r.crawl_delay for r in robots_crawl_delays(fetched).collect()}
    # only hosts that declare a delay appear; error responses contribute none
    assert got == {"slow.test": 1.5}


def test_crawl_delay_paces_fetch_end_to_end(spark, tmpdir_path):
    import time

    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.sources.fetch import FixtureFetcher

    delays = spark.createDataFrame(
        [("slow.test", 0.15)], "host string, crawl_delay double"
    )

    def run(host):
        c = Crawler(
            spark,
            tmpdir_path + "/cd_" + host,
            FixtureFetcher(seed=42),
            CrawlOptions(rate_limit=0.0, retries=0, max_rounds=1),
            crawl_delays=delays,
        )
        c.seed([f"http://{host}/p{i}" for i in range(3)])
        t0 = time.time()
        c.run()
        return time.time() - t0

    # 3 URLs on the delayed host, 0.15s between -> >= 0.3s wall even with
    # a zero global rate_limit; the undelayed host has no pacing floor
    assert run("slow.test") >= 0.3


def test_robots_rules_full_emits_both_kinds(spark):
    from sinew_spark.functions.robots import robots_rules_full

    fetched = spark.createDataFrame(
        [
            ("a.test", 200, "User-agent: *\nDisallow: /x/\nAllow: /x/ok/"),
            ("b.test", 404, "User-agent: *\nDisallow: /all/"),
        ],
        "host string, status int, resp_body string",
    )
    got = {(r.host, r.prefix, r.is_allow) for r in robots_rules_full(fetched).collect()}
    assert got == {("a.test", "/x/", False), ("a.test", "/x/ok/", True)}


def test_apply_robots_longest_match_precedence(spark):
    from sinew_spark.operators.frontier import apply_robots_longest_match

    cases = [
        ("/public/a", True),           # no rule matches
        ("/private/a", False),         # plain disallow
        ("/private/open/a", True),     # longer Allow re-permits
        ("/private/openx", False),     # Allow needs its trailing slash
        ("/same/", True),              # equal lengths tie -> allow
    ]
    fr = spark.createDataFrame(
        [(i, "h.test", f"http://h.test{p}") for i, (p, _) in enumerate(cases)],
        "event_id long, host string, canonical_url string",
    )
    rules = spark.createDataFrame(
        [
            ("h.test", "/private/", False),
            ("h.test", "/private/open/", True),
            ("h.test", "/same/", True),
            ("h.test", "/same/", False),
        ],
        "host string, prefix string, is_allow boolean",
    )
    kept = {r.event_id for r in apply_robots_longest_match(fr, rules).collect()}
    assert kept == {i for i, (_, ok) in enumerate(cases) if ok}


def test_apply_robots_longest_match_no_rules_host_and_plan(spark):
    from sinew_spark.operators.frontier import apply_robots_longest_match

    fr = spark.createDataFrame(
        [(0, "free.test", "http://free.test/anything")],
        "event_id long, host string, canonical_url string",
    )
    rules = spark.createDataFrame(
        [("other.test", "/x/", False)], "host string, prefix string, is_allow boolean"
    )
    out = apply_robots_longest_match(fr, rules)
    assert out.count() == 1  # hosts without rules pass untouched
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no exchange on the frontier side beyond the broadcast
    assert plan.count("Exchange hashpartitioning") <= 1  # rules-side groupBy only


def test_parse_robots_sitemaps():
    from sinew_spark.functions.robots import parse_robots_sitemaps

    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: http://a.test/s.xml\n"
        "sitemap: http://a.test/s2.xml # comment\n"
        "SITEMAP: http://a.test/s.xml\n"     # dup removed
        "Sitemap: /relative.xml\n"            # rejected: not absolute
        "Sitemap:\n"                          # rejected: empty
        "User-agent: other\nSitemap: http://a.test/s3.xml\n"  # group-independent
    )
    assert parse_robots_sitemaps(body) == [
        "http://a.test/s.xml", "http://a.test/s2.xml", "http://a.test/s3.xml",
    ]
    assert parse_robots_sitemaps("") == []
    assert parse_robots_sitemaps(None) == []


def test_robots_sitemaps_df(spark):
    from sinew_spark.functions.robots import robots_sitemaps

    df = spark.createDataFrame(
        [
            ("a.test", 200, "Sitemap: http://a.test/s.xml\n"),
            ("b.test", 404, "Sitemap: http://b.test/never.xml\n"),
            ("c.test", 200, "User-agent: *\nDisallow: /\n"),
        ],
        "host string, status int, resp_body string",
    )
    rows = sorted((r.host, r.sitemap_url) for r in robots_sitemaps(df).collect())
    assert rows == [("a.test", "http://a.test/s.xml")]


def test_refresh_robots_ttl(spark, tmpdir_path):
    """refresh_robots: fresh copies are NOT refetched; stale copies are,
    and the LATEST rules win (policy change between fetches applies)."""
    import time as _time

    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.functions.robots import bootstrap_robots, refresh_robots
    from sinew_spark.sources.fetch import FixtureFetcher

    pages = {
        "http://a.test/robots.txt": (
            200, "text/plain", "User-agent: *\nDisallow: /old\n", None,
        ),
    }
    fetcher = FixtureFetcher(extra_pages=pages)
    c = Crawler(
        spark, f"{tmpdir_path}/c", fetcher, CrawlOptions(rate_limit=0, retries=0)
    )
    hosts = spark.createDataFrame([("a.test",)], "host string")
    rules = bootstrap_robots(c, hosts)
    assert [(r.host, r.disallow_prefix) for r in rules.collect()] == [
        ("a.test", "/old")
    ]

    # fresh copy (huge ttl): no refetch, same rules
    rules = refresh_robots(c, hosts, ttl=1e9)
    n_rows = (
        c.fetched_t.read()
        .where("canonical_url LIKE '%robots.txt'")
        .count()
    )
    assert n_rows == 1
    assert [(r.host, r.disallow_prefix) for r in rules.collect()] == [
        ("a.test", "/old")
    ]

    # stale copy (tiny ttl) + changed policy at the origin: refetched,
    # latest rules win
    pages["http://a.test/robots.txt"] = (
        200, "text/plain", "User-agent: *\nDisallow: /new\n", None,
    )
    _time.sleep(0.05)
    rules = refresh_robots(c, hosts, ttl=0.01)
    n_rows = (
        c.fetched_t.read()
        .where("canonical_url LIKE '%robots.txt'")
        .count()
    )
    assert n_rows == 2
    assert [(r.host, r.disallow_prefix) for r in rules.collect()] == [
        ("a.test", "/new")
    ]
    # options restored after the refresh round
    assert c.opts.expires is None


def test_rule_pattern_regex_forms():
    """RFC 9309 §2.2.3 pattern compilation: plain prefixes -> None (fast
    path); '*' -> any sequence; trailing '$' anchors; regex metachars in
    rules stay literal."""
    from sinew_spark.functions.robots import rule_pattern_regex
    import re

    assert rule_pattern_regex("/plain/prefix") is None
    r = rule_pattern_regex("/fish*")
    assert re.search(r, "/fish.html") and re.search(r, "/fishheads/x")
    r = rule_pattern_regex("/*.php$")
    assert re.search(r, "/filename.php")
    assert not re.search(r, "/filename.php5")
    r = rule_pattern_regex("/fish*.php")
    assert re.search(r, "/fishheads/catfish.php?parameters")
    # '$' only anchors at the END; '.' in rules is literal
    r = rule_pattern_regex("/a.b$")
    assert re.search(r, "/a.b") and not re.search(r, "/aXb")


def test_conservative_gate_truncates_wildcards():
    """parse_robots_txt (conservative gate): wildcard rules truncate to
    their literal head — over-blocking, never under-blocking."""
    from sinew_spark.functions.robots import parse_robots_txt

    body = "User-agent: *\nDisallow: /private*/x\nDisallow: *.php\nDisallow: /exact$\n"
    assert parse_robots_txt(body) == ["/private", "/", "/exact"]


def test_apply_robots_longest_match_wildcards(spark):
    """Wildcard rules flow through robots_rules_full -> longest-match
    gate: '*' and '$' match per RFC; precedence = pattern length."""
    from sinew_spark.functions.robots import robots_rules_full
    from sinew_spark.operators.frontier import apply_robots_longest_match

    robots = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /files*private\n"
        "Allow: /files/a*private\n"
    )
    fetched = spark.createDataFrame(
        [("h.test", 200, robots)], "host string, status int, resp_body string"
    )
    rules = robots_rules_full(fetched)
    got = {
        (r.prefix, r.is_allow): r.pattern_re for r in rules.collect()
    }
    assert got[("/*.pdf$", False)] is not None
    urls = [
        ("http://h.test/doc.pdf", False),          # trailing-$ wildcard blocks
        ("http://h.test/doc.pdfx", True),          # $ anchor: no match
        ("http://h.test/files/b/private", False),  # embedded * blocks
        ("http://h.test/files/a/private", True),   # longer Allow pattern wins
        ("http://h.test/open/page", True),
    ]
    frontier = spark.createDataFrame(
        [(u, "h.test") for u, _ in urls], "canonical_url string, host string"
    )
    kept = {
        r.canonical_url
        for r in apply_robots_longest_match(frontier, rules).collect()
    }
    for u, allowed in urls:
        assert (u in kept) == allowed, u
