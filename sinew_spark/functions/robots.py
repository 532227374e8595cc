"""robots.txt parsing — fetched robots bodies -> broadcastable rules table.

The reference does not check robots.txt (/root/reference/README.md:199
"Sinew doesn't (yet) check robots.txt - please check it manually"); the
north rule requires it. The flow: seed `http://<host>/robots.txt` URLs like
any frontier rows (they go through the same exactly-once cache), then
`robots_rules(fetched)` parses the bodies into (host, disallow_prefix) rows
that `operators.frontier.apply_robots` broadcasts against the frontier.

Parsing follows the original 1994 REP conventions plus Google's published
extensions that matter for gating: user-agent groups, longest-prefix is NOT
needed (any matching Disallow prefix blocks unless an explicit Allow is
longer — we implement allow-overrides-shorter-disallow), '*' agent
fallback, case-insensitive field names, '#' comments.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefix", T.StringType()),
    ]
)


def _parse_groups(body: str) -> list[dict]:
    """Tokenize robots.txt into user-agent groups: each a dict with
    ``agents`` / ``disallows`` / ``allows`` / ``crawl_delay`` (float
    seconds or None; unparseable values ignored per Google's REP)."""
    groups: list[dict] = []
    cur: dict | None = None
    last_was_agent = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_agent and cur is not None:
                groups.append(cur)
                cur = None
            if cur is None:
                cur = {"agents": [], "disallows": [], "allows": [], "crawl_delay": None}
            cur["agents"].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue  # rules before any user-agent line are ignored
        if field == "disallow" and value:
            cur["disallows"].append(value)
        elif field == "allow" and value:
            cur["allows"].append(value)
        elif field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                continue
            if delay >= 0:
                cur["crawl_delay"] = delay
    if cur is not None:
        groups.append(cur)
    return groups


def _pick_group(groups: list[dict], agent: str) -> dict | None:
    """Most-specific group for ``agent``: exact/prefix agent match first,
    then the '*' fallback group."""
    agent = agent.lower()
    if agent != "*":
        for g in groups:
            if any(a == agent or (a != "*" and agent.startswith(a)) for a in g["agents"]):
                return g
    for g in groups:
        if "*" in g["agents"]:
            return g
    return None


def parse_robots_txt(body: str, agent: str = "*") -> list[str]:
    """Return the Disallow prefixes applying to `agent`. An empty Disallow
    line means allow-all (ignored). Allow lines longer than a Disallow
    prefix re-permit that subtree: we emit the disallow only if no Allow
    line exactly covers it (prefix-for-prefix); finer-grained overlap is
    resolved at gate time by longest-match, which apply_robots approximates
    conservatively (any matching disallow blocks)."""
    chosen = _pick_group(_parse_groups(body), agent)
    if chosen is None:
        return []
    # conservative: an Allow cancels only an identical Disallow; a longer
    # Allow under a disallowed prefix stays blocked (we never fetch more
    # than the site permits). RFC 9309 §2.2.3 wildcard rules truncate at
    # the first '*'/'$': the literal head is a SUPERSET of the pattern's
    # matches, so the conservative gate blocks at least what the rule asks
    # (Disallow /a*b -> block /a; full-fidelity matching lives in
    # rule_pattern_regex + apply_robots_longest_match).
    # a leading-wildcard Disallow (e.g. '*.php') truncates to '' — block
    # everything ('/') rather than nothing: conservative means over-block
    return [
        _wildcard_head(d) or "/"
        for d in chosen["disallows"]
        if d not in chosen["allows"]
    ]


def _wildcard_head(pattern: str) -> str:
    """Literal prefix of an RFC 9309 rule: everything before the first
    '*' or '$'. For wildcard-free rules this is the rule itself."""
    for i, ch in enumerate(pattern):
        if ch in "*$":
            return pattern[:i]
    return pattern


def rule_pattern_regex(pattern: str) -> str | None:
    """Anchored regex for an RFC 9309 path rule USING wildcards, or None
    for plain prefixes (the fast startswith path needs no regex). '*'
    matches any character sequence; a TRAILING '$' anchors the end;
    embedded '$' is literal (RFC 9309 §2.2.3); everything else is
    literal. The regex is start-anchored only — an un-anchored rule
    matches any path with the pattern as a prefix, like startswith."""
    if "*" not in pattern and not pattern.endswith("$"):
        return None
    import re as _re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [_re.escape(p) for p in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def parse_robots_crawl_delay(body: str, agent: str = "*") -> float | None:
    """``Crawl-delay`` seconds applying to ``agent`` (group-scoped, same
    agent-resolution rule as the Disallow path), or None when unset."""
    chosen = _pick_group(_parse_groups(body), agent)
    return None if chosen is None else chosen["crawl_delay"]


def robots_rules(fetched: DataFrame, agent: str = "*") -> DataFrame:
    """fetched rows for /robots.txt URLs -> (host, disallow_prefix) rules.
    4xx/5xx robots responses yield no rules (conventional allow-all on
    missing robots). Output is tiny (rules per host) — broadcast it."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, prefixes = [], []
            for row in pdf.itertuples(index=False):
                ok = row.status is not None and 200 <= row.status < 300
                for p in parse_robots_txt(row.resp_body if ok else "", agent):
                    hosts.append(row.host)
                    prefixes.append(p)
            yield pd.DataFrame({"host": hosts, "disallow_prefix": prefixes})

    return fetched.select("host", "status", "resp_body").mapInPandas(parse, RULES_SCHEMA)


RULES_FULL_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("prefix", T.StringType()),
        T.StructField("is_allow", T.BooleanType()),
        # anchored regex for RFC 9309 wildcard rules ('*' / trailing '$');
        # NULL for plain prefixes, which take the startswith fast path
        T.StructField("pattern_re", T.StringType()),
    ]
)


def robots_rules_full(fetched: DataFrame, agent: str = "*") -> DataFrame:
    """fetched /robots.txt rows -> (host, prefix, is_allow) with BOTH
    Allow and Disallow prefixes of the agent's group — the input for
    full REP longest-match precedence
    (operators/frontier.py apply_robots_longest_match). The simpler
    (host, disallow_prefix) table from ``robots_rules`` remains the
    conservative gate (never over-fetches; may under-fetch where a long
    Allow re-permits a disallowed subtree)."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, prefixes, allows, res = [], [], [], []
            for row in pdf.itertuples(index=False):
                ok = row.status is not None and 200 <= row.status < 300
                g = _pick_group(_parse_groups(row.resp_body if ok else ""), agent)
                if g is None:
                    continue
                for is_allow, rules in ((False, g["disallows"]), (True, g["allows"])):
                    for p in rules:
                        hosts.append(row.host)
                        prefixes.append(p)
                        allows.append(is_allow)
                        res.append(rule_pattern_regex(p))
            yield pd.DataFrame(
                {"host": hosts, "prefix": prefixes, "is_allow": allows, "pattern_re": res}
            )

    return fetched.select("host", "status", "resp_body").mapInPandas(
        parse, RULES_FULL_SCHEMA
    )


DELAYS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)


def robots_crawl_delays(fetched: DataFrame, agent: str = "*") -> DataFrame:
    """fetched rows for /robots.txt URLs -> (host, crawl_delay) for hosts
    that declare one. Output is at most one row per host — broadcast it
    into the fetch stage (``fetch_rows(host_delays=...)``), where it
    overrides the global rate_limit upward (politeness never decreases)."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, delays = [], []
            for row in pdf.itertuples(index=False):
                ok = row.status is not None and 200 <= row.status < 300
                d = parse_robots_crawl_delay(row.resp_body, agent) if ok else None
                if d is not None:
                    hosts.append(row.host)
                    delays.append(d)
            yield pd.DataFrame({"host": hosts, "crawl_delay": delays})

    return fetched.select("host", "status", "resp_body").mapInPandas(
        parse, DELAYS_SCHEMA
    )


def bootstrap_robots(crawler, hosts: DataFrame, agent: str = "*", scheme: str = "http") -> DataFrame:
    """Fetch ``http://<host>/robots.txt`` for every host through one
    exactly-once crawl round and parse to the broadcastable rules table —
    the full robots flow the module docstring describes, as one call:

        rules = bootstrap_robots(bootstrap_crawler, hosts_df)
        crawler = Crawler(spark, workdir, fetcher, opts, robots=rules)

    ``hosts``: one ``host`` column. Robots URLs already in the crawler's
    seen set are served from cache semantics (not refetched) and contribute
    no rules to THIS call — bootstrap against a fresh workdir (or reuse the
    returned rules table, which is tiny and worth persisting)."""
    from pyspark.sql import functions as F

    urls = hosts.select(
        F.concat(F.lit(f"{scheme}://"), F.col("host"), F.lit("/robots.txt")).alias("url"),
        F.xxhash64("host").alias("seq"),  # deterministic, order-free
    )
    crawler.seed_df(urls)
    crawler.run_round()
    snap = crawler.fetched_t.current_snapshot()
    fetched = crawler.fetched_t.read_delta(snap)
    return robots_rules(
        fetched.where(F.col("canonical_url").endswith("/robots.txt")), agent
    )


def refresh_robots(
    crawler, hosts: DataFrame, ttl: float, agent: str = "*", scheme: str = "http"
) -> DataFrame:
    """Long-crawl robots freshness: re-fetch ``robots.txt`` for hosts whose
    stored copy is older than ``ttl`` seconds — copies still fresh are NOT
    refetched (the frontier's TTL-expiry path, same machinery as
    ``expires`` recrawls) — then parse the LATEST copy per host into the
    broadcastable rules table. Call between rounds of a multi-day crawl:

        rules = refresh_robots(crawler, hosts_df, ttl=86400.0)
        crawler.robots = rules   # next rounds gate on current policy

    RFC 9309 §2.4 allows caching robots for up to 24h ("crawlers SHOULD
    NOT use the cached version for more than 24 hours") — ttl=86400 is
    the compliant default posture. One exactly-once crawl round for the
    stale set + one tiny latest-per-host aggregate; the rules output is
    rows-per-host small — broadcast it."""
    import dataclasses

    from pyspark.sql import functions as F

    urls = hosts.select(
        F.concat(F.lit(f"{scheme}://"), F.col("host"), F.lit("/robots.txt")).alias("url"),
        F.xxhash64("host").alias("seq"),  # deterministic, order-free
    )
    old_opts = crawler.opts
    crawler.opts = dataclasses.replace(old_opts, expires=ttl)
    try:
        crawler.seed_df(urls)
        crawler.run_round()
    finally:
        crawler.opts = old_opts
    robots_rows = crawler.fetched_t.read().where(
        F.col("canonical_url").endswith("/robots.txt")
    )
    latest = (
        robots_rows.groupBy("canonical_url")
        .agg(
            F.max_by(
                F.struct("host", "status", "resp_body"), F.col("fetched_at")
            ).alias("_r")
        )
        .select("_r.host", "_r.status", "_r.resp_body")
    )
    return robots_rules(latest, agent)


SITEMAPS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("sitemap_url", T.StringType()),
    ]
)


def parse_robots_sitemaps(body: str) -> list[str]:
    """``Sitemap:`` directive URLs from a robots.txt body
    (sitemaps.org / RFC 9309 §2.3 non-group line: case-insensitive field
    name, absolute URL value, valid ANYWHERE in the file independent of
    user-agent groups). Order-preserving, de-duplicated."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        field, sep, value = line.partition(":")
        if not sep or field.strip().lower() != "sitemap":
            continue
        url = value.strip()
        if url and "://" in url and url not in seen:
            seen.add(url)
            out.append(url)
    return out


def robots_sitemaps(fetched: DataFrame) -> DataFrame:
    """fetched /robots.txt rows -> (host, sitemap_url) for every Sitemap
    directive — the standard seed-discovery path a web-scale crawl pairs
    with ``sources/sitemap.py expand_sitemap_frontier`` (robots fetch ->
    sitemap URLs -> sitemap tree walk -> frontier seeds). Output is a few
    rows per host — broadcast-sized."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, urls = [], []
            for row in pdf.itertuples(index=False):
                ok = row.status is not None and 200 <= row.status < 300
                for u in parse_robots_sitemaps(row.resp_body if ok else ""):
                    hosts.append(row.host)
                    urls.append(u)
            yield pd.DataFrame({"host": hosts, "sitemap_url": urls})

    return fetched.select("host", "status", "resp_body").mapInPandas(
        parse, SITEMAPS_SCHEMA
    )
