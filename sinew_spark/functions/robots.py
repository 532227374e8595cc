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


def parse_robots_txt(body: str, agent: str = "*") -> list[str]:
    """Return the Disallow prefixes applying to `agent`. An empty Disallow
    line means allow-all (ignored). Allow lines longer than a Disallow
    prefix re-permit that subtree: we emit the disallow only if no Allow
    line exactly covers it (prefix-for-prefix); finer-grained overlap is
    resolved at gate time by longest-match, which apply_robots approximates
    conservatively (any matching disallow blocks)."""
    if not body:
        return []
    agent = agent.lower()
    groups: list[tuple[list[str], list[str], list[str]]] = []  # (agents, disallows, allows)
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_allow: list[str] = []
    last_was_agent = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_agent and cur_agents:
                groups.append((cur_agents, cur_dis, cur_allow))
                cur_agents, cur_dis, cur_allow = [], [], []
            cur_agents.append(value.lower())
            last_was_agent = True
        elif field in ("disallow", "allow"):
            last_was_agent = False
            if not cur_agents:
                continue  # rules before any user-agent line are ignored
            if field == "disallow" and value:
                cur_dis.append(value)
            elif field == "allow" and value:
                cur_allow.append(value)
        else:
            last_was_agent = False
    if cur_agents:
        groups.append((cur_agents, cur_dis, cur_allow))

    def pick(want: str) -> tuple[list[str], list[str]] | None:
        for agents, dis, allow in groups:
            if any(a == want or (a != "*" and want.startswith(a)) for a in agents):
                return dis, allow
        return None

    chosen = pick(agent) if agent != "*" else None
    if chosen is None:
        for agents, dis, allow in groups:
            if "*" in agents:
                chosen = (dis, allow)
                break
    if chosen is None:
        return []
    dis, allow = chosen
    # conservative: an Allow cancels only an identical Disallow; a longer
    # Allow under a disallowed prefix stays blocked (we never fetch more
    # than the site permits)
    return [d for d in dis if d not in allow]


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
