"""Crawler — the distributed frontier loop (BFS supersteps).

The reference's "query lifecycle" is an imperative recipe: each `get` hits
the cache-or-network, each emit appends a CSV row
(/root/reference/lib/sinew/main.rb:18-29). The engine's lifecycle is a
round loop of declarative DataFrame plans:

  frontier --dedup(round)--> --seen filter (fused bloom+exact shard
  probe | anti-join)--> --robots--> --per-host cap--> --budget-->
  FETCH (per-host pandas groups) --> seen += keys (+redirect hops)
  --> PARSE --> documents += spans
  --> links -> next frontier (deterministic seq)  [repeat]

Durability/resumability: frontier, seen, fetched, documents, metrics are
snapshot tables (plans/snapshots.py); each round commits one snapshot per
table, so a killed crawl resumes from the last committed round with
identical ordering (seq is data, not runtime state). The exact seen-key
shards are snapshot-synced truth with an anti-join fallback; the Bloom
sidecar (same snapshot discipline) is a short-circuit consulted INSIDE the
exact probe — a bloom false positive falls through to the binary search,
never drops a row (operators/bloom.py).

Determinism: every row carries (priority, seq); seq for discovered links is
parent_seq * LINK_STRIDE + link_index, so replay ordering is a pure function
of the seed list — the reference's program-order guarantee, distributed.

Scale notes (100 TB design point):
- shuffles per round: groupBy(key) round-dedup (whose exchange+sort the
  downstream seen filter reuses) and groupBy(host) for paced fetch —
  nothing else: the exactly-once check is a shard-local probe whose
  key-only filter Catalyst pushes below the dedup shuffle (seen rows
  never shuffle) — plain membership via SeenKeyShardStore with the bloom
  short-circuit fused in, TTL/force_errors semantics via
  SeenValueShardStore (per-key class-max fetched_at), so even the
  continuous-recrawl mode never joins against the seen table; the
  anti-join fallback serves small-seen runs
- per-host caps bound fetch-task skew regardless of host distribution
- parse is shuffle-free mapInPandas; no O(rows) driver pulls anywhere in
  the round loop (stats are single-row aggregates)
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from sinew_spark.functions.localhash import request_key_local
from sinew_spark.functions.urls import (
    canonicalize_url_str,
    host_expr,
    make_canonicalize_udf,
    request_key_expr,
)
from sinew_spark.operators.bloom import (
    BloomShardStore,
    SeenKeyShardStore,
    SeenValueShardStore,
)
from sinew_spark.operators.frontier import (
    FRONTIER_SCHEMA,
    SEEN_SCHEMA,
    anti_join_seen,
    apply_robots,
    apply_url_scope,
    dedup_within_round,
    per_host_cap,
    prepare_frontier,
    take_round_budget,
)
from sinew_spark.operators.parse import PARSED_SCHEMA
from sinew_spark.plans.snapshots import SnapshotTable
from sinew_spark.sources.fetch import FETCH_PARSED_SCHEMA, Fetcher, fetch_rows

LINK_STRIDE = 1_000  # seq slots reserved per parent for discovered links

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType()),
        T.StructField("candidates", T.LongType()),
        T.StructField("selected", T.LongType()),
        T.StructField("fetched", T.LongType()),
        T.StructField("errors", T.LongType()),
        T.StructField("not_modified", T.LongType()),  # 304 revalidations
        T.StructField("new_links", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("ts", T.DoubleType()),
    ]
)

HOST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("cookies", T.StringType()),  # JSON jar (C11)
        T.StructField("round", T.IntegerType()),
    ]
)

HOST_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("n", T.LongType()),  # pages fetched this round
        T.StructField("round", T.IntegerType()),
    ]
)

_FETCHED_WITH_ROUND = T.StructType(FETCH_PARSED_SCHEMA.fields + [T.StructField("round", T.IntegerType())])
_PARSED_WITH_ROUND = T.StructType(PARSED_SCHEMA.fields + [T.StructField("round", T.IntegerType())])


def latest_validators(fetched: DataFrame) -> DataFrame:
    """Per-key HTTP validators for conditional revalidation: the latest
    NON-NULL value of each validator independently (not the latest row's
    pair). RFC 9110 §15.4.5: a 304 may re-send only one validator — e.g.
    Last-Modified without ETag — and the omitted one stays valid, so
    taking the newest row's (etag, last_modified) struct would silently
    drop a still-valid ETag and degrade every later revalidation of that
    page to If-Modified-Since-only. max_by ignores rows whose ordering
    expression is null, which yields exactly latest-non-null per field."""
    return (
        fetched.where(F.col("etag").isNotNull() | F.col("last_modified").isNotNull())
        .groupBy("key")
        .agg(
            F.max_by(
                F.col("etag"),
                F.when(F.col("etag").isNotNull(), F.col("fetched_at")),
            ).alias("etag"),
            F.max_by(
                F.col("last_modified"),
                F.when(F.col("last_modified").isNotNull(), F.col("fetched_at")),
            ).alias("last_modified"),
        )
    )


def host_report(fetched: DataFrame) -> DataFrame:
    """Per-host crawl operations report — the monitoring table an operator
    watches during a long crawl: page counts by outcome class, body
    bytes, retry pressure, and recency per host. One map-side-combinable
    groupBy (a single hash shuffle carrying one row per host), safe at
    any frontier scale.

    Outcome classes are DISJOINT: ok = 2xx, redirects = 3xx,
    http_errors = 4xx/5xx, transport_errors = status < 100, i.e. below
    the HTTP status space (the live transport stamps -1 on DNS/timeout/
    TLS, fetch.py). Classifying transport by status, not by ``error``:
    retry-exhausted 5xx rows also carry a non-null ``error``
    ("status 503"), and counting those would report phantom DNS/TLS
    failures equal to the 5xx count. ``bytes`` sums
    stored body octets (post-decode); rows whose body was never stored
    (304s, errors) contribute 0."""
    status = F.col("status")
    return (
        fetched.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("pages"),
            F.sum(status.between(200, 299).cast("long")).alias("ok"),
            F.sum(status.between(300, 399).cast("long")).alias("redirects"),
            F.sum(status.between(400, 599).cast("long")).alias("http_errors"),
            F.sum((F.coalesce(status, F.lit(-1)) < 100).cast("long")).alias(
                "transport_errors"
            ),
            F.sum(
                F.coalesce(F.octet_length("resp_body"), F.lit(0)).cast("long")
            ).alias("bytes"),
            F.sum(F.col("n_attempts").cast("long")).alias("attempts"),
            F.min("round").alias("first_round"),
            F.max("round").alias("last_round"),
            F.max("fetched_at").alias("last_fetched_at"),
        )
    )


class _DocumentsView:
    """The documents table as a zero-copy projection of the fused fetched
    table. One physical copy of the span data exists; this view is the
    Iceberg-style "virtual table" over it. Column pruning ensures document
    readers scan only span columns, never bodies."""

    def __init__(self, fetched_t: SnapshotTable):
        self._t = fetched_t

    @staticmethod
    def _project(df: DataFrame) -> DataFrame:
        # a 304 revalidation is not a new document (the body never came
        # over the wire) — the prior round's row is still the document
        return df.where(F.coalesce(F.col("status"), F.lit(0)) != 304).select(
            F.col("canonical_url").alias("doc_id"),
            "final_url", "status", "content_type", "seq", "depth",
            "spans", "links", "round",
        )

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        return self._project(self._t.read(snapshot_id))

    def read_delta(self, snapshot_id: int, target_partitions: int | None = None) -> DataFrame:
        return self._project(self._t.read_delta(snapshot_id, target_partitions))

    def snapshots(self):
        return self._t.snapshots()

    def current_snapshot(self):
        return self._t.current_snapshot()


@dataclass
class CrawlOptions:
    """Mirrors sinew's option surface (/root/reference/lib/sinew/base.rb:13-54)
    plus the distributed knobs the reference doesn't need."""

    rate_limit: float = 0.0
    retries: int = 2
    timeout: float = 30.0
    expires: float | None = None
    force: bool = False
    force_errors: bool = False
    # HTTP revalidation on recrawl (force/force_errors/expires modes):
    # re-offered pages send their stored validators (If-None-Match /
    # If-Modified-Since); a 304 answer refreshes seen/TTL state without
    # body transfer or re-parse. The reference can't do this (httpdisk
    # serves stale or refetches whole); at the 10^10-URL design point a
    # TTL recrawl's bandwidth is dominated by unchanged pages, and this
    # plus the WARC revisit sink makes recrawl cost track CHANGE rate.
    revalidate: bool = False
    ignore_params: tuple = ()
    url_prefix: str | None = None
    # crawl scoping beyond url_prefix: regex allow/deny lists over the
    # canonical URL (operators/frontier.py apply_url_scope — zero-shuffle
    # Catalyst rlike folds applied both to the round's candidates and to
    # discovered links, so out-of-scope URLs never persist in the frontier)
    url_allow: tuple = ()
    url_deny: tuple = ()
    # lifetime per-host fetch budget (None = unlimited): a host stops
    # drawing fetch slots once `host_budget` pages were ever fetched from
    # it — domain fairness at corpus scale. Spend is tracked as an
    # O(hosts) per-round append (host_counts table), aggregated + broadcast
    # at round start; exhausted hosts' rows leave the frontier like
    # robots-blocked ones.
    host_budget: int | None = None
    # adaptive throttling (None = off): hosts that answered 429 or 5xx in
    # the PREVIOUS round are paced at `auto_throttle` seconds per request
    # this round — the cross-round generalization of the in-attempt retry
    # backoff (a server saying "slow down" keeps saying it across rounds).
    # Composes with robots Crawl-delay through the same host_delays
    # mechanism (per-host max of all asks); derived from an O(delta)
    # pruned scan of last round's fetched delta, never the full history.
    auto_throttle: float | None = None
    # latency-adaptive politeness (None = off): every host fetched in the
    # PREVIOUS round is paced this round at `adaptive_politeness` x its
    # observed mean request latency (Heritrix's delay-factor rule), with
    # scheduler.adaptive_host_delay's clamps and its 4x AIMD backoff when
    # the host's 429/5xx fraction trips. Complements auto_throttle (error
    # pacing, fixed delay) with a load-proportional schedule; both compose
    # with robots Crawl-delay via the per-host max of all asks. Forces the
    # grouped (paced) fetch path whenever a previous round exists.
    adaptive_politeness: float | None = None
    params: dict = field(default_factory=dict)
    headers: dict = field(default_factory=dict)  # default headers per request
    insecure: bool = False  # skip SSL verification (README.md:150)
    # utf8=False opts OUT of charset transcoding (reference base.rb:50):
    # bodies keep their wire bytes 1:1 (ISO-8859-1 view — total and
    # byte-reversible), no sniff, no U+FFFD -> '?' substitution. For
    # binary scrapes or recipes that do their own decoding.
    utf8: bool = True
    proxies: tuple = ()
    limit: int | None = None  # emitted-row limit (recipes)
    # distributed knobs
    per_host_cap: int | None = 10_000  # None = uncapped (skips the host window)
    round_budget: int | None = None
    max_rounds: int = 20
    max_depth: int | None = None
    follow_links: bool = False
    # crawl-trap guard over discovered links (operators/traps.py):
    # None = off; N = prune templates minting > N URLs in one round,
    # plus depth/cycle signals below
    trap_max_urls: int | None = None
    trap_max_depth: int = 8
    trap_max_repeats: int = 3
    # periodic seen-table compaction (None = never): every N rounds,
    # rewrite seen into compact_target_files consolidated files
    compact_seen_every: int | None = None
    compact_target_files: int = 8
    bloom_capacity: int = 1_000_000
    bloom_shards: int = 8
    # exactly-once filter strategy: True = shard-local exact key probe
    # (zero shuffle — the scale path), False = exact anti-join (AQE
    # broadcasts a small seen side for free), None = auto by seen size
    exact_shards: bool | None = None


# below this, the seen key column broadcasts and the anti-join is cheaper
# than a shard sync+probe's fixed job cost; above it, the join's seen-side
# shuffle grows with the table while the shard probe stays delta+shard cost
EXACT_SHARDS_AUTO_ROWS = 5_000_000


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        fetcher: Fetcher,
        options: CrawlOptions | None = None,
        robots: DataFrame | None = None,
        crawl_delays: DataFrame | None = None,
    ):
        self.spark = spark
        self.workdir = workdir
        self.fetcher = fetcher
        self.opts = options or CrawlOptions()
        self.robots = robots
        # robots Crawl-delay table (host, crawl_delay) — see
        # functions/robots.py robots_crawl_delays; overrides rate_limit
        # upward per host inside the fetch stage
        self.crawl_delays = crawl_delays
        self.canonicalize = make_canonicalize_udf(
            url_prefix=self.opts.url_prefix,
            default_params=self.opts.params,
            ignore_params=self.opts.ignore_params,
        )
        # one Crawler = one run: force/force_errors re-admission (step 8)
        # distinguishes "attempted THIS run" from "seen in a previous run"
        # by fetched_at >= this stamp — the same cross-machine clock
        # doctrine the TTL (expires) comparison already relies on
        self._run_started_at = time.time()
        self.frontier_t = SnapshotTable(spark, os.path.join(workdir, "frontier"), FRONTIER_SCHEMA)
        self.seen_t = SnapshotTable(spark, os.path.join(workdir, "seen"), SEEN_SCHEMA)
        self.fetched_t = SnapshotTable(spark, os.path.join(workdir, "fetched"), _FETCHED_WITH_ROUND)
        self.documents_t = _DocumentsView(self.fetched_t)
        self.metrics_t = SnapshotTable(spark, os.path.join(workdir, "metrics"), METRICS_SCHEMA)
        self.host_state_t = SnapshotTable(spark, os.path.join(workdir, "host_state"), HOST_STATE_SCHEMA)
        # lifetime per-host spend ledger (host_budget): one O(hosts) row
        # group appended per round; written/read only when the budget knob
        # is on
        self.host_counts_t = SnapshotTable(
            spark, os.path.join(workdir, "host_counts"), HOST_COUNTS_SCHEMA
        )
        # executor-side sharded bloom sidecar (operators/bloom.py),
        # snapshot-synced against seen like the key store; a lost/legacy
        # sidecar is rebuilt by its first sync() — a distributed pass (one
        # task per shard), the driver never holds keys.
        self._bloom = BloomShardStore(
            os.path.join(workdir, "seen.bloom.d"),
            capacity=self.opts.bloom_capacity,
            n_shards=self.opts.bloom_shards,
        )
        # exact seen-key shards: the anti-join's zero-shuffle replacement
        # for the plain exactly-once path (semantic modes — force / TTL /
        # force_errors — need seen columns and keep the join)
        self._seen_keys = SeenKeyShardStore(
            os.path.join(workdir, "seen.keys.d"), n_shards=self.opts.bloom_shards
        )
        # valued shards for the semantic modes (TTL expiry / force_errors):
        # per-key class-max fetched_at lets the recrawl loop reject
        # shard-locally with anti_join_seen's exact semantics. Distinct
        # sidecar dir — the two stores version against seen independently.
        self._seen_vals = SeenValueShardStore(
            os.path.join(workdir, "seen.vals.d"), n_shards=self.opts.bloom_shards
        )
        self._round: int | None = None  # lazily read from metrics, then cached

    # --- seeding ----------------------------------------------------------------

    def seed(self, urls: list[str | tuple], priority: float = 0.0) -> None:
        """Seed the frontier. Program order -> consecutive seq (the
        reference's recipe order, main.rb:24). urls items: str or
        (url, method, body)."""
        rows = []
        for i, u in enumerate(urls):
            if isinstance(u, tuple):
                url, method, body = u
            else:
                url, method, body = u, "GET", ""
            rows.append((url, method.upper(), body, priority, 0, i, 0))
        df = self.spark.createDataFrame(
            rows, "url string, method string, body string, priority double, depth int, seq long, attempt int"
        )
        prepared = prepare_frontier(df, self.canonicalize)
        self.frontier_t.overwrite(prepared, {"op": "seed", "n": len(rows)})

    @staticmethod
    def post_json(url: str, obj) -> tuple[str, str, str]:
        """S3 convenience mirroring sinew's ``post_json`` (lib/sinew/
        base.rb:77-81): JSON-encode the body compactly (Ruby ``to_json``
        style — no spaces, insertion key order) and mark the request POST.
        The encoded body is part of the identity key, so equal objects are
        one fetch. Returns a ``seed()``-ready (url, method, body) tuple."""
        import json

        return (url, "POST", json.dumps(obj, separators=(",", ":")))

    def seed_df(self, urls_df: DataFrame) -> None:
        """DataFrame-native seeding — the scale path for recipe chaining:
        the next step's URLs stay a distributed plan end-to-end (no driver
        round-trip of fetched rows). Requires columns (url, seq); method,
        body, priority, depth, attempt are defaulted when absent. seq is
        the caller's program order (replay-deterministic)."""
        df = urls_df
        defaults = {
            "method": F.lit("GET"),
            "body": F.lit(""),
            "priority": F.lit(0.0),
            "depth": F.lit(0),
            "attempt": F.lit(0),
        }
        for c, d in defaults.items():
            if c not in df.columns:
                df = df.withColumn(c, d)
        df = df.select(
            F.col("url").cast("string"),
            F.col("method").cast("string"),
            F.col("body").cast("string"),
            F.col("priority").cast("double"),
            F.col("depth").cast("int"),
            F.col("seq").cast("long"),
            F.col("attempt").cast("int"),
        )
        prepared = prepare_frontier(df, self.canonicalize)
        self.frontier_t.overwrite(prepared, {"op": "seed_df"})

    # --- the round ---------------------------------------------------------------

    def _throttle_delays(self, rnd: int):
        """host_delays for this round: robots Crawl-delay asks unioned with
        adaptive throttling (opts.auto_throttle) — hosts that answered 429
        or 5xx (or transport errors) in the previous round get paced at
        auto_throttle sec/request this round, per-host max of all asks.
        Latency-adaptive pacing (opts.adaptive_politeness) adds a third
        ask: every host fetched last round paced at delay-factor x its
        observed mean latency (scheduler.adaptive_host_delay — clamps +
        AIMD error backoff). O(delta) pruned scans of last round's
        fetched rows; returns None when nothing needs pacing so the
        unpaced shuffle-free fetch path stays available."""
        prev_exists = self.fetched_t.current_snapshot() is not None
        asks = []
        if self.crawl_delays is not None:
            asks.append(self.crawl_delays.select("host", "crawl_delay"))
        if self.opts.auto_throttle is not None and prev_exists:
            bad = (
                (F.col("status") == 429)
                | (F.col("status") >= 500)
                | (F.col("status") < 0)
            )
            throttled = (
                self.fetched_t.read()
                .where(F.col("round") == rnd - 1)
                .where(bad)
                .select("host")
                .distinct()
                .withColumn("crawl_delay", F.lit(float(self.opts.auto_throttle)))
            )
            if asks or self.opts.adaptive_politeness is not None:
                asks.append(throttled)
            else:
                # empty throttle set -> keep the unpaced fast path (one
                # small pruned agg job; only paid when auto_throttle is on)
                return throttled if throttled.limit(1).count() > 0 else None
        if self.opts.adaptive_politeness is not None and prev_exists:
            from sinew_spark.operators.scheduler import adaptive_host_delay

            prev = (
                self.fetched_t.read()
                .where(F.col("round") == rnd - 1)
                .select("host", F.coalesce("latency_ms", F.lit(0)).alias("latency_ms"), "status")
            )
            adaptive = adaptive_host_delay(
                prev,
                delay_factor_x1000=int(self.opts.adaptive_politeness * 1000),
            ).select("host", (F.col("delay_ms") / 1000.0).alias("crawl_delay"))
            asks.append(adaptive)
        if not asks:
            return None
        if len(asks) == 1:
            return asks[0]
        merged = asks[0]
        for a in asks[1:]:
            merged = merged.unionByName(a)
        return merged.groupBy("host").agg(
            F.max("crawl_delay").alias("crawl_delay")
        )

    def current_round(self) -> int:
        if self._round is None:
            m = self.metrics_t.read()
            row = m.agg(F.max("round").alias("r")).collect()[0]
            self._round = (row.r if row.r is not None else -1) + 1
        return self._round

    def run_round(self, budget: int | None = None) -> dict:
        """One frontier superstep. ``budget`` overrides opts.round_budget
        for this round (recipe limit flow control: fetch at most the rows
        still needed instead of the whole step)."""
        t0 = time.time()
        round_budget = budget if budget is not None else self.opts.round_budget
        profile = os.environ.get("SINEW_PROFILE") == "1"
        marks: list[tuple[str, float]] = []

        def mark(label: str) -> None:
            if profile:
                marks.append((label, time.time()))

        rnd = self.current_round()
        frontier = self.frontier_t.read()
        mark("start")
        par = self.spark.sparkContext.defaultParallelism

        # 1. deterministic within-round dedup (first seq wins). The
        # explicit repartition(key) serves double duty: the groupBy reuses
        # its hash partitioning (one shuffle, not two), AQE can't coalesce
        # it (user-specified), and the uniform key-hash distribution is
        # exactly what the unpaced fetch stage wants — so the fused UDF can
        # run directly on the dedup output with no further exchange.
        cand = dedup_within_round(frontier.repartition(par * 2, F.col("key")))
        if self.opts.max_depth is not None:
            cand = cand.where(F.col("depth") <= self.opts.max_depth)
        if self.opts.url_allow or self.opts.url_deny:
            cand = apply_url_scope(cand, self.opts.url_allow, self.opts.url_deny)

        # 2. exactly-once filter. Normal path at scale: EXACT shard-local
        # key probe (SeenKeyShardStore) with the bloom fused in as a
        # short-circuit — rows the bloom cannot contain skip the binary
        # search, maybe-seen rows fall through to it (a bloom false
        # positive costs one search, never a dropped URL). Catalyst pushes
        # the key-only probe filter below the dedup shuffle, so seen rows
        # never shuffle and the seen table's keys are never reshuffled per
        # round. Both sidecars are snapshot-synced before the probe; if
        # either can't sync the probe degrades safely (exact-only, or the
        # anti-join fallback). Semantic modes (TTL expiry / force_errors)
        # need the per-key status/fetched_at statistics: at scale they
        # probe the VALUED shards (SeenValueShardStore — same zero-shuffle
        # discipline, the recrawl loop's hot path since `expires`
        # re-examines the whole corpus every round), falling back to the
        # exact anti-join while the seen side is still broadcast-small.
        # `force` ignores seen entirely — no filter, no sync. The bloom is
        # never consulted in semantic modes: maybe-seen rows must be
        # re-examined with their stats, not short-circuited.
        semantic = self.opts.force or self.opts.force_errors or self.opts.expires is not None
        use_shards = (
            self.opts.exact_shards
            if self.opts.exact_shards is not None
            else self.seen_t.approx_rows() > EXACT_SHARDS_AUTO_ROWS
        )
        if not semantic:
            if use_shards:
                self._seen_keys.sync(self.seen_t)
                self._bloom.sync(self.seen_t)
            if use_shards and self._seen_keys.in_sync_with(self.seen_t):
                bloom = self._bloom if self._bloom.in_sync_with(self.seen_t) else None
                cand = self._seen_keys.reject_seen(cand, bloom=bloom)
            else:  # small seen (broadcast join is free) or sync impossible
                cand = anti_join_seen(cand, self.seen_t.read())
        elif not self.opts.force:
            if use_shards:
                self._seen_vals.sync(self.seen_t)
            if use_shards and self._seen_vals.in_sync_with(self.seen_t):
                cand = self._seen_vals.reject_seen(
                    cand,
                    expires=self.opts.expires,
                    force_errors=self.opts.force_errors,
                )
            else:
                cand = anti_join_seen(
                    cand,
                    self.seen_t.read(),
                    expires=self.opts.expires,
                    force_errors=self.opts.force_errors,
                )

        # 3. robots gating (north-rule addition; reference lacks it)
        if self.robots is not None:
            cand = apply_robots(cand, self.robots)

        # 4. politeness cap + global budget
        # cap=None skips the host window+sort entirely — an unpaced bulk
        # crawl has no per-round politeness budget, and key-hash
        # partitioning from the dedup already bounds fetch skew.
        # host_budget adds a lifetime per-host limit: spend-so-far is an
        # O(hosts) aggregate of the per-round ledger, broadcast into the
        # same window the per-round cap uses (one window either way).
        host_remaining = None
        if (
            self.opts.host_budget is not None
            and self.host_counts_t.current_snapshot() is not None
        ):
            host_remaining = (
                self.host_counts_t.read()
                .groupBy("host")
                .agg(
                    (F.lit(self.opts.host_budget) - F.sum("n")).alias("remaining")
                )
            )
        if self.opts.per_host_cap is not None or self.opts.host_budget is not None:
            selected = per_host_cap(
                cand,
                self.opts.per_host_cap,
                host_remaining=host_remaining,
                default_remaining=self.opts.host_budget,
            )
        else:
            selected = cand
        selected = take_round_budget(selected, round_budget)
        # `is not None`, not truthiness: an explicit budget=0 round must
        # still report its real candidate count
        n_candidates = cand.count() if round_budget is not None else None

        # Pin fetch parallelism. AQE sizes shuffle partitions by BYTES
        # (64 MB advisory), but frontier rows are slim while per-row fetch
        # cost is high — AQE would coalesce a 10 MB frontier to one task and
        # serialize the fetch. The uncapped unpaced path inherits the
        # AQE-exempt key-hash partitioning from the dedup repartition (no
        # second shuffle); paths that re-cluster rows (host window, budget
        # sort) get an explicit round-robin repartition instead.
        if self.opts.rate_limit <= 0 and (
            self.opts.per_host_cap is not None or round_budget is not None
        ):
            selected = selected.repartition(par * 2)

        # C11: seed each host's cookie jar from the persisted host_state.
        # RFC 6265 domain cookies cross sibling subdomains, so the seeding
        # key is the registrable SITE (cookies.site_key): per-host latest
        # rows of one site merge into a single scoped jar (applyInPandas
        # over the SMALL state table only — O(hosts with cookies) rows,
        # never the frontier), which broadcast-joins onto the frontier by
        # site. The frontier side stays pure codegen (site_key_expr);
        # per-request host/path/expiry scoping happens inside the fetch
        # UDF (cookies_for), so a sibling's host-only cookies ride along
        # but are never sent and never re-persisted (own_records).
        if self.host_state_t.current_snapshot() is not None:
            from sinew_spark.functions.cookies import site_key_expr

            # single groupBy(site) stage: the per-record (modification
            # stamp) merge already supersedes a host's older rows, so no
            # separate per-host max_by pass is needed
            run_stamp = self._run_started_at

            def _merge_site(pdf):
                import pandas as _pd

                from sinew_spark.functions.cookies import merge_host_jars

                js = merge_host_jars(
                    list(zip(pdf["round"], pdf["host"], pdf["cookies"])),
                    now=run_stamp,
                )
                return _pd.DataFrame(
                    {"site": [pdf["site"].iloc[0]], "host_cookies": [js]}
                )

            merged = (
                self.host_state_t.read()
                .withColumn("site", site_key_expr(F.col("host")))
                .select("site", "round", "host", "cookies")
                .groupBy("site")
                .applyInPandas(_merge_site, "site string, host_cookies string")
            )
            selected = (
                selected.withColumn("site", site_key_expr(F.col("host")))
                .join(F.broadcast(merged), "site", "left_outer")
                .drop("site")
            )

        # 4.6: conditional-revalidation validators. Only recrawl modes can
        # re-offer a seen key, so the join exists only there. The validator
        # side is a 3-column pruned scan of fetched history (etag-bearing
        # rows only) reduced to latest-per-key — O(corpus) once per round,
        # which a recrawl round already is; the payoff is that every
        # unchanged page then costs a ~200-byte 304 instead of body
        # transfer + re-parse. Keyed on the request-identity hash, same
        # hash the frontier is already partitioned by.
        validators = None
        if (
            self.opts.revalidate
            and semantic
            and self.fetched_t.current_snapshot() is not None
        ):
            validators = latest_validators(self.fetched_t.read())

        # 5. fetch + parse, FUSED into one UDF pass (one Arrow crossing; the
        # body never re-enters Python just to be parsed). The whole
        # dedup->cap->fetch->parse pipeline materializes exactly ONCE — at
        # the fetched_t commit below; downstream stages then read the
        # committed parquet back (columnar, pruned — the seen/links/span
        # projections each touch only their columns). Emptiness is detected
        # from the committed keys (an empty round's jobs are near-free).
        fetched_out = fetch_rows(
            selected,
            self.fetcher,
            rate_limit=self.opts.rate_limit,
            retries=self.opts.retries,
            proxies=list(self.opts.proxies),
            parse=True,
            host_delays=self._throttle_delays(rnd),
            validators=validators,
        )

        # 6. commit fetched + seen (including one entry per redirect hop,
        #    base.rb:209-211)
        snap = self.fetched_t.append(
            fetched_out.withColumn("round", F.lit(rnd)), {"round": rnd}
        )
        # read this round's rows back from the just-committed snapshot delta:
        # downstream projections are columnar scans with pruning, no JVM
        # cache. Splits sized to cores — the compressed delta is small per
        # byte but parse-heavy per row, so default 128 MB splits would
        # serialize the parse stage (measured: 4x wall on local[8]).
        fetched = self.fetched_t.read_delta(snap, target_partitions=par * 2)
        mark("fetch+commit")
        # one pruned columnar AGGREGATE of this round's stats: selected /
        # error tallies AND redirect presence — which decides whether the
        # seen commit needs the union+groupBy dedup at all. A single row
        # reaches the driver (never the keys; at the 10^10 design point a
        # per-round key pull would be ~10^8 rows). Redirect presence is a
        # per-row guard (any row with hops or a moved final_url), robust to
        # legacy sizeOfNull semantics.
        err_cond = (F.col("status") >= 500) | (F.col("status") < 0)
        st = fetched.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(err_cond, 1).otherwise(0)).alias("errors"),
            F.sum(F.when(F.col("status") == 304, 1).otherwise(0)).alias("nm"),
            F.sum(
                F.when(F.coalesce(F.size("hops"), F.lit(0)) > 0, 1).otherwise(0)
            ).alias("hop_rows"),
            F.max(
                F.coalesce(F.col("final_url") != F.col("canonical_url"), F.lit(False)).cast("int")
            ).alias("any_moved"),
            F.max(F.col("cookies").isNotNull().cast("int")).alias("any_cookies"),
        ).collect()[0]
        has_redirects = bool((st.hop_rows or 0) > 0 or (st.any_moved or 0) > 0)
        if int(st.n or 0) == 0:
            # drained frontier: skip the empty seen append — it's history
            # noise (one vacuous snapshot per drained run at scale) and it
            # would leave the just-synced probe sidecars one empty
            # snapshot behind, forcing interactive status()/cached() off
            # the driver-local fast path
            return {"round": rnd, "selected": 0, "done": True}
        seen_new = fetched.select(
            "key",
            F.col("canonical_url").alias("url"),
            "method",
            "status",
            "fetched_at",
            F.lit(None).cast("string").alias("hop_of"),
            F.lit(rnd).alias("round"),
        )
        hops = (
            fetched.select(
                F.col("canonical_url").alias("hop_of"),
                F.explode("hops").alias("hop_url"),
                "fetched_at",
            )
            .withColumn("url", self.canonicalize(F.col("hop_url")))
            .withColumn("method", F.lit("GET"))
            .withColumn("status", F.lit(302))
            .withColumn(
                "key", request_key_expr(F.col("method"), F.col("url"), F.lit(""))
            )
            .select("key", "url", "method", "status", "fetched_at", "hop_of", F.lit(rnd).alias("round"))
        )
        # also mark the final_url identity as seen when redirects moved us
        finals = (
            fetched.where(F.col("final_url") != F.col("canonical_url"))
            .withColumn("url", self.canonicalize(F.col("final_url")))
            .withColumn("method", F.lit("GET"))
            .withColumn("key", request_key_expr(F.col("method"), F.col("url"), F.lit("")))
            .select(
                "key", "url", "method", "status", "fetched_at",
                F.col("canonical_url").alias("hop_of"), F.lit(rnd).alias("round"),
            )
        )
        if has_redirects:
            # deterministic key-dedup: a directly-fetched row beats a hop
            # row for the same key (replay determinism — dropDuplicates
            # picks arbitrarily). (kind, url) alone can tie — two pages
            # redirecting to the SAME final URL produce two finals rows
            # with identical key and url — so the ordering continues
            # through (status, fetched_at, hop_of) to stay total: lowest
            # status, then earliest stamp, then lexicographic hop parent.
            union = seen_new.unionByName(hops).unionByName(finals)
            all_seen_new = (
                union.groupBy("key")
                .agg(
                    F.min_by(
                        F.struct(*[f.name for f in SEEN_SCHEMA.fields]),
                        F.struct(
                            F.col("hop_of").isNotNull().cast("int"),
                            F.col("url"),
                            F.col("status"),
                            F.col("fetched_at"),
                            F.coalesce(F.col("hop_of"), F.lit("")),
                        ),
                    ).alias("r")
                )
                .select("r.*")
            )
        else:
            # no hops, no moved finals this round (the common case): keys
            # are already unique within the round, so the union+groupBy
            # dedup shuffle is pure overhead — commit the projection
            # directly (shuffle-free pruned scan + write)
            all_seen_new = seen_new
        seen_snap = self.seen_t.append(all_seen_new, {"round": rnd})
        mark("seen_commit")
        if has_redirects:
            # hop rows exist only in the committed delta — re-aggregate from
            # it (pruned columnar scan, one row to the driver)
            sd = self.seen_t.read_delta(seen_snap)
            direct = F.col("hop_of").isNull()
            sr = sd.agg(
                F.sum(F.when(direct, 1).otherwise(0)).alias("n"),
                F.sum(F.when(direct & err_cond, 1).otherwise(0)).alias("errors"),
                F.sum(
                    F.when(direct & (F.col("status") == 304), 1).otherwise(0)
                ).alias("nm"),
            ).collect()[0]
            n_selected = int(sr.n or 0)
            n_errors = int(sr.errors or 0)
            n_not_modified = int(sr.nm or 0)
        else:
            n_selected = int(st.n)
            n_errors = int(st.errors or 0)
            n_not_modified = int(st.nm or 0)
        n_fetched = n_selected
        if n_selected == 0:
            return {"round": rnd, "selected": 0, "done": True}
        # bloom update: snapshot-gated catch-up to the just-committed seen
        # state — in steady state one distributed shard-local OR of the
        # delta's keys (one task per shard; the driver writes only
        # meta.json), after a crash or a legacy sidecar the same call
        # re-absorbs whatever is missing. Gated on the one configuration
        # whose probe consults the bloom (the fused shard probe): the
        # anti-join path below the auto threshold and the semantic modes
        # never read it, so paying a per-round add_delta job (and a full
        # first-round rebuild) there is pure overhead.
        if use_shards and not semantic:
            self._bloom.sync(self.seen_t)
        mark("keys+bloom")

        # host_budget spend ledger: one O(hosts) append per round (pruned
        # 1-column scan of the round's delta; 304 revalidations count —
        # they are requests against the host's politeness budget)
        if self.opts.host_budget is not None:
            self.host_counts_t.append(
                fetched.groupBy("host")
                .agg(F.count(F.lit(1)).alias("n"))
                .withColumn("round", F.lit(rnd))
                .repartition(1),
                {"round": rnd},
            )

        # C11: persist each host's final cookie jar for the next round as a
        # distributed DataFrame append (never an O(hosts) driver collect —
        # at 10^7 cookie-bearing hosts that pull is exactly the O(rows)
        # driver hop the rest of the loop eliminated). Cookie presence
        # rides the existing 1-row stats aggregate, so cookie-oblivious
        # fetchers (null jar column) skip the agg+append job entirely.
        cookie_thread = None
        cookie_err: list[BaseException] = []
        if bool(st.any_cookies or 0):
            # per-RECORD merge of the host's row jars (not whole-jar
            # max_by): rows of one host can land on different partitions
            # within a round, each seeing only its own sets/deletes — the
            # record-level (modification-stamp) merge keeps all of them,
            # and tombstones let a delete beat an untouched stale copy.
            run_stamp = self._run_started_at

            def _merge_host(pdf):
                import pandas as _pd

                from sinew_spark.functions.cookies import merge_host_jars

                js = merge_host_jars(
                    list(zip(pdf["seq"], pdf["host"], pdf["cookies"])),
                    # run-start stamp: replay-stable within the run; GC of
                    # records expired >30d ago bounds long-crawl jar growth
                    now=run_stamp,
                )
                return _pd.DataFrame({"host": [pdf["host"].iloc[0]], "cookies": [js]})

            jar_updates = (
                fetched.where(F.col("cookies").isNotNull())
                .select("host", "seq", "cookies")
                .groupBy("host")
                .applyInPandas(_merge_host, "host string, cookies string")
                .withColumn("round", F.lit(rnd))
                # O(hosts-that-set-cookies) rows — one output file. A
                # repartition (shuffle barrier), NOT coalesce: coalesce(1)
                # would pull the whole merge UDF into a single task
                .repartition(1)
            )
            # overlap the small append job with the round's tail stages
            # (links/frontier) — independent tables, immutable plans;
            # joined BEFORE the metrics commit so the round-done marker
            # still implies durable cookie state (resume invariant)
            import threading

            def _append_jars():
                try:
                    self.host_state_t.append(jar_updates, {"round": rnd})
                except BaseException as exc:  # re-raised at join
                    cookie_err.append(exc)

            cookie_thread = threading.Thread(target=_append_jars, daemon=True)
            cookie_thread.start()
        mark("host_state")
        try:
            # 7. documents = pure VIEW over the fused commit. Spans were already
            # written once (step 6); re-encoding them into a second parquet
            # table costed ~20s/round at 32 cores for zero information. The view
            # projects lazily; parquet column pruning means document readers
            # never touch bodies.
            mark("docs_view")

            # 8. next frontier: leftover (capped-out) + discovered links.
            # Everything that can never be fetched must leave the frontier or the
            # loop never drains: seen keys (any round), robots-blocked, over-depth.
            leftover = frontier
            n_new_links = 0
            if self.opts.follow_links:
                parsed = self.documents_t.read_delta(snap)
                links = parsed.select(
                    F.col("seq").alias("parent_seq"),
                    F.col("depth").alias("parent_depth"),
                    F.posexplode("links").alias("link_idx", "url"),
                )
                # deterministic seq: parent slot + in-document order. The
                # per-page outlink cap (standard crawler practice — Heritrix
                # and Nutch both cap outlinks) keeps every link's seq inside
                # its parent's LINK_STRIDE slot: without it link 1000 of
                # parent p would collide with link 1 of parent p+1, and seq
                # collisions break the replay-determinism the within-round
                # dedup and budget selection are built on. Dropped links are
                # deterministically the TRAILING ones in document order.
                links = links.where(F.col("link_idx") < LINK_STRIDE - 1)
                links = links.select(
                    F.col("url"),
                    F.lit("GET").alias("method"),
                    F.lit("").alias("body"),
                    (F.col("parent_depth") + 1).cast("double").alias("priority"),
                    (F.col("parent_depth") + 1).alias("depth"),
                    (F.col("parent_seq") * LINK_STRIDE + F.col("link_idx") + 1).alias("seq"),
                    F.lit(0).alias("attempt"),
                )
                new_frontier_rows = prepare_frontier(links, self.canonicalize)
                if self.opts.trap_max_urls is not None:
                    # crawl-trap guard (operators/traps.py): template-explosion /
                    # depth / cycle detection over THIS round's discovered links,
                    # flagged templates pruned by broadcast anti-join before they
                    # ever enter the frontier. Per-round detection is the
                    # practical guard — explosions show up within one round's
                    # fan-out (a calendar mints hundreds of same-template links
                    # per page batch); anything slower leaks at most one round.
                    from sinew_spark.operators.traps import (
                        detect_crawl_traps,
                        prune_traps,
                    )

                    traps = detect_crawl_traps(
                        new_frontier_rows,
                        url_col="canonical_url",
                        max_urls_per_template=self.opts.trap_max_urls,
                        max_depth=self.opts.trap_max_depth,
                        max_repeated_segments=self.opts.trap_max_repeats,
                    )
                    new_frontier_rows = prune_traps(
                        new_frontier_rows, traps, url_col="canonical_url"
                    )
                n_new_links = new_frontier_rows.count()
                next_frontier = leftover.unionByName(new_frontier_rows)
            else:
                next_frontier = leftover
            # drop rows that can never be fetched again THIS RUN. Plain key
            # semantics (blocked iff ever seen) for the normal and pure-TTL
            # paths: a key fetched this run is out of the frontier, and in TTL
            # mode a still-fresh key cannot be fetched before the loop drains —
            # recrawl re-enters it by re-seeding (module doctrine). The shard
            # path absorbs the fresh delta into its shards (the sync the next
            # round would do anyway) and probes shard-local — the per-round
            # O(seen) shuffle this join used to cost is gone. Semantic runs
            # keep only the valued store in sync (it answers every probe
            # flavor below).
            #
            # force/force_errors are DIFFERENT: a key seen only in a PREVIOUS
            # run is exactly what these modes exist to refetch (C6,
            # frontier.py anti_join_seen force semantics) — plain rejection
            # here would evict a rediscovered link before any round-start
            # filter ever saw it. Instead drop only
            #   - keys ATTEMPTED THIS RUN (any status): fetched_at >=
            #     _run_started_at, expressed as the probe's TTL cutoff — this
            #     is what guarantees drain (at most one fetch per key per
            #     run, even for a host that 500s forever);
            #   - for force_errors additionally every ever-OK key, which that
            #     mode never refetches.
            store = self._seen_vals if semantic else self._seen_keys
            if use_shards:
                store.sync(self.seen_t)
            refetch_mode = self.opts.force or self.opts.force_errors
            # expires=0 with now pinned at run start makes the probe's TTL
            # cutoff EXACTLY _run_started_at (blocked iff fetched_at >= run
            # start = attempted this run) — no clock re-read, no race with
            # stamps taken earlier this round
            if use_shards and store.in_sync_with(self.seen_t):
                if refetch_mode:
                    if self.opts.force_errors and not self.opts.force:
                        next_frontier = store.reject_seen(
                            next_frontier, force_errors=True
                        )
                    next_frontier = store.reject_seen(
                        next_frontier, expires=0.0, now=self._run_started_at
                    )
                elif semantic:
                    next_frontier = store.reject_seen(next_frontier)
                else:
                    # keys store: fuse the bloom short-circuit exactly like
                    # the round-start probe — it was synced to the same
                    # post-commit snapshot above, and next_frontier is the
                    # mostly-NEW population (fresh links) the bloom exists
                    # to skip binary searches for
                    bloom = (
                        self._bloom
                        if self._bloom.in_sync_with(self.seen_t)
                        else None
                    )
                    next_frontier = store.reject_seen(next_frontier, bloom=bloom)
            else:
                seen_after = self.seen_t.read()
                if refetch_mode:
                    if self.opts.force_errors and not self.opts.force:
                        next_frontier = anti_join_seen(
                            next_frontier, seen_after, force_errors=True
                        )
                    next_frontier = anti_join_seen(
                        next_frontier, seen_after, expires=0.0,
                        now=self._run_started_at,
                    )
                else:
                    next_frontier = next_frontier.join(
                        seen_after.select("key"), "key", "left_anti"
                    )
            if self.opts.max_depth is not None:
                next_frontier = next_frontier.where(F.col("depth") <= self.opts.max_depth)
            if self.robots is not None:
                next_frontier = apply_robots(next_frontier, self.robots)
            if self.opts.url_allow or self.opts.url_deny:
                # out-of-scope URLs can never be fetched — they leave the
                # frontier here, same rule as robots/seen/depth
                next_frontier = apply_url_scope(
                    next_frontier, self.opts.url_allow, self.opts.url_deny
                )
            if self.opts.host_budget is not None:
                # budget-exhausted hosts leave the frontier too (this
                # round's spend included) — O(hosts) broadcast anti-join
                exhausted = (
                    self.host_counts_t.read()
                    .groupBy("host")
                    .agg(F.sum("n").alias("spent"))
                    .where(F.col("spent") >= self.opts.host_budget)
                    .select("host")
                )
                next_frontier = next_frontier.join(
                    F.broadcast(exhausted), "host", "left_anti"
                )
            self.frontier_t.overwrite(dedup_within_round(next_frontier), {"round": rnd})
            mark("next_frontier")
        finally:
            # join the host_state append before ANY exit from the tail
            # stages (ADVICE r3): an exception in links/frontier must not
            # leave the append racing a retried run_round -- the manifest
            # read-modify-write in SnapshotTable._new_snapshot is not
            # synchronized across threads, so a second concurrent append
            # could silently drop one host_state snapshot.
            if cookie_thread is not None:
                cookie_thread.join()
        if cookie_err:
            raise cookie_err[0]
        if profile:
            prev = t0
            for label, tm in marks:
                print(f"  [round {rnd}] {label:15s} {tm - prev:7.2f}s", flush=True)
                prev = tm

        dur = time.time() - t0
        stats = {
            "round": rnd,
            "candidates": n_candidates if n_candidates is not None else n_selected,
            "selected": n_selected,
            "fetched": n_fetched,
            "errors": n_errors,
            "not_modified": n_not_modified,
            "new_links": n_new_links,
            "duration_sec": dur,
            "ts": time.time(),
        }
        # driver-side parquet append — a metrics row is not worth a Spark job
        self.metrics_t.append_rows(
            [tuple(stats.values())], {"round": rnd}
        )
        # periodic seen-table maintenance: a long crawl appends one data
        # dir per round; without compaction a 10^5-round crawl pays 10^5
        # directory listings per scan. A 'compact' snapshot is an EMPTY
        # incremental delta (snapshots.py), so downstream consumers skip
        # it; the seen shard stores rebuild on their next sync — that
        # amortized rebuild is the knob's documented cost, hence off by
        # default and tuned to every-N-rounds.
        if (
            self.opts.compact_seen_every is not None
            and (rnd + 1) % self.opts.compact_seen_every == 0
        ):
            self.seen_t.compact(target_files=self.opts.compact_target_files)
        self._round = rnd + 1
        stats["done"] = False
        return stats

    def run(self, max_rounds: int | None = None) -> list[dict]:
        """Run rounds until the frontier drains or max_rounds. Safe to call
        again after a crash — state is whatever the snapshot tables say."""
        out = []
        for _ in range(max_rounds or self.opts.max_rounds):
            stats = self.run_round()
            out.append(stats)
            if stats.get("done"):
                break
        return out

    # --- cache probe API (sinew's status/cached?/uncache, base.rb:95-122) -------

    def _key_for(self, url: str, method: str = "GET", body: str = ""):
        """Canonicalize + hash ONE request identity on the driver — pure
        Python, no Spark job. canonicalize_url_str is the same function the
        frontier's pandas UDF vectorizes (urls.py) and request_key_local is
        the JVM-parity xxhash64 twin (functions/localhash.py), so the key
        is bit-identical to what the crawl loop computed. The reference
        probe is O(1) local too (lib/sinew/base.rb:95-122)."""
        curl = canonicalize_url_str(
            url,
            base=self.opts.url_prefix,
            default_params=self.opts.params,
            ignore_params=frozenset(self.opts.ignore_params),
        )
        return request_key_local(method, curl, body), curl

    def status(self, url: str, method: str = "GET", body: str = "") -> dict:
        """Probe one request identity. ``diskpath`` is the storage-location
        handle analog of ``Response#diskpath`` (lib/sinew/response.rb:52-54)
        — the reference stores one file per request under the httpdisk
        cache dir; the engine stores rows in the fetched snapshot table, so
        the handle is (table dir, identity key) rather than a per-request
        file.

        Fast path: when EITHER exact shard sidecar (key store, or the
        valued store — the one semantic TTL/force_errors runs keep in
        sync) is warm and in sync with the seen table, a MISS is answered
        entirely on the driver (local canonicalize + hash + shard binary
        search — no Spark job, matching the reference's O(1) local
        probe). Only a HIT (needs the row's status/fetched_at) or a cold
        store runs the 1-row Spark lookup."""
        key, curl = self._key_for(url, method, body)
        diskpath = os.path.join(self.workdir, "fetched")
        probe_store = self._local_probe_store()
        if probe_store is not None and probe_store.probe_local(key) is False:
            return {"status": "miss", "key": key, "url": curl, "diskpath": diskpath}
        rows = self.seen_t.read().where(F.col("key") == key).limit(1).collect()
        if not rows:
            return {"status": "miss", "key": key, "url": curl, "diskpath": diskpath}
        r = rows[0]
        return {
            "status": int(r.status),
            "key": key,
            "url": curl,
            "fetched_at": r.fetched_at,
            "diskpath": diskpath,
        }

    def cached(self, url: str, method: str = "GET", body: str = "") -> bool:
        """Boolean probe (sinew's ``cached?``): fully driver-local when the
        key OR valued shards are warm — membership alone answers it, no
        Spark job in either direction."""
        probe_store = self._local_probe_store()
        if probe_store is not None:
            hit = probe_store.probe_local(self._key_for(url, method, body)[0])
            if hit is not None:
                return hit
        return self.status(url, method, body)["status"] != "miss"

    def _local_probe_store(self):
        """Whichever exact shard sidecar is in sync with the seen table —
        the key store (plain crawls) or the valued store (semantic
        TTL/force_errors crawls sync only that one) — for O(1)
        driver-local probes; None when both are cold."""
        for s in (self._seen_keys, self._seen_vals):
            if s.in_sync_with(self.seen_t):
                return s
        return None

    def uncache(self, url: str, method: str = "GET", body: str = "") -> None:
        """Row-level delete (sinew's uncache) — O(delta) end to end at the
        10^10-key design point: a merge-on-read equality-delete snapshot
        (tiny delete file, no table rewrite) that the key/value shard
        stores absorb as tombstone runs on their next sync (no O(seen)
        rebuild). The Bloom may retain the key — fail-safe: under the
        fused probe a stale bloom entry only sends the key to the exact
        search, which honors the tombstone."""
        key, _ = self._key_for(url, method, body)
        self.seen_t.delete_keys([key])

    def host_report(self) -> DataFrame:
        """Per-host ops report over everything fetched so far (module-level
        ``host_report`` on the fetched table)."""
        return host_report(self.fetched_t.read())

    def expire_history(
        self, retain_last: int = 2, keep_ids: dict | None = None
    ) -> dict:
        """Garbage-collect crawl-state snapshots across every table
        (frontier/seen/fetched/metrics/host_state/host_counts) via
        ``SnapshotTable.expire_snapshots``.  A long crawl commits one
        snapshot per table per round; without expiry the checkpoint
        history grows without bound (at the design point: one full
        frontier copy per round).  ``retain_last`` keeps that many
        snapshots along each table's current lineage (default 2: the
        live state plus one resume point); ``keep_ids`` optionally pins
        extra snapshot ids per table name, e.g.
        ``{"seen": [checkpoint_sid]}`` for a known-good resume
        checkpoint.  Sidecar seen stores whose incremental chain crosses
        an expired snapshot rebuild on their next ``sync()`` — safe,
        documented in ``expire_snapshots``.  Returns a per-table summary
        dict."""
        tables = {
            "frontier": self.frontier_t,
            "seen": self.seen_t,
            "fetched": self.fetched_t,
            "metrics": self.metrics_t,
            "host_state": self.host_state_t,
            "host_counts": self.host_counts_t,
        }
        pins = keep_ids or {}
        return {
            name: t.expire_snapshots(
                retain_last=retain_last, keep_ids=pins.get(name, ())
            )
            for name, t in tables.items()
        }
