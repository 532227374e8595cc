"""Freshness-driven recrawl scheduling: change-rate estimation over
fetch history -> recrawl priority.

The reference crawls each URL once per cache TTL (httpdisk expiry,
lib/sinew/base.rb `get` + options[:expires]); a production crawler at
10^10 URLs can't afford uniform TTLs — it should revisit pages in
proportion to how often they actually change (Cho & Garcia-Molina,
"Effective Page Refresh Policies for Web Crawlers", TODS'03: the
greedy freshness-maximizing schedule revisits by estimated change
frequency x staleness). This module estimates per-URL change rates
from the engine's own fetch history (the seen/snapshot table already
records a content fingerprint per fetch round) and emits a priority
the frontier's ``take_round_budget`` can order by — closing the loop:
crawl -> observe changes -> re-prioritize -> crawl.

Estimator per URL over its observed rounds:

- ``obs``      = number of rounds the URL was fetched
- ``changes``  = count of consecutive-observation fingerprint flips
                 (LAG over rounds, per URL)
- ``change_rate`` = changes / max(obs - 1, 1)   (MLE of the per-round
                 flip probability given Bernoulli sampling)
- ``staleness``   = current_round - last observed round
- ``priority``    = change_rate * staleness     (expected number of
                 unseen changes — the greedy revisit score)

Scale shape: ONE hash shuffle on the URL key — the LAG window
(partitionBy key, orderBy round) and the per-key aggregate share the
same partitioning, so Catalyst reuses the exchange; no join, no
driver state. Output is O(distinct URLs), dominated by the history
scan, which prunes to (key, round, fingerprint) columns only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def recrawl_priority(
    history: DataFrame,
    current_round: int,
    key: str = "key",
    round_col: str = "round",
    fingerprint: str = "fingerprint",
    round_digits: int = 6,
) -> DataFrame:
    """Score every URL in ``history`` for recrawl urgency.

    ``history`` holds one row per (url key, fetch round) with the
    content fingerprint observed that round. Returns one row per key:
    (key, obs, changes, change_rate, staleness, priority), with
    change_rate/priority rounded to ``round_digits`` (each is a single
    division/multiplication of exact integers — deterministic, no
    float-sum ordering hazard).
    """
    if current_round < 0:
        raise ValueError("current_round must be non-negative")
    k, r, fp = F.col(key), F.col(round_col), F.col(fingerprint)
    w = Window.partitionBy(key).orderBy(round_col)
    flips = history.select(
        k.alias("key"),
        r.alias("round"),
        (fp != F.lag(fp).over(w)).cast("int").alias("flip"),
    )
    agg = flips.groupBy("key").agg(
        F.count(F.lit(1)).alias("obs"),
        F.coalesce(F.sum("flip"), F.lit(0)).cast("long").alias("changes"),
        F.max("round").alias("last_round"),
    )
    rate: Column = F.round(
        F.col("changes") / F.greatest(F.col("obs") - 1, F.lit(1)), round_digits
    )
    staleness = (F.lit(current_round) - F.col("last_round")).cast("long")
    return agg.select(
        "key",
        "obs",
        "changes",
        rate.alias("change_rate"),
        staleness.alias("staleness"),
        F.round(rate * staleness, round_digits).alias("priority"),
    )


def opic(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = 10**12,
) -> DataFrame:
    """On-line Page Importance Computation (Abiteboul, Preda & Cobena,
    WWW'03) in EXACT integer arithmetic — the classic *incremental*
    frontier-prioritization algorithm: unlike PageRank it needs no
    global convergence; each processed page simply hands its cash to
    its outlinks and banks the amount in its history, so importance
    estimates improve monotonically WHILE the crawl runs. This is the
    round-synchronous batch form: every round, all pages distribute.

    Integer doctrine (same as pagerank_fixedpoint): cash is BIGINT
    micro-units, total ``scale`` split evenly at init
    (``scale DIV n``). Per round and per page with out-degree d > 0:

        history' = history + cash
        each outlink receives   cash DIV d
        the remainder           cash - d*(cash DIV d)  returns to the
                                page's own next-round cash (mass is
                                conserved exactly, no float drift)

    Dangling pages (d = 0) also bank ``history += cash``; their cash
    joins a virtual pot D redistributed uniformly next round
    (``D DIV n`` each — the paper's virtual-root link), remainder of
    the pot carried by nobody (bounded loss < n per round, a
    deterministic lower bound, like pagerank's DIV loss). Integer sums
    are order-independent: results are bit-identical across any
    partitioning or cluster size and exactly SQL-replayable (the
    ``frontier_opic`` oracle).

    Scale shape per round: one cash->edges hash join + one
    groupBy(dst) SUM with map-side partials — identical to a pagerank
    iteration; ``localCheckpoint`` keeps the plan O(1) deep. The
    importance estimate ``history + cash`` is the frontier ordering
    signal; feed it to ``take_round_budget`` as priority.

    Returns (v, cash: long, history: long, importance: long).
    """
    if iters <= 0:
        raise ValueError("iters must be positive")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        return verts.select(
            "v",
            F.lit(0).cast("long").alias("cash"),
            F.lit(0).cast("long").alias("history"),
            F.lit(0).cast("long").alias("importance"),
        )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    state = verts.join(deg.select(F.col("src").alias("v"), "deg"), "v", "left").select(
        "v",
        F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
        F.lit(int(scale) // n).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("history"),
    ).localCheckpoint(eager=True)
    pot = 0  # dangling cash pot, a driver scalar (1-row agg per round)
    for _ in range(iters):
        share = pot // n
        # cash in play this round includes the uniform dangling share
        cur = state.withColumn("cash", F.col("cash") + F.lit(share))
        senders = cur.where(F.col("deg") > 0).select("v", "cash")
        contrib = senders.join(ed, senders["v"] == ed["src"]).select(
            F.col("dst").alias("v"), F.expr("cash div deg").alias("c")
        )
        incoming = contrib.groupBy("v").agg(F.sum("c").alias("inc"))
        pot = (
            cur.where(F.col("deg") == 0)
            .agg(F.coalesce(F.sum("cash"), F.lit(0)).alias("s"))
            .collect()[0].s
        )
        state = (
            cur.join(incoming, "v", "left")
            .select(
                "v",
                "deg",
                (
                    F.coalesce(F.col("inc"), F.lit(0))
                    + F.when(
                        F.col("deg") > 0,
                        # exact integer remainder (div, never float division)
                        F.expr("cash - deg * (cash div deg)"),
                    ).otherwise(F.lit(0))
                ).cast("long").alias("cash"),
                (F.col("history") + F.col("cash")).cast("long").alias("history"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "v",
        "cash",
        "history",
        (F.col("cash") + F.col("history")).alias("importance"),
    )


def allocate_host_budget(
    host_values: DataFrame,
    total_budget: int,
    host_col: str = "host",
    value_col: str = "value",
    buckets: int = 1024,
) -> DataFrame:
    """Apportion a round's fetch budget across hosts proportionally to
    a non-negative integer value signal (frontier_value, host
    pagerank, OPIC cash) — exact Hamilton / largest-remainder
    apportionment, so ``sum(alloc) == total_budget`` always (when the
    corpus has any value at all) and the result is integer-exact,
    partition-independent, and SQL-replayable.

    Rule: ``base = (value * B) div T`` (T = sum of values); the
    leftover ``B - sum(base)`` crumbs go +1 each to the hosts with the
    largest remainders ``(value * B) % T``, ties broken by host asc.
    A zero-remainder host can never receive a crumb (leftover is
    strictly less than the count of positive remainders), so
    zero-value hosts stay at zero. All-zero values degrade to uniform
    apportionment (every host weighted 1).

    Scale shape: the crumb assignment needs the global rank of each
    host by (remainder desc, host asc). That is computed two-phase,
    like pack_by_token_budget's prefix sum: remainders are range-
    bucketed by a monotone ``rem div w`` key (~``buckets`` cells),
    ranked within buckets in parallel, and bucket counts (one tiny row
    per bucket) take the only single-partition window. No stage holds
    the host table in one partition. Driver-side values: two 1-row
    aggregates (T + n, sum of bases).
    """
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    hv = host_values.select(
        F.col(host_col).alias("host"), F.col(value_col).cast("long").alias("value")
    )
    row = hv.agg(
        F.coalesce(F.sum("value"), F.lit(0)).alias("t"),
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.min("value"), F.lit(0)).alias("mn"),
    ).first()
    t, n, mn = int(row["t"]), int(row["n"]), int(row["mn"])
    if mn < 0:
        raise ValueError("values must be non-negative")
    if n == 0:
        return hv.select("host", "value", F.lit(0).cast("long").alias("alloc"))
    wexpr = "value" if t > 0 else "cast(1 as bigint)"
    if t == 0:
        t = n
    b = total_budget
    scored = hv.select(
        "host",
        "value",
        F.expr(f"({wexpr} * cast({b} as bigint)) div {t}").alias("_base"),
        F.expr(f"({wexpr} * cast({b} as bigint)) % {t}").alias("_rem"),
    )
    leftover = b - int(scored.agg(F.coalesce(F.sum("_base"), F.lit(0))).first()[0])
    if leftover == 0:
        return scored.select("host", "value", F.col("_base").alias("alloc"))
    w = max(t // buckets, 1)
    bucketed = scored.withColumn("_bkt", F.expr(f"_rem div {w}"))
    within = Window.partitionBy("_bkt").orderBy(
        F.col("_rem").desc(), F.col("host").asc()
    )
    ranked = bucketed.withColumn("_wr", F.row_number().over(within))
    counts = bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_c"))
    above = Window.orderBy(F.col("_bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_c").over(above), F.lit(0)).alias("_off")
    )
    out = ranked.join(F.broadcast(offsets), "_bkt").select(
        "host",
        "value",
        (
            F.col("_base")
            + ((F.col("_off") + F.col("_wr")) <= leftover).cast("long")
        ).alias("alloc"),
    )
    return out


def adaptive_host_delay(
    fetchlog: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    status_col: str = "status",
    delay_factor_x1000: int = 2000,
    min_delay_ms: int = 250,
    max_delay_ms: int = 30_000,
    backoff_x1000: int = 4000,
    err_threshold_x1000: int = 100,
    robots_delay_col: str | None = None,
) -> DataFrame:
    """Latency-adaptive per-host politeness (the Heritrix crawl-engine
    rule: next fetch delay = delay-factor x the host's observed fetch
    duration, clamped to [min, max] — a slow server automatically gets
    a gentler schedule; reference parity note: sinew's fixed
    ``rate_limit`` of 1 req/s, /root/reference/lib/sinew/base.rb:21,47,
    is the degenerate constant form of this). Plus AIMD-style backoff:
    a host whose recent error fraction (HTTP 429 or 5xx — the
    overload/throttle signals) meets ``err_threshold_x1000`` has its
    delay multiplied by ``backoff_x1000`` before clamping.

    All arithmetic is integer fixed-point (x1000 factors, truncating
    ``div``) so the schedule replays bit-identically across engines
    and partitionings:

        avg_ms   = sum(latency) div n
        base     = (delay_factor_x1000 * avg_ms) div 1000
        raw      = base * backoff_x1000 div 1000   if err-rate trips
        delay_ms = clamp(raw, min_delay_ms, max_delay_ms), and never
                   below ``robots_delay_col`` (robots.txt Crawl-delay,
                   seconds -> ms, when the caller provides it)

    Input: one row per completed fetch (host, latency_ms, status).
    Output: one row per host — (host, n_fetches, avg_latency_ms,
    err_x1000, delay_ms).

    Scale shape: ONE combinable groupBy(host) — map-side partial sums,
    output is O(distinct hosts). Feed delay_ms to the fetch stage's
    per-host pacing (sources/fetch.py politeness) or divide a round
    budget by it for frontier admission.
    """
    if min_delay_ms > max_delay_ms:
        raise ValueError("min_delay_ms must be <= max_delay_ms")
    if delay_factor_x1000 < 0 or backoff_x1000 < 1000:
        raise ValueError("delay_factor_x1000 >= 0, backoff_x1000 >= 1000")
    is_err = (F.col(status_col) == 429) | (
        (F.col(status_col) >= 500) & (F.col(status_col) < 600)
    )
    aggs = [
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(F.col(latency_col).cast("long")).alias("_lat_sum"),
        F.sum(is_err.cast("long")).alias("_n_err"),
    ]
    if robots_delay_col is not None:
        # ms BEFORE the integer cast: robots Crawl-delay is fractional
        # in the wild (functions/robots.py parses floats) and a whole-
        # second truncation would zero out sub-second asks entirely
        aggs.append(
            (F.max(F.coalesce(F.col(robots_delay_col), F.lit(0))) * 1000)
            .cast("long")
            .alias("_robots_ms")
        )
    g = fetchlog.groupBy(F.col(host_col).alias("host")).agg(*aggs)
    avg = F.expr("_lat_sum div n_fetches")
    err_x = F.expr("(_n_err * 1000) div n_fetches")
    base = F.expr(f"({delay_factor_x1000} * (_lat_sum div n_fetches)) div 1000")
    raw = F.when(
        err_x >= err_threshold_x1000, F.expr(f"base_ms * {backoff_x1000} div 1000")
    ).otherwise(F.col("base_ms"))
    delay = F.least(
        F.greatest(raw.cast("long"), F.lit(min_delay_ms).cast("long")),
        F.lit(max_delay_ms).cast("long"),
    )
    if robots_delay_col is not None:
        # the robots ask is a hard floor OUTSIDE the [min, max] clamp:
        # max_delay_ms bounds the engine's own backoff, never a
        # robots.txt mandate (clamping the floor would violate a
        # Crawl-delay longer than max_delay_ms)
        delay = F.greatest(delay, F.col("_robots_ms"))
    g = g.withColumn("base_ms", base)
    return g.select(
        "host",
        "n_fetches",
        avg.cast("long").alias("avg_latency_ms"),
        err_x.cast("long").alias("err_x1000"),
        delay.alias("delay_ms"),
    )
