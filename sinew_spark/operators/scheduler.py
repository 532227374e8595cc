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
